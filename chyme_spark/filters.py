"""Filter registry — parity with the reference's FilterFunc system.

The reference compiles ``"ext/mov"`` into a regex predicate
``^(.+)\\.mov$`` matched against the lowercased URL (ref
``internal/ingest/util.go:21-61``); unknown filter names error, and
``identity/`` passes everything through.

Here a filter string compiles to a Catalyst ``Column`` predicate, so it
is pushed down into the parquet/listing scan (the reference got the same
effect by filtering inside its S3 list visitor, ref
``internal/ingest/service.go:89-106``) — at 100 TB that is the
difference between scanning one column of a listing and materializing
the whole catalog.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

FilterFactory = Callable[[list[str]], Column]


def _ext_filter(args: list[str]) -> Column:
    """``ext/<e1>[/<e2>...]`` — extension predicate on the url column.

    Multi-extension is a deliberate extension of the reference (which
    took exactly one); the regex shape ``^(.+)\\.<ext>$`` is preserved.
    """
    if not args or not all(re.fullmatch(r"[A-Za-z0-9]+", a) for a in args):
        raise ValueError(f"ext filter needs alphanumeric extension args, got {args!r}")
    alternatives = "|".join(a.lower() for a in args)
    return F.lower(F.col("url")).rlike(rf"^(.+)\.({alternatives})$")


def _identity_filter(args: list[str]) -> Column:
    return F.lit(True)


FILTER_REGISTRY: dict[str, FilterFactory] = {
    "ext": _ext_filter,
    "identity": _identity_filter,
}


def compile_filter(filter_string: str) -> Column:
    """Parse ``"<name>/<arg>/..."`` into a Column predicate.

    Mirrors the reference's parser (``internal/ingest/util.go:52-61``)
    but returns a declarative predicate instead of a per-record closure.
    """
    parts = [p for p in filter_string.split("/") if p]
    if not parts:
        raise ValueError("empty filter string")
    name, args = parts[0], parts[1:]
    try:
        factory = FILTER_REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown filter {name!r}; known: {sorted(FILTER_REGISTRY)}") from None
    return factory(args)
