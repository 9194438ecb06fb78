"""Resource catalog — the engine's replacement for the reference's
Redis resource SET (ref ``internal/core/resource.go:36-108``).

A catalog is just a DataFrame with the resource schema; ``ingest``
reproduces the reference's scan -> filter -> dedup -> store pipeline
(ref ``internal/ingest/service.go:42-119``) as one declarative plan:
the filter is part of the scan (pushdown), dedup is a hash aggregate,
and the bulk store is a parquet append — no Redis, no RESP subprocess
(ref ``internal/core/resource.go:89-103``).

Fixes baked in (SURVEY §2A quirks list):
  * rejected single resources never null-deref (the filter simply
    yields 0 rows);
  * ingest returns rows *inserted*, not total set cardinality
    (ref bug ``internal/ingest/service.go:114-118``);
  * malformed URLs are quarantined, not silently dropped
    (ref ``internal/core/resource.go:66-70``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chyme_spark.filters import compile_filter

# `^(scheme)://(bucket)/(key)` — same shape the reference parses with
# net/url (ref internal/core/resource.go:15-24).
_URL_RE = r"^([a-z][a-z0-9+.-]*)://([^/]+)/(.+)$"


def with_resource_columns(urls: DataFrame, phony: bool = False) -> DataFrame:
    """Annotate a (url STRING, ...) DataFrame with the resource schema.

    resource_hash = sha1(url) — identical identity rule to the reference
    (ref ``internal/core/resource.go:27-34``, ``pkg/hash/hash.go:18-24``).
    """
    return (
        urls.withColumn("scheme", F.regexp_extract("url", _URL_RE, 1))
        .withColumn("bucket", F.regexp_extract("url", _URL_RE, 2))
        .withColumn("key", F.regexp_extract("url", _URL_RE, 3))
        .withColumn("ext", F.lower(F.regexp_extract("url", r"\.([A-Za-z0-9]+)$", 1)))
        .withColumn("phony", F.lit(phony))
        .withColumn("resource_hash", F.sha1(F.col("url")))
    )


def split_malformed(catalog: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(well-formed, quarantine) — scheme regex decides validity."""
    is_valid = F.col("scheme") != ""
    return catalog.filter(is_valid), catalog.filter(~is_valid)


def ingest(urls: DataFrame, filter_string: str = "identity/") -> DataFrame:
    """scan -> predicate -> dedup, as one narrow-then-aggregate plan.

    The only shuffle is the dedup on ``url``; at scale that is a hash
    repartition of (short) URL strings, and AQE coalesces the output.
    """
    catalog = with_resource_columns(urls)
    good, _quarantine = split_malformed(catalog)
    return good.filter(compile_filter(filter_string)).dropDuplicates(["url"])
