"""Upsert / SCD merge primitives — MERGE INTO emulated with anti-join +
union (no Delta/Iceberg jars in this environment; the emulation is the
classic pre-lakehouse pattern and stays correct on any table format).

The reference's closest analog is the idempotent task-ledger update
(ref ``internal/core/task.go:157-179``): insert-if-absent semantics on
a keyed set. These generalize it to keyed last-write-wins upsert and
SCD2 effective-dating.

Scale: both ops are one shuffle on the merge key (the anti-join); with
the target bucketed/partitioned on the key, the join co-locates and the
rewrite touches only affected partitions (partition-overwrite mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Last-write-wins keyed upsert: rows in ``updates`` replace matching
    ``target`` rows; unmatched target rows pass through.

    ``updates`` must be unique per key. Pass ``order_col`` to have the
    collapse applied here (:func:`latest_per_key`, deterministic); with
    no ``order_col`` and ``validate=True`` (default) a duplicate key
    raises ValueError instead of silently duplicating rows (ADVICE r1).
    ``validate`` costs one aggregate action over ``updates`` (the small
    side of a merge); set it False only when uniqueness is guaranteed
    upstream.
    """
    if order_col is not None:
        updates = latest_per_key(updates, keys, order_col)
    elif validate:
        dup = (
            updates.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"upsert: updates not unique per key {keys}; first duplicate: "
                f"{tuple(dup[0][k] for k in keys)} — pass order_col or pre-collapse "
                "with latest_per_key"
            )
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)


def latest_per_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Collapse to the latest row per key. Deterministic even on
    order_col TIES: a content hash of the full row is the final
    tie-breaker, so repeated runs pick the same survivor regardless of
    shuffle order (round-6 review — row_number over order_col alone is
    arbitrary within a tie)."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.xxhash64(*[F.col(c) for c in df.columns])
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows for
    changed keys, append the new versions as current.

    ``dim`` schema: business columns + effective_from/effective_to/is_current.
    ``changes`` schema: business columns + effective_from — at most ONE
    row per key per application (validated: a second change for the
    same key would fan out the close join and append two "current"
    versions — apply multi-step histories as successive calls).
    """
    dup = (
        changes.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"scd2_apply: changes not unique per key {key!r}; first duplicate: "
            f"{dup[0][key]!r} — apply multi-version histories one batch per "
            "version (round-6 review)"
        )
    changed_keys = changes.select(key).distinct()
    # NULL is_current must not vanish from both branches (the
    # split_malformed NULL-predicate class): treat NULL as not-current
    is_cur = F.coalesce(F.col(current_col), F.lit(False))
    closed = (
        dim.join(changed_keys, key, "left_semi")
        .filter(is_cur)
        .drop(end_col, current_col)
        .join(changes.select(key, F.col(effective_col).alias("__new_from")), key)
        .withColumn(end_col, F.col("__new_from"))
        .withColumn(current_col, F.lit(False))
        .drop("__new_from")
    )
    untouched = dim.join(changed_keys, key, "left_anti").unionByName(
        dim.join(changed_keys, key, "left_semi").filter(~is_cur)
    )
    fresh = changes.withColumn(end_col, F.lit(None).cast("timestamp")).withColumn(
        current_col, F.lit(True)
    )
    return untouched.unionByName(closed).unionByName(fresh)
