"""Data-layout optimization: Z-order clustering for multi-column scan
pruning.

Parquet readers prune files and row groups from min/max statistics; a
table sorted by one column prunes only filters on that column. Z-order
interleaves the bits of several columns' quantile-bucket positions so
that rows close in ANY clustered dimension land close on disk — filters
on each clustered column then see tight min/max ranges per file (the
technique behind Delta OPTIMIZE ZORDER / Iceberg sort orders; here
built from plain DataFrame ops so any parquet dir gets it).

Scale shape: per clustered column ONE ``approxQuantile`` pass (driver
receives only the ~256 cutpoints — bounded at any table size; no global
window, no global sort per dimension), bucket assignment is a JVM-side
aggregate over the broadcast cutpoint array, and the only shuffle is
the final ``repartitionByRange`` on the z-value — the same shuffle a
plain sorted rewrite pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 8  # quantile-bucket resolution per dimension (256 buckets)


def _bucket(col: str, cuts: list[float]) -> Column:
    """Bucket index = how many cutpoints lie at or below the value —
    an O(|cuts|) fold over a literal array, fully JVM-side."""
    arr = F.array(*[F.lit(c) for c in cuts])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, cut: acc + F.when(F.col(col).cast("double") >= cut, 1).otherwise(0),
    )


def zorder_frame(df: DataFrame, cols: list[str], target_files: int) -> DataFrame:
    """Range-partition and sort ``df`` by the interleaved z-value of
    ``cols`` (numeric columns); written schema is unchanged."""
    n_cuts = (1 << _BITS) - 1
    probs = [(i + 1) / (n_cuts + 1) for i in range(n_cuts)]
    # list overload = ONE full-table pass for every column's cutpoints
    # (the per-column loop paid len(cols) scans — round-6 review)
    all_cuts = df.stat.approxQuantile(list(cols), probs, 0.001)
    buckets = [
        _bucket(c, cuts).cast("long").alias(f"__b_{i}")
        for i, (c, cuts) in enumerate(zip(cols, all_cuts))
    ]
    n = len(cols)
    z = F.lit(0).cast("long")
    for bit in range(_BITS):
        for i in range(n):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(f"__b_{i}"), bit).bitwiseAND(F.lit(1)),
                    bit * n + i,
                )
            )
    staged = df.select("*", *buckets).select("*", z.alias("__z"))
    return (
        staged.repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__b_{i}" for i in range(n)])
    )
