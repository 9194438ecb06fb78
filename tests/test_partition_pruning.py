"""Partition pruning — static and dynamic — over partitioned parquet.

The driver fixtures are single files, so these tests write their own
hive-partitioned table and assert the two scan-pruning behaviors that
carry a 100 TB layout (SURVEY §4): a literal predicate prunes at plan
time (PartitionFilters), and a selective dimension filter prunes the
fact scan at RUNTIME through dynamic partition pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def part_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("part")
    fact = str(root / "fact")
    dim = str(root / "dim")
    spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("pid"),
        (F.col("id") * 2).alias("v"),
    ).write.partitionBy("pid").parquet(fact)
    spark.createDataFrame(
        [(i, "keep" if i == 3 else "drop") for i in range(10)], "pid long, tag string"
    ).write.parquet(dim)
    return fact, dim


def test_static_partition_pruning(spark, part_tables):
    fact, _ = part_tables
    df = spark.read.parquet(fact).filter(F.col("pid") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pid predicate must land in PartitionFilters (plan-time pruning),
    # not in the data-filter pushdown
    seg = plan.split("PartitionFilters:", 1)[1].splitlines()[0]
    assert "pid" in seg
    assert df.count() == 1000


def test_dynamic_partition_pruning_from_dim_filter(spark, part_tables):
    fact, dim = part_tables
    f = spark.read.parquet(fact)
    d = spark.read.parquet(dim).filter(F.col("tag") == "keep")
    joined = f.join(d, "pid").agg(F.count("*").alias("n"))
    assert joined.collect()[0].n == 1000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # DPP materializes as a dynamicpruning subquery on the fact scan
    assert "dynamicpruning" in plan.lower() or "DynamicPruning" in plan


def test_unpartitioned_filter_does_not_prune_partitions(spark, part_tables):
    fact, _ = part_tables
    df = spark.read.parquet(fact).filter(F.col("v") > 100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # data filter lands in PushedFilters, not PartitionFilters
    seg = plan.split("PartitionFilters:", 1)[1][:30]
    assert seg.strip().startswith("[]")
