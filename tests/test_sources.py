"""Source/sink round-trips and malformed-record quarantine (SURVEY §1.3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chyme_spark.sources import read_json_with_quarantine, read_table, split_corrupt, write_table

ROWS = [(1, "a.mov", 3.5), (2, "b.mp4", -1.25), (3, None, 0.0)]
SCHEMA = "id long, name string, score double"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / fmt)
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "bucket", F.when(F.col("id") < 3, "lo").otherwise("hi")
    )
    path = str(tmp_path / "part")
    write_table(df, path, partition_by=["bucket"])
    back = read_table(spark, path).filter(F.col("bucket") == "lo")
    assert back.count() == 2
    plan = back._jdf.queryExecution().executedPlan().toString()
    # equality filter on the partition column must prune at planning time
    assert "PartitionFilters: [" in plan and "bucket" in plan.split("PartitionFilters")[1][:120]


def test_json_quarantine_captures_malformed(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text('{"id": 1, "name": "ok"}\n{"id": broken!!\n{"id": 2, "name": "ok2"}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = read_json_with_quarantine(spark, str(p), schema)
    clean, bad = split_corrupt(df)
    assert {r.id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1  # reference silently dropped it (task.go:98-101)
