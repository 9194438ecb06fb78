"""Upsert/SCD2 semantics + bucketed co-located joins (no-shuffle proof)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chyme_spark.merge import latest_per_key, scd2_apply, upsert


def test_upsert_last_write_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21, 5), (2, "b3", 22, 9), (4, "d", 40, 1)],
        "id long, name string, v long, ts long",
    )
    latest = latest_per_key(updates, ["id"], "ts").drop("ts")
    merged = {(r.id, r.name, r.v) for r in upsert(target, latest, ["id"]).collect()}
    assert merged == {(1, "a", 10), (2, "b3", 22), (3, "c", 30), (4, "d", 40)}


def test_scd2_closes_and_appends(spark):
    dim = spark.createDataFrame(
        [(1, "x", "2024-01-01", None, True), (2, "y", "2024-01-01", None, True)],
        "id long, attr string, effective_from string, effective_to string, is_current boolean",
    ).select(
        "id", "attr",
        F.to_timestamp("effective_from").alias("effective_from"),
        F.to_timestamp("effective_to").alias("effective_to"),
        "is_current",
    )
    changes = spark.createDataFrame([(1, "x2", "2024-06-01")], "id long, attr string, effective_from string").select(
        "id", "attr", F.to_timestamp("effective_from").alias("effective_from")
    )
    out = scd2_apply(dim, changes, "id")
    rows = {(r.id, r.attr, r.is_current, r.effective_to is not None) for r in out.collect()}
    assert rows == {
        (2, "y", True, False),     # untouched current
        (1, "x", False, True),     # closed-out old version
        (1, "x2", True, False),    # new current version
    }
    # history invariant: exactly one current row per key
    per_key = out.filter("is_current").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in per_key)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    a = spark.range(0, 10000).select(F.col("id"), (F.col("id") % 7).alias("va"))
    b = spark.range(0, 10000).select(F.col("id"), (F.col("id") % 11).alias("vb"))
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    a.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_b")
    yield
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    j = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
    assert j.count() == 10000
    plan = j._jdf.queryExecution().executedPlan().toString()
    # co-located bucketed join: no Exchange on either side
    assert "Exchange hashpartitioning" not in plan


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, attr string, effective_from string, effective_to string, is_current boolean",
    ).select(
        "id", "attr",
        F.to_timestamp("effective_from").alias("effective_from"),
        F.to_timestamp("effective_to").alias("effective_to"),
        "is_current",
    )


def test_scd2_rejects_multiple_changes_per_key(spark):
    """Two change rows for one key would fan out the close join and
    append two 'current' versions — must raise, not corrupt (round-6
    review)."""
    dim = _dim(spark, [(1, "x", "2024-01-01", None, True)])
    changes = spark.createDataFrame(
        [(1, "x2", "2026-01-01"), (1, "x3", "2026-02-01")],
        "id long, attr string, effective_from string",
    ).select("id", "attr", F.to_timestamp("effective_from").alias("effective_from"))
    with pytest.raises(ValueError, match="not unique per key"):
        scd2_apply(dim, changes, "id")


def test_scd2_null_is_current_goes_to_history_not_limbo(spark):
    """A NULL is_current row for a changed key must survive as history;
    the NULL predicate previously dropped it from both branches."""
    dim = _dim(
        spark,
        [(1, "old", "2023-01-01", "2024-01-01", None),
         (1, "x", "2024-01-01", None, True)],
    )
    changes = spark.createDataFrame(
        [(1, "x2", "2026-01-01")], "id long, attr string, effective_from string"
    ).select("id", "attr", F.to_timestamp("effective_from").alias("effective_from"))
    out = scd2_apply(dim, changes, "id")
    assert out.count() == 3  # history + closed + fresh; nothing vanished
    assert out.filter(F.col("attr") == "old").count() == 1


def test_latest_per_key_deterministic_on_ties(spark):
    """Identical order_col values: the survivor must be the same row on
    every run (content-hash tie-break), not shuffle-order-dependent."""
    rows = [(1, f"v{i}", 100) for i in range(8)]
    winners = set()
    for partitions in (1, 4, 8):
        df = spark.createDataFrame(rows, "id long, val string, ts long").repartition(partitions)
        winners.add(latest_per_key(df, ["id"], "ts").collect()[0]["val"])
    assert len(winners) == 1
