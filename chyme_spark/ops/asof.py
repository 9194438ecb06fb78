"""As-of join — an operator Spark lacks natively, composed from a
union + keyed ordered window (the scale path: one shuffle on the join
key, in-partition sort, no range explosion).

For each event row, find the most recent order by the same user at or
before the event time. The alternative compositions are (b) per-group
``applyInPandas`` with ``pd.merge_asof`` (Python in the hot path) and
(c) bucketized range join (duplicates rows per bucket); the
union-window form is all-JVM and shuffles each input row exactly once,
so it is the default.

Determinism: multiple orders on the same (user, date) are collapsed to
max(o_orderkey) first, so both engines agree on the matched row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chyme_spark.registry import query
from chyme_spark.session import load_table


@query(
    "x_asof_join",
    oracle="""
    WITH best AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate)
    SELECT e.event_id, e.user_id, b.o_orderkey AS asof_orderkey
    FROM events e
    ASOF JOIN best b ON e.user_id = b.o_custkey AND e.ts >= b.o_orderdate
    """,
    doc="as-of join (latest order at-or-before each event) via union + ordered window; DuckDB native ASOF JOIN oracle",
)
def x_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    events = load_table(spark, sf, "events")
    orders = load_table(spark, sf, "orders")
    best = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(1).alias("is_event"),
    )
    right = best.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.lit(0).alias("is_event"),
    )
    # orders sort before events at equal t (is_event asc) => the join is
    # inclusive: an order dated exactly at the event time matches
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("is_event") == 1) & F.col("asof_orderkey").isNotNull())
        .select("event_id", F.col("k").alias("user_id"), "asof_orderkey")
    )
