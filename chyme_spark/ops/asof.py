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


@query(
    "x_interval_join_bucketed",
    oracle="""
    WITH iv AS (
        SELECT user_id AS iv_user, min(ts) AS lo, min(ts) + INTERVAL 6 HOUR AS hi
        FROM events WHERE user_id < 50 GROUP BY user_id)
    SELECT iv.iv_user, count(*) AS n_events,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value,
           min(e.event_id) AS first_event
    FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.hi
    GROUP BY iv.iv_user
    """,
    doc="interval (range) join via hour-bucket explosion: pure range predicate becomes an equi-join on the bucket + residual filter",
)
def x_interval_join_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Range join without an equi key, distributed as a bucketed
    equi-join — the second operator Spark lacks natively (it plans a
    raw ``ts BETWEEN lo AND hi`` join as BroadcastNestedLoopJoin,
    O(|events| x |intervals|)).

    Shape: each interval [lo, hi) explodes into the hour buckets it
    covers (bounded: a 6 h interval is <= 7 rows); events carry their
    single hour bucket; the join is an EQUI-join on the bucket followed
    by the exact residual range filter. Every (event, interval) match
    shares at least the event's bucket hour, and duplicates are
    impossible because each event has exactly ONE bucket — so no
    distinct pass is needed. Cost scales as |events| + |intervals| x
    hours-per-interval, shuffled on the bucket key: the plan that
    survives 100 TB of events. Pick the bucket width ~ the typical
    interval length (wider buckets = fewer exploded rows but more
    residual-filter misses per bucket).

    The interval set here (first 6 hours of each user_id < 50) stands
    in for any campaign/maintenance/session window table.
    """
    ev = load_table(spark, sf, "events").select("event_id", "ts", "user_id", "value")
    iv = (
        ev.filter(F.col("user_id") < 50)
        .groupBy(F.col("user_id").alias("iv_user"))
        .agg(F.min("ts").alias("lo"))
        .withColumn("hi", F.col("lo") + F.expr("INTERVAL 6 HOURS"))
    )
    buckets = iv.select(
        "iv_user",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("lo")),
                F.date_trunc("hour", F.col("hi")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bkt"),
    )
    evb = ev.withColumn("bkt", F.date_trunc("hour", F.col("ts")))
    joined = evb.join(buckets, "bkt").filter(
        (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))
    )
    return joined.groupBy("iv_user").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("sum_value"),
        F.min("event_id").alias("first_event"),
    )


@query(
    "x_asof_join_tolerance",
    # tolerance-bounded as-of (pandas merge_asof(tolerance=...) / kdb wj
    # semantics): each event matches the latest PURCHASE by the same
    # user at-or-before it — but only within 6 hours, the variant where
    # a stale reference row must NOT carry forward indefinitely.
    # Self-aligned inside the events table (orders and events occupy
    # disjoint year ranges in the synthetic data, so a cross-table
    # tolerance would be vacuously empty).
    oracle="""
    WITH ref AS (
        SELECT user_id, ts, max(event_id) AS ref_event
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id, r.ref_event AS asof_purchase
    FROM events e
    ASOF JOIN ref r ON e.user_id = r.user_id AND e.ts >= r.ts
    WHERE e.ts - r.ts <= INTERVAL 6 HOUR
    """,
    doc="tolerance-bounded as-of join: latest purchase at-or-before each event AND within 6 hours (merge_asof tolerance semantics); DuckDB ASOF + tolerance filter oracle",
)
def x_asof_join_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """Same union + keyed ordered window plan as x_asof_join (one
    shuffle per input, all-JVM), carrying the matched REFERENCE TIME
    through the window in a struct so the tolerance is a post-window
    filter — no second join, no range explosion. At 100 TB the window
    sort rides the same exchange the plain as-of already pays."""
    events = load_table(spark, sf, "events")
    ref = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("ref_event"))
    )
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("timestamp").alias("r_t"),
        F.lit(None).cast("long").alias("ref_event"),
        F.lit(1).alias("is_event"),
    )
    right = ref.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("r_t"),
        "ref_event",
        F.lit(0).alias("is_event"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", "ref_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        left.unionByName(right)
        .withColumn("m", F.last(F.when(F.col("is_event") == 0,
                                       F.struct("r_t", "ref_event")),
                                ignorenulls=True).over(w))
    )
    return (
        merged.filter(
            (F.col("is_event") == 1)
            & F.col("m").isNotNull()
            & (F.col("t") <= F.col("m.r_t") + F.expr("INTERVAL 6 HOUR"))
        )
        .select("event_id", F.col("k").alias("user_id"),
                F.col("m.ref_event").alias("asof_purchase"))
    )
