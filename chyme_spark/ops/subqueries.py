"""Optimizer-surface queries: correlated subqueries (Catalyst
decorrelation), value-range window frames, null-safe joins, global
aggregates.

These exercise rewrites the reference never had (SURVEY §4 lists them
as Catalyst freebies): a correlated scalar subquery decorrelates into
an aggregate + join; a RANGE frame is computed per value window rather
than per row; null-safe equality joins hash NULL as a real key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chyme_spark.ops.common import dec, money
from chyme_spark.registry import query
from chyme_spark.session import load_table


@query(
    "x_corr_scalar_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="correlated scalar subquery — Catalyst decorrelates to agg+join (no per-row re-execution)",
)
def x_corr_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    cust.createOrReplaceTempView("__sub_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal FROM __sub_customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM __sub_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "x_range_frame",
    # ordering key is exact MICROSECONDS on both engines: the earlier
    # seconds key diverged at sf0.1 because Spark's unix_timestamp
    # truncates the fractional second while duckdb's CAST(epoch(ts) AS
    # BIGINT) rounds it — adjacent events landed on different ordering
    # keys and the RANGE peer sets (and thus the sums) differed
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS hour_value
    FROM events
    """,
    doc="value-RANGE window frame: trailing 1-hour sum per user (peers included by value, not row position; exact-microsecond ordering key)",
)
def x_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        money(F.sum(dec("value")).over(w)).alias("hour_value"),
    )


@query(
    "x_nullsafe_join",
    oracle="""
    WITH tagged AS (
        SELECT nullif(lang, 'en') AS k, count(*) AS n FROM documents GROUP BY 1)
    SELECT a.k AS k, a.n AS n_a, b.n AS n_b
    FROM tagged a JOIN tagged b ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc="null-safe equality join (<=>): NULL matches NULL as a real key",
)
def x_nullsafe_join(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    tagged = docs.groupBy(F.nullif("lang", F.lit("en")).alias("k")).agg(
        F.count("*").alias("n")
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    return a.join(b, F.col("a.k").eqNullSafe(F.col("b.k"))).select(
        F.col("a.k").alias("k"), F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b")
    )


@query(
    "x_global_agg",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    """,
    doc="global (ungrouped) aggregate — partial combine on every partition, single-row merge",
)
def x_global_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        money(F.sum(dec("l_extendedprice"))).alias("total_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "x_full_outer_join",
    # Full outer join of two partial-coverage aggregates over the same
    # fact: customers with very large orders vs customers with urgent
    # orders — either side can be NULL, and the COALESCE'd key plus a
    # side tag pin the null semantics.
    oracle="""
    WITH big AS (
        SELECT o_custkey AS k, count(*) AS n_big
        FROM orders WHERE o_totalprice > 250000 GROUP BY 1),
    urgent AS (
        SELECT o_custkey AS k, count(*) AS n_urgent
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
    SELECT COALESCE(b.k, u.k) AS custkey,
           COALESCE(n_big, 0) AS n_big,
           COALESCE(n_urgent, 0) AS n_urgent,
           CASE WHEN b.k IS NULL THEN 'urgent_only'
                WHEN u.k IS NULL THEN 'big_only'
                ELSE 'both' END AS side
    FROM big b FULL OUTER JOIN urgent u ON b.k = u.k
    """,
    doc="full outer join: union of two keyed aggregates with null-filled non-matches and a side tag (big-spender vs urgent-order customer sets)",
)
def x_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Both build sides are post-aggregate (one row per custkey) so the
    full-outer SMJ shuffles two already-reduced inputs on the same key
    — at 100 TB the aggregation, not the outer join, carries the fact
    volume. Spark cannot broadcast a full-outer side (both sides
    preserve non-matches), so shuffle join is the only — and right —
    physical choice."""
    orders = load_table(spark, sf, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 250000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_big"))
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_urgent"))
    )
    b, u = big.alias("b"), urgent.alias("u")
    return b.join(u, F.col("b.k") == F.col("u.k"), "full_outer").select(
        F.coalesce(F.col("b.k"), F.col("u.k")).alias("custkey"),
        F.coalesce(F.col("n_big"), F.lit(0)).alias("n_big"),
        F.coalesce(F.col("n_urgent"), F.lit(0)).alias("n_urgent"),
        F.when(F.col("b.k").isNull(), "urgent_only")
        .when(F.col("u.k").isNull(), "big_only")
        .otherwise("both")
        .alias("side"),
    )
