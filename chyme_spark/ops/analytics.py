"""Analytics extensions: cube/grouping sets, distribution windows,
ordered collection aggregates, bitwise ops, safe (try_) functions, and
funnel analysis over event sequences.

All oracle-checked. The funnel operator is the flagship here: ordered
step detection (view -> click -> purchase per user) expressed as
conditional window minima — one shuffle on the user key, no
self-joins, which is what keeps funnels tractable over 100 TB of
events (a step-wise self-join would be k shuffles of the full table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chyme_spark.ops.common import dec, money, sql_ts_str, ts_str
from chyme_spark.registry import query
from chyme_spark.session import load_table


@query(
    "x_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all grouping-set combinations with grouping_id disambiguation",
)
def x_cube(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "gid",
            "n",
        )
    )


@query(
    "x_window_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ROUND(CAST(percent_rank() OVER w AS DECIMAL(18,6)), 4) AS DOUBLE) AS pct_rank,
           CAST(ROUND(CAST(cume_dist()    OVER w AS DECIMAL(18,6)), 4) AS DOUBLE) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="distribution windows: percent_rank / cume_dist (decimal-pinned rounding)",
)
def x_window_distribution(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w).cast("decimal(18,6)"), 4).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w).cast("decimal(18,6)"), 4).cast("double").alias("cume"),
    )


@query(
    "x_array_agg_sorted",
    oracle="""
    SELECT event_type,
           array_to_string((list(event_id ORDER BY event_id))[1:5], '|') AS first_ids,
           list_aggregate(list(DISTINCT user_id), 'count') AS n_users
    FROM events GROUP BY event_type
    """,
    doc="ordered collection aggregates: sorted collect_list slice + distinct collect count. "
    "The slice is emitted as a '|'-joined string: the driver's pandas canonicalizer "
    "cannot hash array cells (round-1 red row), same trick as x_string_agg.",
)
def x_array_agg_sorted(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_list("event_id")), 1, 5), "|"
        ).alias("first_ids"),
        F.size(F.collect_set("user_id")).alias("n_users"),
    )


@query(
    "x_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations_csv
    FROM nation GROUP BY n_regionkey
    """,
    doc="ordered string aggregation (string_agg / concat_ws over sorted collect_list)",
)
def x_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    nation = load_table(spark, sf, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations_csv")
    )


@query(
    "x_bitwise_fns",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 1 AS odd_forced,
           xor(o_orderkey, 21) AS xored,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr
    FROM orders
    """,
    doc="bitwise ops (the SimHash/partition-bucket building blocks)",
)
def x_bitwise_fns(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(1)).alias("odd_forced"),
        k.bitwiseXOR(F.lit(21)).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@query(
    "x_try_fns",
    oracle="""
    SELECT doc_id,
           TRY_CAST(source AS BIGINT) AS src_as_int,
           TRY_CAST(substring(source, 4) AS BIGINT) AS src_num,
           CASE WHEN n_chars = 0 THEN NULL ELSE n_chars END AS safe_len
    FROM documents
    """,
    doc="safe casts: try_cast returns NULL instead of raising under ANSI mode (quarantine-friendly parsing)",
)
def x_try_fns(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.col("source").try_cast("bigint").alias("src_as_int"),
        F.substring("source", 4, 100).try_cast("bigint").alias("src_num"),
        F.when(F.col("n_chars") == 0, None).otherwise(F.col("n_chars")).alias("safe_len"),
    )


@query(
    "x_histogram",
    # fixed-width binning with integer bucket math — the exact-histogram
    # building block (sketch-free; a 100 TB run does the same one-pass
    # groupBy over the bucket expression)
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS bucket_value
    FROM events GROUP BY 1
    """,
    doc="fixed-width histogram: one-pass bucketed aggregate over event values",
)
def x_histogram(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 25.0).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            money(F.sum(dec("value"))).alias("bucket_value"),
        )
    )


@query(
    "x_funnel",
    # step times as conditional minima over one user window: a user
    # converts at step k iff each step's first occurrence is at or after
    # the previous step's. One shuffle on user_id — never a self-join.
    oracle="""
    WITH steps AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
    SELECT
        COUNT(*) AS n_users,
        COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS step_view,
        COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 END) AS step_click,
        COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    AND t_purchase > t_click THEN 1 END) AS step_purchase
    FROM steps
    """,
    doc="funnel analysis: ordered view->click->purchase conversion counts via conditional step minima",
)
def x_funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    converted_click = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    converted_purchase = converted_click & (F.col("t_purchase") > F.col("t_click"))
    return steps.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("step_view"),
        F.count(F.when(converted_click, 1)).alias("step_click"),
        F.count(F.when(converted_purchase, 1)).alias("step_purchase"),
    )


# ---------------------------------------------------------------------------
# round-3 composed analytics: multi-stage TPC-H-shaped queries proving the
# engine composes joins/aggs/top-k the way a BI workload actually does
# ---------------------------------------------------------------------------


@query(
    "x_tpch_q3_shipping",
    # TPC-H Q3 shape (public spec) adapted to the synthetic schema:
    # unshipped-revenue per order for one market segment.
    oracle="""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment-filtered 3-way join, decimal revenue agg, top-10 with unique tiebreak",
)
def x_tpch_q3_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: orders prunes on the date predicate at the scan,
    lineitem (the fact) is the only side shuffled twice; the top-10 is
    a TakeOrderedAndProject, never a global sort. customer carries NO
    forced broadcast hint: it scales with the fact (~15M rows/TB), so
    a hint would OOM the build side at 100x — AQE promotes the
    segment-filtered dim to broadcast at runtime when (and only when)
    its measured size fits."""
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "x_tpch_q5_local_supplier",
    # TPC-H Q5 shape (public spec): revenue where the supplier is in the
    # customer's own nation, per nation of one region, one order-year.
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way snowflake join with the local-supplier correlation (s_nationkey = c_nationkey), per-nation decimal revenue",
)
def x_tpch_q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """The hardest standard join topology in the suite: a snowflake
    with a cross-dimension correlation (supplier nation == customer
    nation) that defeats naive star optimizers. 100 TB plan: region,
    nation, and supplier broadcast; customer x orders co-shuffle on the
    custkey; lineitem (the fact) shuffles once on orderkey; the
    correlated nationkey predicate is applied as a post-join filter on
    broadcast-local columns, adding no exchange."""
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue"))
    )


@query(
    "x_tpch_q18_big_orders",
    # TPC-H Q18 shape (public spec): large-volume customers — orders
    # whose total line quantity exceeds a threshold, with customer
    # context. The one headline query that exercises the NON-broadcast
    # join path: both sides of the orders x per-order-quantity join are
    # fact-scaled, so at 100 TB it is a sort-merge join, never a
    # broadcast (VERDICT r3: every other benched join broadcasts at
    # sf0.1, leaving SMJ + spill unmeasured).
    oracle="""
    WITH qty AS (
        SELECT l_orderkey,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice, total_qty
    FROM qty
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: per-order quantity rollup HAVING > 200, fact-fact merge join to orders (the forced-SMJ headline query), customer context, top-100",
)
def x_tpch_q18_big_orders(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: lineitem aggregates on l_orderkey (one shuffle,
    map-side partial agg cuts it to one row per order); the surviving
    big orders join ``orders`` on the SAME key — the ``merge`` hint pins
    the sort-merge strategy so the bench measures the co-shuffled
    fact-fact path (at sf0.1 AQE would otherwise broadcast the filtered
    aggregate and the spill path would never run; at 100 TB the
    aggregate side is ~10^9 rows and SMJ is the only viable plan). The
    exchange from the groupBy is REUSED by the merge join (both hash on
    the orderkey), so forcing SMJ adds a sort, not a second shuffle of
    lineitem. Customer carries NO forced broadcast hint — it scales
    with the fact (~15M rows/TB) and a pinned hint cannot be demoted
    by AQE, OOMing the build at 100x; AQE promotes it at runtime while
    it fits. The top-100 is a TakeOrderedAndProject, never a global
    sort."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 200)
        .select("l_orderkey", money(F.col("qty_dec")).alias("total_qty"))
    )
    return (
        qty.hint("merge")
        .join(orders, qty.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "x_gap_fill",
    # time-series regularization: per-entity hourly grid between its own
    # first and last observation, missing buckets filled with 0 — the
    # resample/gap-fill step before any windowed feature computation.
    oracle="""
    WITH b AS (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h
        FROM events WHERE user_id < 20),
    r AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM b GROUP BY user_id),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
        FROM r),
    c AS (SELECT user_id, h, count(*) AS n FROM b GROUP BY user_id, h)
    SELECT g.user_id,
           strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(c.n, 0) AS n_events
    FROM grid g LEFT JOIN c ON g.user_id = c.user_id AND g.h = c.h
    """,
    doc="time-series gap fill: per-user dense hourly grid (sequence + explode) left-joined with observed counts, zeros for missing buckets",
)
def x_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Resample-to-regular-grid. 100 TB shape: the grid generates from a
    per-key min/max agg (one small shuffle), the explode is narrow, and
    the fill join is key-aligned (same (user, hour) hash) — no global
    calendar table, no cross join. Bounded here to user_id < 20 purely
    to keep the sf-proportional oracle diff small."""
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    b = ev.select("user_id", F.date_trunc("hour", "ts").alias("h"))
    grid = (
        b.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    counts = b.groupBy("user_id", "h").agg(F.count("*").alias("n"))
    return (
        grid.join(counts, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "x_tpch_q4_order_priority",
    # TPC-H Q4 shape (public spec) adapted to the synthetic schema: the
    # spec's commit<receipt lateness predicate becomes shipped-after-
    # order (l_commitdate/l_receiptdate don't exist in this dataset);
    # the plan shape — date-pruned orders EXISTS-semi-joined to the
    # lineitem fact, then a tiny priority rollup — is the point.
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: date-pruned orders LEFT SEMI (EXISTS) lineitem with a cross-side non-equi conjunct, priority rollup",
)
def x_tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the quarter filter prunes orders at the scan; the
    EXISTS is a LEFT SEMI join on the order key, so lineitem is never
    widened into the output (no dedup needed, no row explosion) and the
    non-equi shipdate conjunct rides the same hash join; the final
    rollup is a ~5-row map-side aggregate."""
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "x_tpch_q7_volume_shipping",
    # TPC-H Q7 shape (public spec): bilateral trade volume between two
    # nations, by supplier-nation / customer-nation / ship-year, with
    # the disjunctive either-direction pair predicate.
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l_shipdate) AS ship_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral nation-pair volume with disjunctive direction predicate, per ship-year decimal revenue",
)
def x_tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: both nation dims broadcast (the pair filter lands on
    broadcast-local columns, so the disjunction prunes before any
    exchange); supplier broadcasts; the only shuffles are the two fact
    hashes (lineitem on orderkey, orders x customer on custkey). The
    date filter pushes to the lineitem scan."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("volume"))
    )


@query(
    "x_tpch_q10_returned_items",
    # TPC-H Q10 shape (public spec): revenue lost to returns per
    # customer for one quarter, top-20 customers.
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           c_acctbal
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer (one quarter), nation context, top-20 with unique tiebreak",
)
def x_tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: returnflag + date predicates push to both fact
    scans; lineitem x orders co-hash on the orderkey, the result hashes
    on custkey to meet customer; nation broadcasts; top-20 is a
    TakeOrderedAndProject (never a global sort)."""
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "x_grouping_sets",
    # explicit GROUPING SETS that are NOT a rollup/cube prefix chain —
    # two independent single-column sets plus the grand total, i.e. two
    # different marginal views computed in one pass over the fact.
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUPING SETS ((a),(b),()) — independent marginals + grand total in one pass (not expressible as rollup/cube), grouping_id disambiguated",
)
def x_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 DataFrame ``groupingSets``: one Expand + one aggregate
    — the fact is scanned ONCE for all marginals (at 100 TB the naive
    alternative is k scans + k shuffles union'd). Expand multiplies
    rows by the number of sets BEFORE the shuffle, but map-side partial
    aggregation collapses them to ~cardinality(sets) rows per task."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            money(F.sum(dec("l_quantity"))).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "gid",
            "n",
            "sum_qty",
        )
    )


@query(
    "x_tpch_q13_cust_distribution",
    # TPC-H Q13 shape (public spec): the order-count histogram over ALL
    # customers including the zero-order ones — a LEFT OUTER join
    # followed by a second aggregation over the first's result (the
    # double-agg topology none of the other queries exercise). The
    # spec's comment-pattern exclusion becomes an order-priority
    # exclusion (no o_comment column in the synthetic schema).
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: LEFT OUTER join keeping zero-order customers, per-customer count, then the count-of-counts histogram (double aggregation)",
)
def x_tpch_q13_cust_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: orders shuffles on custkey once; customer joins on
    the same key (outer, so customers with no surviving orders keep a
    row — count(o_orderkey) ignores the NULLs); the second aggregate's
    input is one row per customer and its output one row per distinct
    count, so the histogram exchange is tiny. The non-join-key
    predicate sits IN the join condition (not a post-filter), which is
    what preserves the zero-order rows."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "x_tpch_q22_sales_opportunity",
    # TPC-H Q22 shape (public spec): positive-balance customers above
    # the average positive balance with no recent urgent order — an
    # UNCORRELATED scalar subquery (the global average) feeding a
    # filter, then an anti join against a date/priority-pruned slice of
    # the fact. Country-code grouping becomes nationkey-mod grouping
    # (no phone column), and "never ordered" becomes "no urgent order
    # since 2000" (the synthetic generator gives every customer at
    # least one order, so the literal spec predicate is degenerate).
    oracle="""
    WITH bal_stats AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS tot,
               CAST(count(*) AS BIGINT) AS cnt
        FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey % 5 AS cntry_grp,
           count(*) AS n_cust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
    FROM customer
    -- bal > avg rewritten as bal * cnt > total: pure exact decimal/int
    -- arithmetic on both engines (Spark AVG(decimal) is a scale-capped
    -- DECIMAL quotient, DuckDB's is DOUBLE — an unpinnable boundary;
    -- round-6 review, same class as the Q17 cross-multiplication)
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT cnt FROM bal_stats)
          > (SELECT tot FROM bal_stats)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntry_grp
    """,
    doc="TPC-H Q22 shape: uncorrelated scalar-subquery average gating a filter, LEFT ANTI join vs orders (never-ordered customers), grouped balance rollup",
)
def x_tpch_q22_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the scalar average is a one-row subquery Spark
    evaluates first and folds into the filter (no join); the NOT EXISTS
    is a LEFT ANTI hash join on custkey — orders projects ONLY the join
    key into the exchange (column pruning keeps the anti-join build
    narrow); the final rollup is a ~5-row aggregate. The mean-balance
    gate is cross-multiplied (bal * cnt > total) so the comparison is
    exact decimal/integer arithmetic end-to-end — an AVG quotient is
    unpinnable across engines (Spark: scale-capped DECIMAL; DuckDB:
    DOUBLE)."""
    cust = load_table(spark, sf, "customer")
    orders = (
        load_table(spark, sf, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "2000-01-01")
        )
        .select("o_custkey")
    )
    bal_stats = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(dec("c_acctbal")).alias("tot"),
            F.count("*").alias("cnt"),
        )
    )
    return (
        cust.join(F.broadcast(bal_stats))
        .filter(dec("c_acctbal") * F.col("cnt") > F.col("tot"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntry_grp"))
        .agg(
            F.count("*").alias("n_cust"),
            money(F.sum(dec("c_acctbal"))).alias("total_bal"),
        )
    )


@query(
    "x_cohort_retention",
    # the classic product-analytics cohort matrix: users bucketed by
    # first-seen week, counted in each subsequent week they were
    # active — week truncation is ISO-Monday in both engines.
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INT) AS week_offset,
           count(*) AS n_users
    FROM active a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="cohort retention matrix: first-seen-week cohorts x active-week offsets -> user counts (product-analytics staple over the events stream)",
)
def x_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: events collapse to distinct (user, week) rows first
    (map-side combine before the exchange), then the cohort week is a
    MIN window over the user partition of that already-tiny activity
    set — no first-seen aggregate, no join (a join formulation either
    broadcasts a users-sized table, impossible at 10^9 users, or pays a
    third full exchange). The final matrix is a ~weeks^2-row aggregate.
    No event-grain self-join anywhere."""
    ev = load_table(spark, sf, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    active = ev.distinct()
    cohort = active.withColumn(
        "cohort_week", F.min("wk").over(Window.partitionBy("user_id"))
    )
    return (
        cohort.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.to_date("wk"), F.to_date("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "x_tpch_q14_promo_revenue",
    # TPC-H Q14 shape (public spec): the share of one month's revenue
    # from promo parts — a conditional aggregate over a fact x dim join
    # collapsing to ONE row.
    # determinism note (TWAP discipline): a decimal QUOTIENT can't be
    # pinned across engines — each rounds the division to its own result
    # scale. Both sums are exact decimals; round each to scale 4 (exact
    # half-away-from-zero in both engines on exact inputs), unscale to
    # integers, and take the quotient via exact INTEGER floor division
    # (both numerator and denominator are positive, so Spark `div` and
    # DuckDB `//` agree). promo_pct is therefore 100*num/den TRUNCATED
    # to 4 decimals — identical by construction.
    oracle="""
    WITH s AS (
        SELECT SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))
                 ELSE 0 END) AS num,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS den,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01')
    SELECT CAST((CAST(ROUND(num, 4) * 10000 AS HUGEINT) * 1000000
                 // CAST(ROUND(den, 4) * 10000 AS HUGEINT)) / 10000.0
                AS DOUBLE) AS promo_pct,
           n_lines
    FROM s
    """,
    doc="TPC-H Q14 shape: promo revenue share for one ship-month — conditional decimal aggregate over a broadcast dim join, single-row output",
)
def x_tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the month filter pushes to the lineitem scan; part
    broadcasts; the conditional sums are ONE map-side partial aggregate
    (no shuffle of data rows at all — the only exchange carries partial
    sums). The CASE rides inside the aggregate, not a second scan."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = load_table(spark, sf, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("num"),
            F.sum(rev).alias("den"),
            F.count("*").alias("n_lines"),
        )
        .select(
            (
                F.expr(
                    "CAST(ROUND(num, 4) * 10000 AS DECIMAL(38,0)) * 1000000 "
                    "div CAST(ROUND(den, 4) * 10000 AS DECIMAL(38,0))"
                )
                / F.lit(10000.0)
            ).cast("double").alias("promo_pct"),
            "n_lines",
        )
    )


@query(
    "x_tpch_q15_top_supplier",
    # TPC-H Q15 shape (public spec): the supplier(s) whose quarterly
    # revenue EQUALS the maximum — an aggregate feeding a scalar-max
    # subquery over itself (the classic agg-then-self-max topology).
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: quarterly revenue per supplier, keep the max-revenue supplier(s) via scalar-max over the aggregate itself",
)
def x_tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: ONE suppkey-hashed aggregate of the date-pruned
    fact, PERSISTED so both the 1-row scalar max and the equality
    filter read it once — the fact is never aggregated twice AND the
    max never funnels the whole per-supplier aggregate into a single
    task. (The previous form used an empty-window max: correct, but an
    unpartitioned window is a SinglePartition exchange — O(suppliers)
    rows in one task at 100 TB. A separate rev.agg(max) subquery
    without persist is no better: column pruning diverges the
    subtrees, exchange reuse cannot fire, and the fact aggregates
    twice — verified on the executed plan.) The max reduces
    partial-per-partition then 1 row, broadcast back via crossJoin.
    The equality filter + supplier broadcast join touch only the
    surviving row(s). Decimal revenue makes the max/equality exact —
    a double tie at the top would be engine-dependent."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf, "supplier")
    # persist lifetime: evicted by the ContextCleaner once the returned
    # DataFrame is unreferenced; until then repeat executions in one
    # session read the cache — do NOT add this query to a timed bench
    # loop without explicit unpersist handling (round-6 review)
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("total_revenue"))
    ).persist()
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "x_tpch_q17_small_qty_parts",
    # TPC-H Q17 shape (public spec): revenue from small-quantity orders
    # of one brand — lines below 20% of their PART'S OWN average
    # quantity. The correlated-average topology: a per-partkey aggregate
    # of the fact joined back to the same fact on the same key.
    # determinism note: the 20%-of-average threshold is compared via
    # exact integer cross-multiplication — qty < 0.2*sum/cnt is
    # equivalent (cnt > 0) to 5*qty*cnt < sum, which both engines
    # evaluate in exact decimal arithmetic: no engine-specific AVG
    # result type (DuckDB AVG(DECIMAL) is DOUBLE, Spark's is DECIMAL)
    # can flip a boundary row. The /7 quotient is pinned by integer
    # floor division (positive operands: Spark `div` == DuckDB `//`).
    oracle="""
    WITH pa AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
               count(*) AS cnt
        FROM lineitem GROUP BY l_partkey),
    s AS (
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN pa ON pk = l_partkey
        WHERE p_brand = 'Brand#13'
          AND 5 * CAST(l_quantity AS DECIMAL(18,4)) * cnt < sum_qty)
    SELECT CAST((CAST(rev * 10000 AS HUGEINT) * 100 // 70000) / 100.0 AS DOUBLE)
             AS avg_yearly,
           n_lines
    FROM s
    """,
    doc="TPC-H Q17 shape: lines under 20% of their part's own average quantity (per-key correlated aggregate joined back to the fact on the same key), one-row revenue output",
)
def x_tpch_q17_small_qty_parts(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the per-partkey average is ONE hash aggregate of the
    fact (map-side combine -> one row per part); joining it back to
    lineitem is partkey-to-partkey — the aggregate's exchange is reused
    for the join side, so the fact shuffles once total. The brand
    filter rides the broadcast part dim. The threshold comparison is
    exact integer cross-multiplication (5*qty*cnt < sum_qty), never a
    rounded average: a double 0.2*avg at the boundary would admit
    different rows per engine; the /7 quotient is pinned by integer
    floor division (TWAP discipline)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#13")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.lit(5) * dec("l_quantity") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.sum(dec("l_extendedprice")).alias("rev"),
            F.count("*").alias("n_lines"),
        )
        .select(
            (
                F.expr("CAST(rev * 10000 AS DECIMAL(38,0)) * 100 div 70000")
                / F.lit(100.0)
            ).cast("double").alias("avg_yearly"),
            "n_lines",
        )
    )


@query(
    "x_tpch_q19_disjunctive_join",
    # TPC-H Q19 shape (public spec): revenue matching an OR of three
    # brand/size/quantity conjunct bundles — the disjunctive multi-
    # predicate join the optimizer must NOT turn into three scans.
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="TPC-H Q19 shape: OR of three brand/size/quantity conjunct bundles over one broadcast join pass (no scan-per-disjunct), one-row decimal revenue",
)
def x_tpch_q19_disjunctive_join(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: ONE scan of lineitem, one broadcast of part, the
    whole disjunction evaluated post-join inside codegen. The union-of-
    three-joins formulation would scan the fact three times; Catalyst
    also derives the implied l_quantity range [1,40] for scan-level
    row-group pruning."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#7") & sz.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#13") & sz.between(20, 50) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "x_tpch_q8_market_share",
    # TPC-H Q8 shape (public spec): one supplier-nation's share of a
    # region's promo-part revenue per order-year — the conditional
    # share-of-total ratio computed per group in one pass.
    oracle="""
    WITH all_nations AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           -- both sums stay exact DECIMAL, are cast to DOUBLE, and the
           -- quotient is ONE IEEE double division — pinned on both
           -- engines (Spark's decimal/decimal would pre-round at its
           -- result scale while DuckDB's yields DOUBLE; round-6 review)
           CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share,
           count(*) AS n_lines
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of a region's promo revenue per order-year — conditional share-of-total ratio, 8-way snowflake with four broadcast dims",
)
def x_tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: part/nation/region/supplier all broadcast (with the
    p_type + r_name filters applied broadcast-local before the join);
    lineitem x orders co-hash on the orderkey, then one custkey hash to
    meet customer; the share-of-total is a CASE inside the same
    aggregate — never a second pass or a windowed total. The decimal
    volume keeps the ratio exact at the 4th decimal."""
    part = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf, "supplier")
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(F.lit(0))).cast("double")
                / F.sum(volume).cast("double"),
                4,
            ).cast("double").alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_year")
    )


@query(
    "x_tpch_q9_product_profit",
    # TPC-H Q9 shape (public spec): product-type profit measure — profit
    # per supplier-nation per order-year over a part-name pattern, the
    # widest fact-centred snowflake in the suite (part + supplier +
    # nation dims meeting lineitem x orders). The synthetic schema has
    # no partsupp/ps_supplycost: cost is adapted to
    # p_retailprice * l_quantity (deterministic, part-derived), keeping
    # the profit = revenue - cost arithmetic and the full topology.
    oracle="""
    WITH profit AS (
        SELECT n_name AS nation,
               year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))
                 - CAST(p_retailprice AS DECIMAL(18,4))
                 * CAST(l_quantity AS DECIMAL(18,4)) AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%red%')
    SELECT nation, o_year,
           CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit,
           count(*) AS n_lines
    FROM profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit per supplier-nation per order-year over a part-name pattern — the widest snowflake (3 broadcast dims + fact-fact orderkey join), decimal-exact profit arithmetic",
)
def x_tpch_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: part (pre-filtered on the name pattern — ~13%
    selectivity applied before the join), supplier, and nation are all
    dimension-sized and broadcast; lineitem x orders is the one real
    shuffle (orderkey co-hash), then one hash to the (nation, year)
    grouping. Profit stays exact DECIMAL end-to-end — both products are
    (18,4)x(18,4) -> (37,8), within both engines' 38-digit exactness —
    so the cross-engine hash cannot drift on summation order
    (ref test parity: internal/core TPC-H-style aggregation coverage)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    orders = load_table(spark, sf, "orders")
    amount = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(money(F.sum(amount)).alias("sum_profit"), F.count("*").alias("n_lines"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "x_tpch_q21_waiting_supplier",
    # TPC-H Q21 shape (public spec): suppliers who were the ONLY late
    # supplier on a multi-supplier order — the double correlated
    # EXISTS / NOT-EXISTS self-join on the fact. "Late" is adapted to
    # shipped >60 days after the order date (no commit/receipt dates in
    # the synthetic schema); the topology is the point.
    oracle="""
    WITH l AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F')
    SELECT s_name, count(*) AS numwait
    FROM l l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (
        SELECT 1 FROM l l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM l l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: only-late supplier on multi-supplier orders — correlated EXISTS (semi) + NOT EXISTS (anti) self-joins on the fact, top-20 by wait count",
)
def x_tpch_q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the naive translation (semi + anti self-joins like
    the SQL) scans and shuffles lineitem THREE times — verified on the
    executed plan before this rewrite. Instead the correlated pair of
    subqueries collapses algebraically into per-order supplier counts:
    a late (order, supplier) qualifies iff the order has >= 2 suppliers
    and exactly ONE late supplier (necessarily this one). So: one
    orderkey co-shuffle of the two facts, one (orderkey, suppkey)
    rollup, one orderkey rollup of THAT (tiny), one key-aligned join
    back — the full-grain fact is read and shuffled exactly once.
    Supplier broadcasts; top-20 is a TakeOrderedAndProject."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf, "supplier")
    # the explicit suppkey null-filter makes the two consumers of
    # per_os (the per-order rollup and the qualify join) share an
    # IDENTICAL subtree: without it the downstream supplier join pushes
    # isnotnull(l_suppkey) into only one branch, the subtrees diverge,
    # and ReuseExchange cannot dedupe the fact scan+shuffle (verified
    # on the executed plan: two lineitem scans without, one with)
    l = (
        li.filter(F.col("l_suppkey").isNotNull())
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).alias("is_late"),
        )
    )
    per_os = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("any_late"),
        F.sum(F.col("is_late").cast("int")).alias("n_late_lines"),
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
    )
    qual = per_os.join(per_o, "l_orderkey").filter(
        (F.col("any_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        qual.join(F.broadcast(supp), qual.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "x_tpch_q6_forecast_revenue",
    # TPC-H Q6 (public spec): the pure scan-predicate-aggregate query —
    # one year, a discount band, a quantity cap, no joins at all. The
    # baseline the scan path must win on pushdown alone.
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: scan-predicate-aggregate with zero joins — all three predicates pushed to the parquet scan, single-row decimal revenue",
)
def x_tpch_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: all three predicates reach PushedFilters on the
    scan (row-group pruning does the work); the aggregate is one
    map-side partial + a single-row exchange. This is the query where
    anything but scan-bound performance is a defect."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "x_tpch_q12_priority_shipping",
    # TPC-H Q12 shape (public spec): per shipping class, how many
    # high- vs low-priority orders shipped — the dual conditional-count
    # rollup. l_shipmode doesn't exist in the synthetic schema; the
    # return flag plays the class axis, the topology is identical.
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape: dual conditional counts (high/low priority) per shipping class over a fact-fact orderkey join",
)
def x_tpch_q12_priority_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: both facts co-hash on the orderkey (the only
    exchange of data rows); both conditional counts ride ONE aggregate
    pass — never two filtered scans union'd. The year filter pushes to
    the lineitem scan and prunes before the join."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "x_tpch_q2_min_cost_supplier",
    # TPC-H Q2 shape (public spec): for each qualifying part, the
    # supplier with the MINIMUM cost in one region — the correlated
    # min-per-group subquery topology. The synthetic schema has no
    # partsupp: the part-supplier relation derives from lineitem
    # (distinct (partkey, suppkey) pairs) and supplier account balance
    # stands in for supply cost.
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
    costed AS (
        SELECT pk, sk, s_name, s_acctbal, n_name
        FROM ps
        JOIN supplier ON s_suppkey = sk
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE')
    SELECT p_partkey, p_brand, s_name, n_name,
           CAST(s_acctbal AS DOUBLE) AS cost
    FROM costed
    JOIN part ON p_partkey = pk
    WHERE p_size = 15 AND p_type = 'LARGE'
      AND s_acctbal = (
        SELECT min(c2.s_acctbal) FROM costed c2 WHERE c2.pk = costed.pk)
    ORDER BY cost, p_partkey, s_name
    """,
    doc="TPC-H Q2 shape: min-cost supplier per part in one region — correlated min-per-group over the lineitem-derived part-supplier relation (no partsupp in the synthetic schema)",
)
def x_tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the part-supplier pairs dedupe in one (pk, sk)
    hash; supplier/nation/region broadcast with the region filter
    broadcast-local; the correlated min is a WINDOW over the pk
    partition of the same relation (one shuffle, no second aggregate
    branch — the Q15 lesson applied), and the part filter broadcasts.
    Ties on the min cost keep every tying supplier, same as the spec's
    equality semantics."""
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    ps = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    costed = (
        ps.join(F.broadcast(supp), ps.sk == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("pk", "sk", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("pk")
    return (
        costed.withColumn("min_cost", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("pk") == part.p_partkey)
        .select(
            "p_partkey", "p_brand", "s_name", "n_name",
            F.col("s_acctbal").cast("double").alias("cost"),
        )
        .orderBy("cost", "p_partkey", "s_name")
    )


@query(
    "x_tpch_q11_important_stock",
    # TPC-H Q11 shape (public spec): stock lines whose value exceeds a
    # global threshold computed from the whole relation — the HAVING >
    # scalar-subquery topology. Value derives from lineitem (price x
    # quantity of one nation's suppliers) instead of partsupp, and the
    # spec's fixed fraction-of-total becomes 2x the MEAN part value so
    # the predicate is scale-invariant (a fixed fraction goes
    # degenerate as the part count grows: 0 rows at sf0.1).
    # determinism note: the threshold val > 2*total/cnt is compared via
    # exact cross-multiplication val*cnt > 2*total (cnt > 0) — all
    # decimal/bigint exact in both engines, no engine-rounded quotient.
    # Each price*qty product is cast to DECIMAL(18,4) (exact: 2-decimal
    # price x 2-decimal qty has at most 4 decimals) so val*cnt stays
    # inside decimal(38,4) without scale-reducing rounds.
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4))) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey),
    s AS (SELECT SUM(val) AS total, COUNT(*) AS cnt FROM v)
    SELECT l_partkey,
           CAST(ROUND(val, 2) AS DOUBLE) AS part_value
    FROM v, s
    WHERE val * cnt > 2 * total
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape: per-part value kept only above a fraction of the global total (HAVING > scalar subquery), one-nation supplier slice",
)
def x_tpch_q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: one partkey-hashed aggregate of the nation-pruned
    fact, PERSISTED so both consumers (the 1-row global stats and the
    threshold filter) read it once — the fact aggregates ONCE and
    nothing ever funnels into a single partition. The previous form
    used an empty-window global sum/count, which moves the ENTIRE
    per-part aggregate (billions of rows at 100 TB) into one task;
    stats instead reduce partial-per-partition then 1 row, broadcast
    back via crossJoin (the repo's Q22/BM25 scalar pattern). The
    threshold comparison is exact cross-multiplication (val*cnt >
    2*total) in decimal — no engine-rounded quotient at the boundary."""
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (dec("l_extendedprice") * dec("l_quantity")).cast("decimal(18,4)")
            ).alias("val")
        )
    ).persist()  # ContextCleaner-bounded; see the x_tpch_q15 persist note
    stats = v.agg(F.sum("val").alias("total"), F.count("*").alias("cnt"))
    return (
        v.crossJoin(F.broadcast(stats))
        .filter(F.col("val") * F.col("cnt") > F.lit(2) * F.col("total"))
        .select("l_partkey", money(F.col("val")).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "x_tpch_q16_supplier_count",
    # TPC-H Q16 shape (public spec): how many distinct suppliers can
    # deliver each (brand, type, size) bucket, EXCLUDING a computed
    # supplier blacklist — the NOT-IN + count-distinct rollup. The
    # part-supplier relation derives from lineitem; the spec's
    # complaint-comment blacklist becomes negative account balance.
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
    bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT sk) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = pk
    WHERE p_size IN (5, 15, 25, 35)
      AND sk NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier count per (brand, type, size) excluding a computed blacklist — anti join + count distinct over the lineitem-derived part-supplier relation",
)
def x_tpch_q16_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the blacklist is a broadcast ANTI join (NOT IN with
    a provably non-null key list — the null-semantics trap of NOT IN
    doesn't arise because s_suppkey is a key); part broadcasts with the
    size filter applied first; the distinct count is a two-level
    aggregate (partial distinct per partition, then merge), one
    exchange on the group key."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_size").isin(5, 15, 25, 35))
    bad = load_table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    return (
        ps.join(F.broadcast(bad), ps.sk == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("pk") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sk").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "x_tpch_q20_promo_suppliers",
    # TPC-H Q20 shape (public spec): suppliers in one nation who moved
    # a significant volume of promo parts in one year — the nested
    # semi-join chain (supplier IN (suppliers of parts IN (promo
    # parts) with volume > threshold)). Volume derives from lineitem
    # (no partsupp availqty in the synthetic schema).
    oracle="""
    WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    vol AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM promo)
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 50)
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (SELECT l_suppkey FROM vol)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: nested semi-join chain — suppliers (one nation) IN movers-of (promo parts) above a quantity threshold, volume from lineitem",
)
def x_tpch_q20_promo_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the promo-part semi join prunes lineitem BEFORE its
    (suppkey, partkey) rollup (broadcast semi — part is a dim); the
    HAVING keeps ~qualifying pairs only; the supplier IN becomes a
    LEFT SEMI against the distinct mover keys; nation broadcasts. Each
    fact row is touched once; both IN-subqueries are semi joins, never
    distinct-then-inner-join materializations."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    promo = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    vol = (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(vol, supp.s_suppkey == vol.l_suppkey, "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
        .orderBy("s_name")
    )


@query(
    "x_yoy_growth",
    # year-over-year growth per nation: aggregate first, THEN a lag
    # window over the aggregate's own (tiny) output — the standard
    # reporting shape (TPC-DS-style period-over-period comparison)
    # that must never be a self-join of the fact on shifted years.
    oracle="""
    WITH rev AS (
        SELECT n_name, year(o_orderdate) AS o_year,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY n_name, year(o_orderdate))
    SELECT n_name, o_year, revenue,
           CAST(ROUND(CAST(revenue - lag(revenue) OVER w AS DECIMAL(18,4)), 2) AS DOUBLE) AS yoy_delta
    FROM rev
    WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
    ORDER BY n_name, o_year
    """,
    doc="year-over-year revenue growth per nation: lag window over the aggregate's own output (period-over-period reporting shape; never a shifted self-join of the fact)",
)
def x_yoy_growth(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the fact aggregates once on (nation, year) with
    map-side combine; the lag window runs over ~nations x years rows.
    The naive alternative — joining the fact to itself on year+1 —
    shuffles the fact twice and is O(fact) where this is O(groups)."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(money(F.sum(dec("o_totalprice"))).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    return (
        rev.withColumn(
            "yoy_delta",
            F.round((F.col("revenue") - F.lag("revenue").over(w)).cast("decimal(18,4)"), 2)
            .cast("double"),
        )
        .orderBy("n_name", "o_year")
    )


@query(
    "x_time_weighted_avg",
    # time-weighted average of the event value per user (the
    # observability/finance TWAP staple, cf. TimescaleDB time_weight,
    # public docs): each observation holds until the next one, so its
    # weight is the gap to the next event — a lead window + one
    # aggregate, never a grid expansion.
    # determinism note: a decimal QUOTIENT is the one arithmetic decimal
    # discipline can't pin — each engine rounds the division to its own
    # result scale before the final ROUND, so half-ulp boundaries flip
    # (seen live: 32.5204 vs 32.5205). The quotient is therefore
    # truncated via exact INTEGER floor division — wsum has scale 4, so
    # wsum*10^4 is an exact bigint, and a//b == floor for the positive
    # values here — identical in both engines by construction.
    oracle="""
    WITH seg AS (
        SELECT user_id, value,
               epoch_ms(lead(ts) OVER w) - epoch_ms(ts) AS dt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    agg AS (
        SELECT user_id,
               SUM(CAST(value AS DECIMAL(18,4)) * CAST(dt AS DECIMAL(18,0))) AS wsum,
               CAST(SUM(dt) AS BIGINT) AS tsum
        FROM seg WHERE dt IS NOT NULL
        GROUP BY user_id)
    SELECT user_id,
           (CAST(wsum * 10000 AS BIGINT) // tsum) / 10000.0 AS twap
    FROM agg WHERE tsum > 0
    ORDER BY user_id
    """,
    doc="time-weighted average value per user: hold-until-next segments via lead window, decimal-weighted one-pass aggregate (TWAP / TimescaleDB time_weight analog)",
)
def x_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: ONE shuffle on the user key serves both the lead
    window and the aggregate (same partitioning); weights are exact
    integer second gaps cast to decimal so the weighted mean is
    order-insensitive. No calendar grid, no per-interval explosion —
    cost is O(events), not O(events x resolution)."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        (
            F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum(dec("value") * F.col("dt").cast("decimal(18,0)")).alias("wsum"),
            F.sum("dt").cast("bigint").alias("tsum"),
        )
        .filter(F.col("tsum") > 0)
        .select(
            "user_id",
            (
                F.expr("CAST(wsum * 10000 AS BIGINT) div tsum") / F.lit(10000.0)
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@query(
    "x_zorder_layout",
    # Z-order (Morton) interleave of two key columns — the data-layout
    # primitive behind multi-dimensional clustering (Delta OPTIMIZE
    # ZORDER, Iceberg sort orders): rows sorted by the interleaved key
    # are simultaneously clustered on BOTH dimensions, so min/max file
    # statistics prune scans on either predicate. Pure integer bit math
    # (shifts, masks, adds) — bit-identical across engines by
    # construction, no floating point anywhere.
    oracle="""
    WITH z AS (
      SELECT o_orderkey, o_custkey,
             (SELECT CAST(SUM( (((o_custkey>>g.i)&1) << (2*g.i))
                             + (((o_orderkey>>g.i)&1) << (2*g.i+1)) ) AS BIGINT)
              FROM (SELECT unnest(range(0,21)) AS i) g) AS zval
      FROM orders)
    SELECT zval >> 16 AS zbucket, CAST(count(*) AS BIGINT) AS n,
           min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
           min(o_orderkey) AS min_ord, max(o_orderkey) AS max_ord
    FROM z GROUP BY zbucket
    """,
    doc="Z-order (Morton) bit-interleave of (o_custkey, o_orderkey) + per-zbucket min/max key ranges — the multi-dim clustering layout that makes file-stat pruning work on both columns",
)
def x_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Query-surface twin of the write path in chyme_spark/layout.py
    (`compact --zorder c1,c2` does the actual repartitionByRange + sort
    rewrite, with a per-file min/max pruning test in test_cli.py): the
    per-zbucket min/max columns returned here are exactly the
    file-footer statistics a reader's predicate pushdown would prune
    on. The interleave itself is an
    unrolled 21-bit-per-dimension shift/mask/add expression (covers keys
    to 2M; widen the range for larger key domains — the sf0.01 oracle
    output is bit-identical from 16 bits up because high bits are zero) — whole-stage-codegen
    integer ops, one groupBy(zbucket) shuffle whose cardinality is
    bounded by the key-space, not the row count.
    """
    orders = load_table(spark, sf, "orders")
    # unrolled at plan-build time: 21 shift/mask/add terms per key fold
    # into one
    # whole-stage-codegen integer expression (shiftleft takes a literal
    # bit count, so the loop lives in Python, not in a higher-order fn)
    zval = F.lit(0).cast("long")
    for i in range(21):
        zval = (
            zval
            + F.shiftleft(F.shiftright(F.col("o_custkey"), i).bitwiseAND(F.lit(1)), 2 * i).cast("long")
            + F.shiftleft(F.shiftright(F.col("o_orderkey"), i).bitwiseAND(F.lit(1)), 2 * i + 1).cast("long")
        )
    return (
        orders.select("o_orderkey", "o_custkey", zval.alias("zval"))
        .groupBy(F.shiftright("zval", 16).cast("long").alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("o_orderkey").alias("min_ord"),
            F.max("o_orderkey").alias("max_ord"),
        )
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics: PageRank over the nation trade graph
# ---------------------------------------------------------------------------

# Fixed-iteration PageRank in EXACT integer arithmetic so a DuckDB
# oracle can replay it bit-for-bit: ranks are parts-per-trillion
# BIGINTs, every quotient is integer floor division (positive operands:
# Spark `div` == DuckDB `//`, the repo's TWAP discipline), so no
# engine's float rounding can drift a rank. The damping update is
#   pr'(v) = tele + (85 * sum_{u->v} (pr(u) div outdeg(u))) div 100,
#   tele   = ((SCALE div N) * 15) div 100
# (no dangling-mass redistribution: every node of this graph has
# out-edges; sink mass simply decays, identically in both engines).
_PR_SCALE = 1_000_000_000_000
_PR_ITERS = 4
_PR_EDGE_SQL = """
    ew AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_pairs FROM ew),
    eg AS (
        -- sparsify scale-invariantly: keep edges above 1.1x the mean
        -- pair weight, compared by exact integer cross-multiplication
        -- (w >= 1.1 * total / n_pairs  <=>  10 * w * n_pairs >= 11 * total)
        SELECT src, dst, w FROM ew
        WHERE 10 * w * (SELECT n_pairs FROM tot) >= 11 * (SELECT total FROM tot)),
    nodes AS (SELECT src AS node FROM eg UNION SELECT dst FROM eg),
    deg AS (SELECT src, count(*) AS outdeg FROM eg GROUP BY src),
    tele AS (SELECT (1000000000000 // count(*)) AS rinit,
                    ((1000000000000 // count(*)) * 15) // 100 AS t
             FROM nodes),
    r0 AS (SELECT node, CAST((SELECT rinit FROM tele) AS BIGINT) AS pr
           FROM nodes)"""


def _pr_iter_sql(k: int) -> str:
    p = k - 1
    return f"""
    c{k} AS (SELECT e.dst AS node,
                    CAST(SUM(r.pr // d.outdeg) AS BIGINT) AS contrib
             FROM eg e JOIN r{p} r ON r.node = e.src
                       JOIN deg d ON d.src = e.src
             GROUP BY e.dst),
    r{k} AS (SELECT n.node,
                    CAST((SELECT t FROM tele)
                         + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS pr
             FROM nodes n LEFT JOIN c{k} c ON c.node = n.node)"""


def _trade_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The sparsified nation trade graph shared by x_pagerank and
    x_triangle_count (mirrors the oracle's ``_PR_EDGE_SQL``): directed
    cust-nation -> supp-nation edges kept when the pair's lineitem
    count clears 1.1x the mean pair weight — an exact integer
    cross-multiplication over a 1-row broadcast scalar (the Q22/llm.py
    crossJoin pattern — never an empty window), so the sparsifier is
    scale-invariant across SFs and engine-exact."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    ew = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    tot = ew.agg(
        F.sum("w").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    return (
        ew.crossJoin(F.broadcast(tot))
        .filter(F.lit(10) * F.col("w") * F.col("n_pairs") >= F.lit(11) * F.col("total"))
        .select("src", "dst")
    )


@query(
    "x_pagerank",
    oracle=(
        "WITH "
        + _PR_EDGE_SQL
        + ","
        + ",".join(_pr_iter_sql(k) for k in range(1, _PR_ITERS + 1))
        + f"""
    SELECT node AS nationkey, pr AS rank_ppt FROM r{_PR_ITERS}
    """
    ),
    doc="fixed-iteration PageRank over the nation trade graph (cust-nation -> supp-nation edges with >=110 lineitems), exact ppt-integer damping update — oracle replays the same 4 unrolled iterations as chained CTEs",
)
def x_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed PageRank, the iterative-join shape.

    100 TB design: each iteration is ONE shuffle — edges join ranks on
    the src key (at web scale: pre-partition both on src so the join is
    co-located and only the per-iteration agg shuffles on dst), then a
    dst-keyed partial+final sum; the rank vector never leaves the
    cluster. The only driver scalar is the node count (one number, like
    the BPE trainer's argmax). Lineage is truncated with a
    localCheckpoint every few rounds — same discipline as the
    connected-components loop (x_dedup_clusters). Ranks are exact
    BIGINT ppt (see module comment) so the DuckDB oracle hash-matches
    the full 4-iteration trajectory, not just row counts.
    """
    edges = _trade_edges(spark, sf).persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # r15 (OPTIMIZATION round, guide §2.4): deg is STATIC across the
    # rank iterations but was re-aggregated from edges inside every
    # round's contrib join — persist it once (per-node rows, the same
    # bounded table the ranks vector is; at 100 TB recomputing a
    # corpus-wide groupBy 4x is 3 wasted shuffles)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    n = nodes.count()  # bounded driver scalar: one long
    rinit = _PR_SCALE // n
    tele = (rinit * 15) // 100
    ranks = nodes.select("node", F.lit(rinit).cast("long").alias("pr"))
    for it in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.expr("CAST(SUM(pr div outdeg) AS BIGINT)").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(tele).cast("long")
                    + F.expr("(85 * COALESCE(contrib, 0L)) div 100")
                ).cast("long").alias("pr"),
            )
        )
        if it % 2 == 1:
            ranks = ranks.localCheckpoint(eager=True)
    # final ranks are checkpointed (4 iterations, even cadence), so the
    # loop inputs can be released eagerly
    edges.unpersist()
    deg.unpersist()
    nodes.unpersist()
    return ranks.select(F.col("node").alias("nationkey"), F.col("pr").alias("rank_ppt"))


@query(
    "x_scd2_intervals",
    # Gaps-and-islands run collapse -> SCD2 validity intervals: the
    # type-2 dimension-history build every warehouse ledger needs
    # (merge.py's SCD2 writer is the write-path twin; this is the
    # query-surface derivation from a raw event log).
    oracle=f"""
    WITH s AS (
        SELECT user_id, event_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
    f AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN prev_type IS NULL OR prev_type <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM s),
    r AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        FROM f),
    g AS (
        SELECT user_id, run_id, min(event_type) AS event_type,
               min(ts) AS from_ts, count(*) AS n_events
        FROM r GROUP BY user_id, run_id)
    SELECT user_id, run_id, event_type,
           {sql_ts_str('from_ts')} AS valid_from,
           COALESCE({sql_ts_str("LEAD(from_ts) OVER (PARTITION BY user_id ORDER BY run_id)")},
                    'current') AS valid_to,
           n_events
    FROM g
    """,
    doc="SCD2 history from an event log: collapse consecutive same-type runs per user (gaps-and-islands) into validity intervals [valid_from, valid_to); open intervals marked 'current'",
)
def x_scd2_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """One shuffle on the user key serves every window here (lag ->
    run-id cumsum -> run collapse -> lead): Spark keeps the
    user_id-partitioned exchange for all four steps, so at 100 TB the
    event log moves once. The run collapse shrinks output to
    #type-changes per user, not #events."""
    ev = load_table(spark, sf, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        F.when(
            F.lag("event_type").over(wo).isNull()
            | (F.lag("event_type").over(wo) != F.col("event_type")),
            1,
        ).otherwise(0)
    )
    runs = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(chg).over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("run_id"),
    )
    g = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("from_ts"),
        F.count("*").alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    return g.select(
        "user_id",
        "run_id",
        "event_type",
        ts_str("from_ts").alias("valid_from"),
        F.coalesce(ts_str(F.lead("from_ts").over(wr)), F.lit("current")).alias(
            "valid_to"
        ),
        "n_events",
    )


@query(
    "x_rolling_median",
    # Moving median over a trailing 7-row frame: order statistics as a
    # window aggregate (robust smoothing for quality/latency signals —
    # the mean-based running agg d24 cannot resist outliers).
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(CAST(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DECIMAL(18,6)), 2)
             AS DOUBLE) AS med7
    FROM events
    """,
    doc="rolling median of value over a trailing 7-row frame per user (exact order statistic in a window; interpolated midpoint on even frames)",
)
def x_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact rolling median: Spark evaluates `percentile(value, 0.5)`
    over the ROWS frame — per-frame O(frame log frame) inside the
    user_id partition, one shuffle total. Both engines define median of
    an even frame as the midpoint of the two central values, an exact
    IEEE op on doubles; the DECIMAL(18,6)-pinned ROUND keeps the hash
    engine-stable (same discipline as x_percentiles)."""
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.expr("percentile(value, 0.5)").over(w).cast("decimal(18,6)"), 2
        )
        .cast("double")
        .alias("med7"),
    )


@query(
    "x_compaction_plan",
    # Small-file compaction planner: greedy sequential bin-packing of
    # files (here: documents as stand-in file listings, n_chars as
    # bytes) into ~4000-byte target buckets via an exclusive running
    # sum — bucket = floor(bytes-before-this-file / target). The oracle
    # states it as one global running sum; the Spark side computes the
    # SAME prefix sum scalably (see docstring).
    oracle="""
    WITH c AS (
        SELECT doc_id, n_chars AS bytes,
               CAST(SUM(n_chars) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM documents)
    SELECT CAST((cum - bytes) // 4000 AS BIGINT) AS bucket,
           count(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY bucket
    """,
    doc="compaction planner: assign files to ~target-size output buckets by exclusive prefix sum of sizes (small-files problem); per-bucket file count, byte total, id range",
)
def x_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """The global ordered prefix sum WITHOUT a single-partition window
    (the empty-window scalar is this repo's named scale-killer): the
    classic two-level distributed scan. Files are range-grouped by
    doc_id div 256 (order-preserving); each group computes its local
    running sum under partitionBy(grp) — a parallel window — and the
    per-group byte totals (one row per group, bounded by the key space
    div 256, NOT by row count) get a tiny exclusive cumsum that is
    broadcast back as each group's offset. cum = offset + local_cum
    equals the oracle's one global window exactly."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").alias("bytes"), (F.col("doc_id") / 256).cast("long").alias("grp")
    )
    wl = Window.partitionBy("grp").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = docs.withColumn("lcum", F.sum("bytes").over(wl))
    gtot = docs.groupBy("grp").agg(F.sum("bytes").alias("gbytes"))
    wg = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = gtot.select(
        "grp", F.coalesce(F.sum("gbytes").over(wg), F.lit(0)).alias("offset")
    )
    cum = local.join(F.broadcast(offsets), "grp").select(
        "doc_id",
        "bytes",
        (F.col("offset") + F.col("lcum")).cast("long").alias("cum"),
    )
    return (
        cum.groupBy(
            F.expr("(cum - bytes) div 4000").cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "x_triangle_count",
    # Triangle counting over the undirected-ized trade graph: the
    # canonical "enumerate ordered wedges, close them" distributed
    # algorithm — every triangle is materialized exactly once as
    # (a < b < c), then credited back to each of its three corners.
    oracle=(
        "WITH "
        + _PR_EDGE_SQL
        + """,
    und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM eg),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
    SELECT node AS nationkey, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    """
    ),
    doc="per-node triangle counts over the undirected nation trade graph: ordered wedge enumeration (a<b<c) closed by a third join — each triangle counted once, credited to all three corners",
)
def x_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle counting, the join-topology benchmark for graph-shaped
    data: two self-joins of the ordered edge list. Ordering every edge
    as (min, max) makes each triangle appear exactly once — the
    standard trick that cuts candidate wedges ~6x and bounds the
    worst-case join fan-out by the max degree.

    100 TB shape: both joins are equi-joins on a node key (shuffle or,
    here, AQE-broadcast since the sparsified graph is dim-sized); the
    wedge intermediate is the only super-linear term (sum of deg^2) and
    at real scale is tamed by the degree-ordering variant (orient edges
    low-degree -> high-degree) plus AQE skew splitting — the ordered
    enumeration here IS that algorithm for this graph's scale."""
    und = (
        _trade_edges(spark, sf)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        # until-dropped; dim-sized (<= |nation|^2 undirected pairs),
        # consumed by all three wedge-join sides
        .persist()
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    # r15 (guide §2.4): the former three-branch union re-executed the
    # wedge joins — the op's only super-linear term — once per corner
    # column. One explode credits all three corners in a single
    # evaluation of tri; same multiset of (node) rows, hash-identical.
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return corners.groupBy(F.col("node").alias("nationkey")).agg(
        F.count("*").cast("long").alias("n_triangles")
    ).select(F.col("nationkey"), "n_triangles")


@query(
    "x_hll_sketch_union",
    # Mergeable-sketch rollup: build one HLL sketch of distinct users
    # per (event_type, day), then UNION the daily sketches into a
    # per-type estimate — the sketch-table pattern every warehouse uses
    # so "distinct users over any date range" never re-scans the fact
    # (Apache DataSketches HLL; partial aggregation is what d16's
    # one-shot approx_count_distinct cannot give you). HLL estimates
    # are set-determined (register = max over hashes, insertion-order
    # free), so the accuracy bracket below is a stable hash-checkable
    # bool, not a flaky tolerance: lgK=14 keeps relative standard error
    # ~0.8%, asserted here at 5% with pure integer compare (|est-n|*20
    # <= n). The oracle computes the exact side; a sketch regression
    # flips the bool and fails the hash.
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="mergeable HLL sketch rollup: per-day user sketches unioned to per-event-type distinct estimates, 5-percent accuracy bracket hash-pinned vs exact",
)
def x_hll_sketch_union(spark: SparkSession, sf: str) -> DataFrame:
    """The 100 TB point is the MERGE: daily partial sketches are
    aggregate-sized (one 16 KB sketch per (type, day)), computed once
    per partition-day with map-side partials, and any rollup window is
    then a union over sketches — no second scan of the fact, no exact
    count-distinct shuffle of user ids. The exact branch here exists
    only to pin the accuracy contract at test scale; production reads
    the sketch table alone."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return rolled.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "n_exact",
        (F.abs(F.col("est") - F.col("n_exact")) * 20 <= F.col("n_exact")).alias(
            "est_within_5pct"
        ),
    )


# ---------------------------------------------------------------------------
# round-6 continuation II: skyline / markov / sketch-intersect / anomaly
# ---------------------------------------------------------------------------


@query(
    "x_skyline",
    # Pareto frontier (skyline) over part: minimize p_retailprice,
    # maximize p_size. A part survives iff nothing is at-most-as-
    # expensive AND at-least-as-large with one strict. The oracle is
    # the textbook NOT EXISTS self-theta-join — O(n^2) and fine only at
    # test scale; the Spark side is the O(n log n) sorted-sweep
    # identity: survivor <=> its price-group's max size strictly
    # exceeds the running max size over all strictly-cheaper prices.
    oracle="""
    SELECT p.p_partkey, p.p_name, p.p_retailprice,
           CAST(p.p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
    doc="Pareto skyline (min price, max size) via two-level prefix max over price buckets — no quadratic pair join, no single-partition window",
)
def x_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """2-D skyline without the O(n^2) dominance join AND without a
    global single-partition sort window.

    Sweep identity (strict dominance): with pmax(p) = max size at
    price p and M(<p) = max size over all strictly cheaper prices, a
    part survives iff  size == pmax(p)  and  pmax(p) > M(<p).
    Same-price ties all survive together (no strict dominator among
    equals), which matches the NOT EXISTS oracle exactly.

    Scale shape: the sweep runs on the DISTINCT-PRICE table (domain-
    sized, not fact-sized), and even that never sees a SinglePartition
    exchange — M(<p) is assembled with the same two-level prefix trick
    as x_stratified_split / x_compaction_plan: running max within a
    price range-bucket (floor(price/100), ordering-aligned prefix of
    the sort key) plus an exclusive running max over the bucket maxima
    (bucket-count-sized). The final survivor test is a broadcast-sized
    join back to the fact: one fact shuffle (price groupBy) total."""
    part = load_table(spark, sf, "part")
    byprice = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("pmax")
    ).withColumn("bkt", F.floor(F.col("p_retailprice") / 100).cast("long"))
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = byprice.withColumn("run_in", F.max("pmax").over(w_in))
    bmax = byprice.groupBy("bkt").agg(F.max("pmax").alias("bmax"))
    # exclusive running max over bucket maxima WITHOUT a global-ordered
    # window (no SinglePartition exchange anywhere, even aggregate-
    # sized): the bucket table is bounded by the price domain / 100
    # (~hundreds of rows at any SF — the domain, unlike the row count,
    # does not grow 100x), so the strictly-less theta self-join is a
    # trivially small broadcast-nested-loop
    b2 = bmax.select(F.col("bkt").alias("bkt2"), F.col("bmax").alias("bmax2"))
    boff = (
        bmax.join(F.broadcast(b2), F.col("bkt2") < F.col("bkt"), "left")
        .groupBy("bkt")
        .agg(F.max("bmax2").alias("run_b"))
    )
    sky_prices = (
        within.join(F.broadcast(boff), "bkt")
        .withColumn("run", F.greatest(F.coalesce("run_in", F.lit(-1)),
                                      F.coalesce("run_b", F.lit(-1))))
        .filter(F.col("pmax") > F.col("run"))
        .select("p_retailprice", "pmax")
    )
    return (
        part.join(F.broadcast(sky_prices), "p_retailprice")
        .filter(F.col("p_size") == F.col("pmax"))
        .select(
            "p_partkey", "p_name", "p_retailprice",
            F.col("p_size").cast("long").alias("p_size"),
        )
    )


@query(
    "x_markov_transitions",
    # First-order Markov transition matrix over per-user event
    # sequences: P(next=to | cur=from) as exact integer ppm. The lag
    # window shuffles on user_id (scale-safe, millions of small
    # partitions); the probability normalizer is a window over the
    # 25-row (type x type) aggregate, hash-partitioned on from_type —
    # never SinglePartition, never fact-sized.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev
      FROM events),
    pairs AS (
      SELECT prev AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type)
    SELECT from_type, to_type, n,
           CAST((n * 1000000) // (sum(n) OVER (PARTITION BY from_type))
                AS BIGINT) AS p_ppm
    FROM pairs
    """,
    doc="per-user event-sequence Markov transition counts + exact integer-ppm row-normalized probabilities",
)
def x_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """One fact shuffle (user_id window) + one (from,to) groupBy; the
    row-normalization runs on the type-domain aggregate (|types|^2
    rows). Probability is pinned cross-engine as (n * 1e6) div total —
    integer floor division of non-negative ints, the TWAP trick."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"),
                 F.col("event_type").alias("to_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return pairs.select(
        "from_type", "to_type", "n",
        F.expr("(n * 1000000L) div sum(n) over (partition by from_type)")
        .cast("long")
        .alias("p_ppm"),
    )


@query(
    "x_hll_intersect",
    # Sketch-based audience overlap: |users(A) AND users(purchase)|
    # estimated by inclusion-exclusion over mergeable HLL sketches —
    # est(A) + est(B) - est(union sketch). The standard warehouse
    # answer to "overlap of any two segments" without re-scanning the
    # fact per pair: per-segment sketches are built ONCE, every pairwise
    # overlap is then sketch algebra. I-E error scales with the UNION
    # size (not the intersection), so the pinned bracket is
    # |est - exact| <= 5% of |A UNION B| — at lgK=14 (RSE 0.8%) the
    # three-sketch error sum stays well inside it; set-determined
    # registers make the bool deterministic, a sketch regression flips
    # it and fails the hash.
    oracle="""
    WITH ab AS (
      SELECT a.event_type,
             CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_overlap
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') b
        ON a.user_id = b.user_id
      WHERE a.event_type <> 'purchase'
      GROUP BY a.event_type),
    un AS (
      SELECT a.event_type,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_union
      FROM (SELECT DISTINCT event_type FROM events
            WHERE event_type <> 'purchase') a
      JOIN events e
        ON e.event_type = a.event_type OR e.event_type = 'purchase'
      GROUP BY a.event_type)
    SELECT ab.event_type, ab.n_overlap, un.n_union,
           TRUE AS est_within_5pct_of_union
    FROM ab JOIN un USING (event_type)
    """,
    doc="HLL inclusion-exclusion segment-overlap estimate vs exact intersection, union-relative 5-percent bracket hash-pinned",
)
def x_hll_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """The fact is scanned once to build per-type sketches (5 x 16 KB)
    and once for the exact check branch (test-scale only; production
    keeps the sketch table alone). Every pairwise overlap after that is
    driver-trivial sketch algebra — the point of mergeable sketches.
    The union sketch of (A, purchase) is hll_union of the two
    per-type sketches, NOT a re-aggregation of the fact."""
    ev = load_table(spark, sf, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    psk = sk.filter(F.col("event_type") == "purchase").select(
        F.col("sk").alias("psk")
    )
    est = (
        sk.filter(F.col("event_type") != "purchase")
        .crossJoin(F.broadcast(psk))
        .select(
            "event_type",
            (
                F.hll_sketch_estimate("sk")
                + F.hll_sketch_estimate("psk")
                - F.hll_sketch_estimate(F.hll_union("sk", "psk"))
            ).alias("est_overlap"),
        )
    )
    du = ev.select("event_type", "user_id").distinct()
    pu = du.filter(F.col("event_type") == "purchase").select("user_id")
    # exact side: per-type distinct count + overlap; n_union follows by
    # the same inclusion-exclusion arithmetic the sketch branch uses
    # (|A u P| = |A| + |P| - |A n P|) — no OR-theta join re-scanning
    # the distinct pairs (review finding: that join duplicated
    # already-computed counts and its AQE promotion timing made the
    # plan shape nondeterministic)
    ab = (
        du.filter(F.col("event_type") != "purchase")
        .join(pu.withColumn("in_p", F.lit(1)), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_a"),
            F.sum(F.coalesce("in_p", F.lit(0))).cast("long").alias("n_overlap"),
        )
    )
    n_p = pu.agg(F.count("*").cast("long").alias("n_p"))
    return (
        ab.crossJoin(F.broadcast(n_p))
        .join(est, "event_type")
        .select(
            "event_type",
            "n_overlap",
            (F.col("n_a") + F.col("n_p") - F.col("n_overlap")).alias("n_union"),
            (F.abs(F.col("est_overlap") - F.col("n_overlap")) * 20
             <= F.col("n_a") + F.col("n_p") - F.col("n_overlap"))
            .alias("est_within_5pct_of_union"),
        )
    )


@query(
    "x_anomaly_zscore",
    # Population 2-sigma outlier detection per event_type with EXACT
    # cross-engine arithmetic: |x - mean| > 2*stddev rewritten as the
    # integer inequality (n*x - S)^2 > 4*(n*SS - S^2) over cent-
    # quantized values (multiply both sides by n^2; S = sum, SS = sum
    # of squares). No float mean/variance ever computed, so no half-ulp
    # hash hazard — the products run in DECIMAL(38,0) on the Spark side
    # and HUGEINT in DuckDB, both exact at any plausible SF (bound ~
    # n^2 * max_cents^2 ~ 1e30 at sf100). The cent quantization itself
    # (floor(value*100)) is the same IEEE double multiply+floor in both
    # engines — bit-identical on identical parquet doubles.
    oracle="""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    st AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
      FROM c GROUP BY event_type)
    SELECT c.event_type,
           CAST(st.n AS BIGINT) AS n_events,
           CAST(count(*) FILTER (
             WHERE (st.n * c.cents - st.s) * (st.n * c.cents - st.s)
                   > 4 * (st.n * st.ss - st.s * st.s)) AS BIGINT)
               AS n_outliers,
           CAST((count(*) FILTER (
             WHERE (st.n * c.cents - st.s) * (st.n * c.cents - st.s)
                   > 4 * (st.n * st.ss - st.s * st.s)) * 1000000)
               // count(*) AS BIGINT) AS share_ppm
    FROM c JOIN st USING (event_type)
    GROUP BY c.event_type, st.n
    """,
    doc="2-sigma outlier counts per event_type via the exact integer inequality (n*x-S)^2 > 4(n*SS-S^2) on cent-quantized values",
)
def x_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Two fact passes, both embarrassing: one groupBy builds the
    5-row (n, S, SS) stats table (map-side partials), the flag pass
    probes it by broadcast — no window, no sort, no per-row Python.
    At 100 TB the stats table stays |event_type| rows regardless of
    SF; the decimal products are exact (see oracle comment for the
    overflow bound)."""
    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    st = ev.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    flagged = ev.join(F.broadcast(st), "event_type").withColumn(
        "is_out",
        (
            (F.col("n") * F.col("cents") - F.col("s"))
            * (F.col("n") * F.col("cents") - F.col("s"))
            > F.lit(4) * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        ).cast("long"),
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("is_out").cast("long").alias("n_outliers"),
        F.expr("(sum(is_out) * 1000000L) div count(*)")
        .cast("long")
        .alias("share_ppm"),
    )


@query(
    "x_event_pattern_match",
    # Complex-event-processing (CEP) pattern matching — the
    # MATCH_RECOGNIZE / FlinkCEP class of operator: detect
    # "a view, then a purchase, with only clicks/errors in between"
    # per user by compiling each user's time-ordered event-type
    # sequence to an initial-letter string and counting
    # non-overlapping regex matches of `v[ce]*p`. Leftmost
    # non-overlapping match semantics are identical in Java regex and
    # DuckDB's RE2 for this backreference-free pattern. The sequence
    # string is bounded by per-user activity (thousands of chars),
    # never corpus size.
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                 AS s
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS seq_len,
           CAST(length(regexp_extract_all(s, 'v[ce]*p')) AS BIGINT)
               AS n_matches
    FROM seq
    WHERE length(regexp_extract_all(s, 'v[ce]*p')) > 0
    """,
    doc="CEP pattern matching: per-user ordered event sequence compiled to a string, non-overlapping regex match count of view->purchase funnels",
)
def x_event_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    """One shuffle on user_id; the ordered sequence is built WITHOUT a
    sort exchange — sort_array over structs whose leading fields are
    the sort key (ts, event_id) gives the exact ORDER BY inside a
    hash-aggregate, the same trick x_funnel uses. Regex runs JVM-side
    (whole-stage codegen), one evaluation per user row. At 100 TB the
    per-user string is the only memory term; a pathological single
    user is AQE skew territory, not an algorithm wall."""
    ev = load_table(spark, sf, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "ts", "event_id",
                                F.substring("event_type", 1, 1).alias("c"),
                            )
                        )
                    ),
                    lambda x: x["c"],
                ),
            ).alias("s")
        )
    )
    return (
        seq.select(
            "user_id",
            F.length("s").cast("long").alias("seq_len"),
            F.regexp_count("s", F.lit("v[ce]*p")).cast("long").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


@query(
    "x_last_click_attribution",
    # Marketing attribution: each purchase is credited to the user's
    # most recent PRIOR click (last-touch model), with the click->
    # purchase latency in exact microseconds and a 7-day attribution-
    # window flag. The running "last click so far" is a conditional max
    # over an exclusive frame — the mirror image of x_funnel's
    # conditional minima over the following frame. epoch_us / unix_micros
    # is the repo's pinned cross-engine time arithmetic (d37 pattern).
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts, event_type,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_click
      FROM events)
    SELECT user_id, event_id AS purchase_id,
           CAST(epoch_us(ts) - epoch_us(last_click) AS BIGINT) AS lag_us,
           COALESCE(epoch_us(ts) - epoch_us(last_click)
                    <= CAST(604800000000 AS BIGINT), FALSE) AS attributed_7d
    FROM w WHERE event_type = 'purchase'
    """,
    doc="last-touch attribution: purchase credited to most recent prior click per user, exact microsecond latency + 7-day window flag",
)
def x_last_click_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """One shuffle on user_id carries the whole model; the conditional
    running max stays inside a single window spec (no self-join of
    purchases back to clicks, which would be a second fact shuffle and
    a skew hazard on heavy users)."""
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    lag_us = F.unix_micros(F.col("ts")) - F.unix_micros(last_click)
    return (
        ev.withColumn("lag_us", lag_us.cast("long"))
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "lag_us",
            F.coalesce(
                F.col("lag_us") <= F.lit(7 * 86400 * 1000000).cast("long"),
                F.lit(False),
            ).alias("attributed_7d"),
        )
    )


@query(
    "x_column_profile",
    # Data-profiling sweep: per-column row/null/distinct counts plus
    # typed min/max, the standard table-health report a catalog ingest
    # runs before accepting a drop (ref behavior parity: the catalog
    # validates listings before ingest, internal/catalog; the profile
    # is the columnar analog).
    oracle="""
    SELECT * FROM (
      SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
             count(*) - count(l_quantity) AS n_null,
             count(DISTINCT l_quantity) AS n_distinct,
             ROUND(min(CAST(l_quantity AS DOUBLE)), 4) AS min_num,
             ROUND(max(CAST(l_quantity AS DOUBLE)), 4) AS max_num,
             CAST(NULL AS VARCHAR) AS min_str,
             CAST(NULL AS VARCHAR) AS max_str
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
             count(DISTINCT l_extendedprice),
             ROUND(min(CAST(l_extendedprice AS DOUBLE)), 4),
             ROUND(max(CAST(l_extendedprice AS DOUBLE)), 4),
             NULL, NULL
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
             count(DISTINCT l_returnflag),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             min(l_returnflag), max(l_returnflag)
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
             count(DISTINCT l_linestatus),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             min(l_linestatus), max(l_linestatus)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
             -- distinct over the RENDERED second-granularity string, to
             -- match the profiled representation (the raw column is
             -- timestamp[ms]; two shipdates inside one second must not
             -- diverge the engines — round-6 review)
             count(DISTINCT strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             min(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')),
             max(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'))
      FROM lineitem)
    ORDER BY col_name
    """,
    doc="per-column table profile (rows/nulls/exact distinct/typed min-max) in one unpivoted pass — two-level aggregation so no column's raw values funnel through a single reducer",
)
def x_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the naive shape — groupBy(col_name) straight off the
    unpivot — sends EVERY raw value of a column to one reducer (k
    reducers total): a guaranteed straggler. Instead level 1 groups by
    (col_name, value) with map-side partial aggregation (low-cardinality
    columns collapse ~completely on the map side), and level 2 reduces
    the per-value groups to the profile row, so per-column fan-in is
    bounded by distinct values, not raw rows. Exact distinct counts come
    free as level-2 row counts — no Expand-operator multi-distinct
    blowup. For columns where even the distinct set is fact-scale, swap
    level 2's exact count for the mergeable HLL sketch
    (x_hll_sketch_union pattern); the profile shape is unchanged.
    Min/max stay typed (numeric vs string) because a stringified double
    neither orders nor formats consistently across engines."""
    li = load_table(spark, sf, "lineitem")

    def entry(name: str, num=None, s=None):
        return F.struct(
            F.lit(name).alias("col_name"),
            (num if num is not None else F.lit(None).cast("double")).alias("num_val"),
            (s if s is not None else F.lit(None).cast("string")).alias("str_val"),
        )

    unpivoted = li.select(
        F.explode(
            F.array(
                entry("l_quantity", num=F.col("l_quantity").cast("double")),
                entry("l_extendedprice", num=F.col("l_extendedprice").cast("double")),
                entry("l_returnflag", s=F.col("l_returnflag")),
                entry("l_linestatus", s=F.col("l_linestatus")),
                entry("l_shipdate", s=ts_str("l_shipdate")),
            )
        ).alias("x")
    ).select("x.*")
    per_value = unpivoted.groupBy("col_name", "num_val", "str_val").agg(
        F.count("*").alias("c")
    )
    has_val = F.col("num_val").isNotNull() | F.col("str_val").isNotNull()
    return (
        per_value.groupBy("col_name")
        .agg(
            F.sum("c").alias("n_rows"),
            F.sum(F.when(~has_val, F.col("c")).otherwise(F.lit(0))).alias("n_null"),
            F.count(F.when(has_val, F.lit(1))).alias("n_distinct"),
            F.round(F.min("num_val"), 4).alias("min_num"),
            F.round(F.max("num_val"), 4).alias("max_num"),
            F.min("str_val").alias("min_str"),
            F.max("str_val").alias("max_str"),
        )
        .orderBy("col_name")
    )


@query(
    "x_partial_agg_merge",
    # Mergeable-state rollup: monthly figures derived ONLY from daily
    # partial-aggregate state (sum-of-sums, sum-of-counts, min-of-mins,
    # and avg reconstructed from (sum, count) at the end) — the
    # materialized-view-maintenance algebra. The oracle aggregates the
    # raw facts straight to month, proving merge(partials) == agg(raw).
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
           l_returnflag,
           count(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS min_price,
           CAST(ROUND(MAX(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS max_price,
           -- TWAP discipline: a double quotient ROUND(x, 4) flips at
           -- half-ulp boundaries (sf0.001 hit 50416.73875 exactly);
           -- integer floor division of exact ten-thousandths is pinned
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
             // count(*) / 10000.0 AS avg_price
    FROM lineitem
    GROUP BY month, l_returnflag
    ORDER BY month, l_returnflag
    """,
    doc="partial-aggregate merge: monthly rollup computed purely from daily partial state (sum/count/min/max algebra, avg reconstructed last) — the incremental materialized-view pattern, oracle-proven equal to aggregating raw facts",
)
def x_partial_agg_merge(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the daily partial table is what a production system
    persists (one bounded row per (day, flag)); the monthly merge then
    touches ONLY that state — appending a day re-aggregates one day,
    never the fact history. Every aggregate here is chosen to be
    mergeable: sums/counts add, min/min and max/max compose, and avg is
    NOT averaged-of-averages (wrong under unequal day sizes) but
    reconstructed from merged (decimal sum, count) by exact integer
    floor division in ten-thousandths (the TWAP discipline — a rounded
    double quotient flips at half-ulp boundaries), so the result is
    bit-identical to a raw-fact aggregate. Two shuffles total, the second over day-cardinality
    partials. Non-mergeable aggregates (exact median, exact distinct)
    need sketch state instead — x_hll_sketch_union is that pattern."""
    li = load_table(spark, sf, "lineitem")
    daily = li.groupBy(
        F.date_trunc("day", "l_shipdate").alias("day"), "l_returnflag"
    ).agg(
        F.count("*").alias("p_n"),
        F.sum(dec("l_quantity")).alias("p_sum_qty"),
        F.sum(dec("l_extendedprice")).alias("p_sum_price"),
        F.min(dec("l_extendedprice")).alias("p_min_price"),
        F.max(dec("l_extendedprice")).alias("p_max_price"),
    )
    return (
        daily.groupBy(
            F.date_format("day", "yyyy-MM").alias("month"), "l_returnflag"
        )
        .agg(
            F.sum("p_n").alias("n"),
            money(F.sum("p_sum_qty")).alias("sum_qty"),
            money(F.min("p_min_price")).alias("min_price"),
            money(F.max("p_max_price")).alias("max_price"),
            (
                F.expr("CAST(sum(p_sum_price) * 10000 AS BIGINT) div sum(p_n)")
                / F.lit(10000.0)
            ).alias("avg_price"),
        )
        .orderBy("month", "l_returnflag")
    )


@query(
    "x_cdc_apply",
    # CDC changelog apply: the event stream is a per-user changelog
    # where 'error' is a DELETE (tombstone) and every other event is a
    # partial upsert; the final table is the fold of each user's ops in
    # (ts, event_id) order — state accumulated strictly AFTER the last
    # tombstone, absent users with no post-tombstone activity. The
    # library twin (merge.upsert / scd2_apply, chyme_spark/merge.py)
    # covers keyed full-row merges; this op proves the
    # delete-then-reinsert fold (ref parity: the task ledger's
    # insert-if-absent + re-queue semantics, internal/core/task.go).
    oracle="""
    WITH resets AS (
        SELECT user_id, ts AS rts, event_id AS rid
        FROM events WHERE event_type = 'error'
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
    live AS (
        SELECT e.*
        FROM events e LEFT JOIN resets r USING (user_id)
        WHERE e.event_type <> 'error'
          AND (r.rts IS NULL OR e.ts > r.rts
               OR (e.ts = r.rts AND e.event_id > r.rid)))
    SELECT user_id,
           count(*) AS n_events_live,
           count(*) FILTER (event_type = 'purchase') AS n_purchases,
           CAST(ROUND(COALESCE(SUM(CAST(value AS DECIMAL(18,4)))
                      FILTER (event_type = 'purchase'), 0), 2) AS DOUBLE)
             AS total_spend,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM live
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="CDC changelog apply with tombstones: per-key fold of upsert/delete ops in event order — last-tombstone cutoff then conditional aggregation, two bounded shuffles",
)
def x_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the tombstone cutoff per key is a groupBy over the
    DELETE subset only (filter pushed to the scan — at typical
    tombstone rates this aggregate is tiny), joined back un-hinted so
    AQE broadcasts it at fixture scale and shuffle-joins if deletes are
    fact-scale. The fold itself is ONE conditional aggregation over the
    surviving ops — never a per-key iterative replay, and never a
    window over the full changelog (the cutoff comparison is a plain
    boolean on (ts, event_id), so the fact pass stays in whole-stage
    codegen). Spend stays exact DECIMAL to the final round."""
    ev = load_table(spark, sf, "events")
    resets = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id")).alias("r"))
        .select("user_id", F.col("r.ts").alias("rts"), F.col("r.event_id").alias("rid"))
    )
    after_reset = (
        F.col("rts").isNull()
        | (F.col("ts") > F.col("rts"))
        | ((F.col("ts") == F.col("rts")) & (F.col("event_id") > F.col("rid")))
    )
    is_purchase = F.col("event_type") == "purchase"
    return (
        ev.filter(F.col("event_type") != "error")
        .join(resets, "user_id", "left")
        .filter(after_reset)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events_live"),
            F.count(F.when(is_purchase, F.lit(1))).alias("n_purchases"),
            money(
                F.coalesce(
                    F.sum(F.when(is_purchase, dec("value"))), F.lit(0).cast("decimal(18,4)")
                )
            ).alias("total_spend"),
            ts_str(F.max("ts")).alias("last_ts"),
        )
        .orderBy("user_id")
    )


@query(
    "x_interpolate",
    # Linear interpolation to a regular grid — x_gap_fill's sibling for
    # VALUE series: missing hourly buckets take the line between the
    # nearest observed samples either side (forward/backward fill at
    # the edges). A double-arithmetic interpolation rounds differently
    # per engine at half-ulp boundaries (the first cut of this op
    # failed the hash at 42.87875 exactly); instead the whole path is
    # the x_time_weighted_avg integer discipline: samples become exact
    # ten-thousandth units (sum has decimal scale 4, so *10^4 is an
    # exact BIGINT), and the interpolant is the BARYCENTRIC form
    # (pv*(nt-t) + nv*(t-pt)) // (nt-pt) — every term non-negative
    # (values >= 0, pt <= t <= nt), so Spark's truncating `div` and
    # duckdb's flooring `//` agree, and the final /10000.0 is one
    # identical IEEE op.
    oracle="""
    WITH b AS (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
               CAST(value AS DECIMAL(18,4)) AS dv
        FROM events WHERE user_id < 20),
    r AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM b GROUP BY user_id),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
        FROM r),
    c AS (SELECT user_id, h,
                 CAST(SUM(dv) * 10000 AS BIGINT) // count(*) AS vi_obs
          FROM b GROUP BY user_id, h),
    j AS (
        SELECT g.user_id, g.h, c.vi_obs,
               CAST(epoch(g.h) AS BIGINT) AS t
        FROM grid g LEFT JOIN c ON g.user_id = c.user_id AND g.h = c.h),
    w AS (
        SELECT user_id, h, vi_obs, t,
               last_value(vi_obs IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN vi_obs IS NOT NULL THEN t END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(vi_obs IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN vi_obs IS NOT NULL THEN t END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j)
    SELECT user_id,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           vi_obs IS NOT NULL AS is_observed,
           CAST(CASE
             WHEN vi_obs IS NOT NULL THEN vi_obs
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             WHEN nt = pt THEN pv
             ELSE (pv * (nt - t) + nv * (t - pt)) // (nt - pt)
           END AS BIGINT) / 10000.0 AS v
    FROM w
    ORDER BY user_id, hour
    """,
    doc="linear interpolation onto the hourly grid: nearest observed samples either side via IGNORE-NULLS window fills, edge buckets forward/backward-filled, interpolant pinned by exact integer barycentric arithmetic — x_gap_fill for value series",
)
def x_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: same skeleton as x_gap_fill (per-key range agg ->
    narrow sequence explode -> key-aligned fill join), plus ONE window
    shuffle on the entity key: all four IGNORE-NULLS fills share a
    single (partition, order) spec, so they evaluate in one WindowExec
    pass, and per-entity grid length bounds the frame — never a global
    window. The interpolant itself is a row-local integer expression in
    whole-stage codegen (see the oracle comment for why integers, not
    doubles). user_id < 20 only bounds the oracle diff."""
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    b = ev.select(
        "user_id", F.date_trunc("hour", "ts").alias("h"), dec("value").alias("dv")
    )
    rng = b.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = rng.select(
        "user_id", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    obs = (
        b.groupBy("user_id", "h")
        .agg(F.sum("dv").alias("sdv"), F.count("*").alias("cnt"))
        .select(
            "user_id", "h", F.expr("CAST(sdv * 10000 AS BIGINT) div cnt").alias("vi_obs")
        )
    )
    j = grid.join(obs, ["user_id", "h"], "left").withColumn(
        "t", F.unix_timestamp("h").cast("long")
    )
    wp = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        0, Window.unboundedFollowing
    )
    t_obs = F.when(F.col("vi_obs").isNotNull(), F.col("t"))
    w = (
        j.withColumn("pv", F.last("vi_obs", ignorenulls=True).over(wp))
        .withColumn("pt", F.last(t_obs, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("vi_obs", ignorenulls=True).over(wn))
        .withColumn("nt", F.first(t_obs, ignorenulls=True).over(wn))
    )
    interp_i = (
        F.when(F.col("vi_obs").isNotNull(), F.col("vi_obs"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(F.expr("(pv * (nt - t) + nv * (t - pt)) div (nt - pt)"))
    )
    return w.select(
        "user_id",
        ts_str("h").alias("hour"),
        F.col("vi_obs").isNotNull().alias("is_observed"),
        (interp_i.cast("bigint") / F.lit(10000.0)).alias("v"),
    ).orderBy("user_id", "hour")


@query(
    "x_mad_outliers",
    # Robust outlier detection: per group, the EXACT lower median and
    # median-absolute-deviation, then the count of values beyond
    # 3 * MAD — the robust sibling of x_anomaly_zscore (mean/stddev
    # break under the very outliers they hunt; median/MAD do not).
    # Values are 2-decimal doubles, so cents (decimal*100 -> BIGINT)
    # are exact integers and every comparison below is integer-exact.
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
        FROM events),
    h1 AS (SELECT event_type, cents, count(*) AS c FROM v
           GROUP BY event_type, cents),
    m1 AS (
        SELECT event_type, min(cents) AS med_cents
        FROM (SELECT event_type, cents,
                     SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
                     SUM(c) OVER (PARTITION BY event_type) AS n
              FROM h1)
        WHERE cum >= (n + 1) // 2
        GROUP BY event_type),
    d AS (
        SELECT v.event_type, abs(v.cents - m1.med_cents) AS dev
        FROM v JOIN m1 USING (event_type)),
    h2 AS (SELECT event_type, dev, count(*) AS c FROM d
           GROUP BY event_type, dev),
    m2 AS (
        SELECT event_type, min(dev) AS mad_cents
        FROM (SELECT event_type, dev,
                     SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
                     SUM(c) OVER (PARTITION BY event_type) AS n
              FROM h2)
        WHERE cum >= (n + 1) // 2
        GROUP BY event_type)
    SELECT h2.event_type,
           CAST(SUM(h2.c) AS BIGINT) AS n,
           CAST(m1.med_cents AS BIGINT) / 100.0 AS median_value,
           CAST(m2.mad_cents AS BIGINT) / 100.0 AS mad,
           CAST(SUM(CASE WHEN h2.dev > 3 * m2.mad_cents THEN h2.c ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM h2 JOIN m1 USING (event_type) JOIN m2 USING (event_type)
    GROUP BY h2.event_type, m1.med_cents, m2.mad_cents
    ORDER BY h2.event_type
    """,
    doc="exact median + MAD outlier counts per group via domain-bounded cent histograms — two fact shuffles total, order statistics and outlier counts both read from the histogram, never a per-group sort",
)
def x_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: a naive exact grouped median sorts each group's raw
    values through one reducer. Here each fact pass reduces straight to
    a (group, cents) HISTOGRAM — bounded by the value DOMAIN (~56k
    cents), not the row count — and the median is read off the
    histogram's cumulative window, which runs over histogram rows only.
    Pass 2 re-keys the fact by deviation cents (the only second fact
    touch; the median table is a 5-row broadcast) and the outlier count
    comes from the DEVIATION histogram, so no third pass exists. All
    arithmetic is integer cents end-to-end; the output /100.0 is the
    single shared IEEE op. Same two-level shape as d19_sort's rank —
    order statistics at scale are histogram reads, not sorts."""
    ev = load_table(spark, sf, "events")
    v = ev.select(
        "event_type", (dec("value") * 100).cast("bigint").alias("cents")
    )

    def lower_median(hist: DataFrame, key: str) -> DataFrame:
        wc = Window.partitionBy("event_type").orderBy(key)
        wn = Window.partitionBy("event_type")
        ranked = hist.select(
            "event_type",
            F.col(key),
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(wn).alias("n"),
        )
        return (
            ranked.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("event_type")
            .agg(F.min(key).alias(f"med_{key}"))
        )

    h1 = v.groupBy("event_type", "cents").agg(F.count("*").alias("c"))
    m1 = lower_median(h1, "cents")
    d = v.join(F.broadcast(m1), "event_type").select(
        "event_type", F.abs(F.col("cents") - F.col("med_cents")).alias("dev")
    )
    h2 = d.groupBy("event_type", "dev").agg(F.count("*").alias("c"))
    m2 = lower_median(h2, "dev").withColumnRenamed("med_dev", "mad_cents")
    return (
        h2.join(F.broadcast(m1), "event_type")
        .join(F.broadcast(m2), "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad_cents"), F.col("c")).otherwise(
                    F.lit(0)
                )
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            (F.col("med_cents").cast("bigint") / F.lit(100.0)).alias("median_value"),
            (F.col("mad_cents").cast("bigint") / F.lit(100.0)).alias("mad"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


@query(
    "x_longest_streak",
    # Gaps-and-islands: longest run of CONSECUTIVE active days per user
    # (the canonical engagement-streak query). Island identity is the
    # date-minus-rank trick: within a user's distinct ordered days,
    # consecutive days share (day - row_number), so islands fall out of
    # one window plus one aggregate — no self-join, no recursion.
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events),
    isl AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
        FROM days),
    runs AS (
        SELECT user_id, grp, count(*) AS len,
               min(d) AS d0, max(d) AS d1
        FROM isl GROUP BY user_id, grp),
    tot AS (SELECT user_id, count(*) AS n_active_days FROM days GROUP BY user_id)
    SELECT r.user_id, t.n_active_days,
           r.len AS longest_streak,
           strftime(r.d0, '%Y-%m-%d') AS streak_start,
           strftime(r.d1, '%Y-%m-%d') AS streak_end
    FROM runs r JOIN tot t USING (user_id)
    QUALIFY row_number() OVER (
        PARTITION BY r.user_id ORDER BY r.len DESC, r.d0) = 1
    ORDER BY r.user_id
    """,
    doc="gaps-and-islands longest consecutive-day streak per user: date-minus-rank island ids, one window + one aggregate, earliest streak wins ties",
)
def x_longest_streak(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the fact collapses to DISTINCT (user, day) first —
    the only fact-sized shuffle, bounded thereafter by users x days.
    The island window and run aggregate both key on user (AQE coalesces
    the tiny exchanges), and the per-user winner is a rank-1 filter,
    not a join back. The date-minus-rank island id is pure row-local
    arithmetic inside the window projection — no lag-compare chains, no
    per-user iteration."""
    ev = load_table(spark, sf, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    isl = days.withColumn(
        "grp", F.expr("date_sub(d, CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT))")
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    tot = days.groupBy("user_id").agg(F.count("*").alias("n_active_days"))
    wbest = Window.partitionBy("user_id").orderBy(F.desc("len"), "d0")
    return (
        runs.join(tot, "user_id")
        .withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_active_days",
            F.col("len").alias("longest_streak"),
            F.date_format("d0", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("d1", "yyyy-MM-dd").alias("streak_end"),
        )
        .orderBy("user_id")
    )


@query(
    "x_session_paths",
    # Clickstream path analysis: sessionize (30-minute inactivity gap),
    # render each session's ordered event-type sequence as a path
    # string, and rank the most common paths — the product-analytics
    # query behind "what do users actually do in a visit".
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS sess
        FROM g),
    p AS (
        SELECT user_id, sess,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM s GROUP BY user_id, sess)
    SELECT path, count(*) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    doc="sessionized path analysis: 30-min-gap sessions, ordered event-type path strings, top-20 most common journeys — one user-key window, order pinned by (ts, event_id), collect_list made deterministic via array_sort",
)
def x_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: ONE window shuffle on the user key computes both the
    lag gap and the running session counter; the path build is a hash
    aggregate whose collect_list is wrapped in array_sort(struct(ts,
    event_id, type)) — aggregation buffers assemble in partition-
    arrival order, so the sort inside the agg (not a sorted window with
    a dedup pass) is what makes the path deterministic. Path strings
    stay bounded by session length. Top-20 compiles to
    TakeOrderedAndProject — no global sort of the path table."""
    ev = load_table(spark, sf, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in MICROSECONDS: ts carries sub-second components, and a
    # second-truncated cast("long") gap disagrees with the oracle's
    # exact INTERVAL comparison when a boundary gap has a fractional
    # part (round-6 review: one sf0.01 gap already sits in the
    # (1799 s, 1802 s) band)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(wu)
    s = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("sess", F.sum("new_sess").over(wu))
    paths = s.groupBy("user_id", "sess").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@query(
    "x_market_basket",
    # Market-basket co-occurrence: brand pairs appearing in the same
    # order, with support (order count) — the classic association-rule
    # precursor. Pairs are canonical (a < b) so each basket pair counts
    # once regardless of line order.
    oracle="""
    WITH b AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    pairs AS (
        SELECT a.p_brand AS brand_a, b2.p_brand AS brand_b
        FROM b a JOIN b b2
          ON a.l_orderkey = b2.l_orderkey AND a.p_brand < b2.p_brand)
    SELECT brand_a, brand_b, count(*) AS support
    FROM pairs GROUP BY brand_a, brand_b
    ORDER BY support DESC, brand_a, brand_b
    LIMIT 25
    """,
    doc="market-basket brand co-occurrence: distinct (order, brand) baskets self-paired canonically within the order key, support counts, top-25 — the association-rule support scan",
)
def x_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the fact first collapses to DISTINCT (order, brand)
    — the only fact-sized shuffle, and the step that bounds the
    self-join: pairing happens per order key with per-basket
    cardinality capped by the brand catalog (~25), so the join emits
    O(orders x basket^2) canonical pairs, never a cross-order product.
    The part dim broadcasts into the scan side. Pair support is one
    hash aggregate; top-25 is TakeOrderedAndProject. AQE's skew split
    covers a pathological mega-order."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.p_brand") < F.col("c.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("c.p_brand").alias("brand_b")
        )
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "brand_a", "brand_b")
        .limit(25)
    )


@query(
    "x_rolling_dau",
    # Rolling 7-day distinct active users per day (the WAU curve) —
    # distinct counts do NOT merge across days, so the rolling window
    # cannot reuse daily distinct counts; the scalable identity is
    # CONTRIBUTION EXPLODE: each distinct (user, day) contributes to
    # exactly the 7 window-end days [day, day+6], turning the sliding
    # distinct into a plain groupBy.
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events),
    cal AS (SELECT DISTINCT d FROM ud),
    win AS (
        SELECT c.d AS win_end, ud.user_id
        FROM cal c JOIN ud
          ON ud.d <= c.d AND ud.d >= c.d - 6)
    SELECT strftime(win_end, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS dau7
    FROM win GROUP BY win_end
    ORDER BY day
    """,
    doc="rolling 7-day distinct active users per day: each distinct (user, day) explodes into its 7 contributing window ends, turning the un-mergeable sliding distinct into one groupBy — never a per-day rescan",
)
def x_rolling_dau(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the fact collapses to DISTINCT (user, day) once
    (bounded by users x days), then a 7-element sequence explode maps
    each row to its window ends — constant amplification, no range
    self-join over the calendar and no 7x fact rescan. The final
    count(DISTINCT user) per window end runs over user-day rows, with
    Spark's two-phase distinct aggregate handling hot days. Window ends
    are restricted to OBSERVED days (semi join with the day set) to
    match the oracle's calendar exactly."""
    ev = load_table(spark, sf, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    cal = ud.select("d").distinct()
    contrib = ud.select(
        "user_id", F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("win_end")
    )
    return (
        contrib.join(cal, contrib.win_end == cal.d, "left_semi")
        .groupBy("win_end")
        .agg(F.count_distinct("user_id").alias("dau7"))
        .select(F.date_format("win_end", "yyyy-MM-dd").alias("day"), "dau7")
        .orderBy("day")
    )


@query(
    "x_table_diff",
    # Snapshot diff: classify every key across two table versions as
    # added / removed / changed / unchanged — the data-reconciliation
    # op behind CDC validation and backfill audits. The two "versions"
    # derive deterministically from the same orders table (key mod
    # filters + a price bump) so both engines diff identical inputs.
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS v FROM orders
        WHERE o_orderkey % 10 <> 0),
    nxt AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS v
        FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT CASE
             WHEN base.k IS NULL THEN 'added'
             WHEN nxt.k IS NULL THEN 'removed'
             WHEN base.v <> nxt.v THEN 'changed'
             ELSE 'unchanged' END AS status,
           count(*) AS n,
           CAST(min(COALESCE(base.k, nxt.k)) AS BIGINT) AS min_key,
           CAST(max(COALESCE(base.k, nxt.k)) AS BIGINT) AS max_key
    FROM base FULL OUTER JOIN nxt ON base.k = nxt.k
    GROUP BY status
    ORDER BY status
    """,
    doc="snapshot diff / reconciliation: keyed full-outer join of two table versions classified added/removed/changed/unchanged with per-class counts and key ranges",
)
def x_table_diff(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: one co-hashed full-outer join on the key (both
    sides shuffle once; a full outer can never broadcast) feeding a
    row-local CASE classifier and a 4-row aggregate — reconciliation
    without collecting either side, and without the three separate
    anti/semi/inner passes the naive formulation runs (one scan per
    class = 3x the fact I/O). Price comparison is on the raw stored
    doubles — bit-equality of unchanged values is exactly what a diff
    wants, no epsilon."""
    orders = load_table(spark, sf, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("bk"), F.col("o_totalprice").alias("bv")
    )
    nxt = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("nk"),
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")).alias("nv"),
    )
    status = (
        F.when(F.col("bk").isNull(), F.lit("added"))
        .when(F.col("nk").isNull(), F.lit("removed"))
        .when(F.col("bv") != F.col("nv"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        base.join(nxt, F.col("bk") == F.col("nk"), "full_outer")
        .select(status.alias("status"), F.coalesce("bk", "nk").alias("k"))
        .groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.min("k").cast("bigint").alias("min_key"),
            F.max("k").cast("bigint").alias("max_key"),
        )
        .orderBy("status")
    )


@query(
    "x_temporal_join",
    # Point-in-time correctness: each purchase joins the dimension
    # VERSION that was valid at the purchase's own timestamp (SCD2
    # lookup) — the join every feature-store and revenue report needs
    # and the one naive "join latest" pipelines silently get wrong.
    # Signups act as dimension updates (each sets the user's plan value
    # until the next signup); purchases are the fact probes.
    oracle="""
    WITH v AS (
        SELECT user_id, ts AS valid_from, value AS plan_value,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS valid_to
        FROM events WHERE event_type = 'signup'),
    f AS (
        SELECT user_id, event_id AS purchase_id, ts,
               CAST(value AS DECIMAL(18,4)) AS amount
        FROM events WHERE event_type = 'purchase')
    SELECT f.purchase_id, f.user_id,
           strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(v.valid_from, '%Y-%m-%d %H:%M:%S') AS version_ts,
           CAST(v.plan_value AS DOUBLE) AS plan_value,
           CAST(f.amount AS DOUBLE) AS amount
    FROM f JOIN v
      ON f.user_id = v.user_id
     AND f.ts >= v.valid_from
     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
    ORDER BY f.purchase_id
    """,
    doc="point-in-time SCD2 lookup: purchases join the dimension version valid at their own timestamp — equi-join on the key with the interval predicate as a post-join filter, versions built by one lead() window",
)
def x_temporal_join(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: versions build with ONE window over the update
    subset (filter pushed to the scan); the lookup is an EQUI-join on
    user_id — the interval test rides along as a join residual, so
    Spark plans a hash join keyed on the user, never a range nested
    loop. Each probe matches at most one version (intervals partition
    the timeline per key by construction), so output cardinality equals
    the fact's. Contrast x_asof_join: the union+ordered-window strategy
    avoids materializing intervals and wins when versions churn fast;
    this interval-join form wins when the dimension is stable and
    reused by many facts (build once, probe many). Both are one
    fact-sized shuffle."""
    ev = load_table(spark, sf, "events")
    # (ts, event_id) tiebreak matches the oracle exactly: two updates in
    # the same instant must version in the same order on both engines
    wv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    v = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            "event_id",
            F.col("value").alias("plan_value"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(wv))
        .drop("event_id")
    )
    f = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts", dec("value").alias("amount")
    )
    return (
        f.join(v, "user_id")
        .filter(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select(
            "purchase_id",
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            ts_str("valid_from").alias("version_ts"),
            F.col("plan_value").cast("double").alias("plan_value"),
            F.col("amount").cast("double").alias("amount"),
        )
        .orderBy("purchase_id")
    )


@query(
    "x_decile_bins",
    # Exact equi-depth binning: NTILE(10) over the full order table —
    # the feature-engineering discretizer. NTILE's exact contract
    # (first n%B buckets get one extra row) is reproduced from a
    # distributed rank, so the result is bit-equal to the single
    # window the oracle runs.
    oracle="""
    WITH r AS (
        SELECT o_orderkey, o_totalprice,
               NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders)
    SELECT bucket, count(*) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM r GROUP BY bucket
    ORDER BY bucket
    """,
    doc="exact equi-depth decile binning: NTILE(10) reproduced from the two-level distributed rank (price-domain buckets + exclusive prefix counts) plus closed-form NTILE arithmetic — no single-partition window",
)
def x_decile_bins(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: NTILE over a bare ORDER BY is the same
    single-partition window d19_sort just eliminated, so this op
    derives the exact global rank the same two-level way (price-domain
    groups rank locally in parallel; the ~6k-row group-count table
    takes the tiny exclusive-prefix window and broadcasts back), then
    maps rank -> bucket with NTILE's closed form: with q = n/B and
    rem = n%B, the first rem buckets hold q+1 rows. Every step is
    integer arithmetic on (rank, n) — nothing to round, nothing
    engine-specific. The bin edges (min/max per bucket) come from the
    10-row aggregate, giving the discretizer's lookup table directly."""
    orders = load_table(spark, sf, "orders")
    base = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / 100).cast("long").alias("grp"),
    )
    wl = Window.partitionBy("grp").orderBy("o_totalprice", "o_orderkey")
    local = base.withColumn("lrank", F.row_number().over(wl))
    counts = base.groupBy("grp").agg(F.count("*").alias("c"))
    wg = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "grp",
        F.coalesce(F.sum("c").over(wg), F.lit(0)).alias("off"),
        F.sum("c").over(
            Window.orderBy("grp").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    ranked = local.join(F.broadcast(offsets), "grp").select(
        "o_totalprice",
        (F.col("off") + F.col("lrank")).alias("r"),
        F.col("n"),
    )
    # NTILE closed form: q = n div B, rem = n mod B; rank threshold
    # rem*(q+1) splits the fat (q+1-row) buckets from the thin ones
    bucket = F.expr(
        "CASE WHEN r <= (n % 10) * (n div 10 + 1) "
        "THEN (r - 1) div (n div 10 + 1) + 1 "
        "ELSE (n % 10) + (r - 1 - (n % 10) * (n div 10 + 1)) div (n div 10) + 1 END"
    )
    return (
        ranked.select(bucket.cast("int").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# round-7 additions: data-quality audits
# ---------------------------------------------------------------------------


@query(
    "x_benford",
    # First-significant-digit audit (Benford's law — public): natural
    # multi-scale amounts follow P(d) = log10(1 + 1/d); bulk-generated
    # or truncated data deviates, making this a standard data-quality
    # / fraud screen. The expected distribution is a LITERAL integer
    # ppm table (the nine public constants), so the comparison is pure
    # integer arithmetic — no log10 at query time on either engine.
    # First digit comes from the BIGINT floor of the amount rendered as
    # a string (identical on both engines; o_totalprice >= 1 always).
    oracle="""
    WITH d AS (
        SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                   AS digit
        FROM orders),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs),
    exp AS (
        SELECT * FROM (VALUES ('1', 301030), ('2', 176091), ('3', 124939),
                              ('4', 96910), ('5', 79181), ('6', 66947),
                              ('7', 57992), ('8', 51153), ('9', 45757))
            AS v(digit, exp_ppm))
    SELECT exp.digit, COALESCE(n, 0) AS n,
           CAST((COALESCE(n, 0) * 1000000) // total AS BIGINT) AS obs_ppm,
           CAST(exp_ppm AS BIGINT) AS exp_ppm,
           CAST((COALESCE(n, 0) * 1000000) // total - exp_ppm AS BIGINT)
               AS dev_ppm
    FROM exp LEFT JOIN obs USING (digit), t
    ORDER BY exp.digit
    """,
    doc="Benford first-digit audit over order amounts: observed vs expected ppm (literal log10 table), integer deviation — bulk-data anomaly screen",
)
def x_benford(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: one narrow map (floor -> string -> first char) into
    a 9-bucket hash aggregate with map-side combine — the shuffle
    carries at most 9 rows per task. The digit-domain frame (9 literal
    rows) left-joins the observed counts and broadcasts trivially; the
    1-row total is the partial-agg -> broadcast global-scalar shape.
    Expected ppm values are round(log10(1+1/d) * 1e6) precomputed ONCE
    here (not at query time), so no engine's libm is in the loop."""
    exp_rows = [
        ("1", 301030), ("2", 176091), ("3", 124939), ("4", 96910),
        ("5", 79181), ("6", 66947), ("7", 57992), ("8", 51153),
        ("9", 45757),
    ]
    orders = load_table(spark, sf, "orders")
    obs = (
        orders.select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    t = obs.agg(F.sum("n").cast("long").alias("total"))
    exp = spark.createDataFrame(exp_rows, "digit string, exp_ppm long")
    return (
        F.broadcast(exp)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr("(coalesce(n, 0L) * 1000000L) div total").cast("long").alias("obs_ppm"),
            F.col("exp_ppm").cast("long"),
            F.expr("(coalesce(n, 0L) * 1000000L) div total - exp_ppm")
            .cast("long")
            .alias("dev_ppm"),
        )
        .orderBy("digit")
    )


@query(
    "x_skew_audit",
    # Hot-key diagnosis — the report you read BEFORE choosing a skew
    # mitigation (x_skew_salted_join/agg demonstrate the cure; this is
    # the diagnosis): the top-10 heaviest join keys with their exact
    # corpus share and cumulative concentration in integer ppm.
    oracle="""
    WITH c AS (
        SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_custkey),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_keys FROM c),
    top AS (
        SELECT key, n FROM c ORDER BY n DESC, key LIMIT 10)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank_pos,
           key, n,
           CAST((n * 1000000) // total AS BIGINT) AS share_ppm,
           CAST((SUM(n) OVER (ORDER BY n DESC, key
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1000000) // total AS BIGINT) AS cum_share_ppm,
           n_keys
    FROM top, t
    ORDER BY rank_pos
    """,
    doc="join-key skew audit: top-10 hot keys with exact ppm share and cumulative concentration — the diagnosis feeding the x_skew_salted_* mitigations",
)
def x_skew_audit(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: per-key counts are ONE map-side-combined shuffle;
    the top-10 is TakeOrderedAndProject (per-partition top-k, 10-row
    driver merge — no global sort); the window/rank then run over 10
    rows, which is the bounded-aggregate shape, not a fact-sized empty
    window. total/n_keys is the 1-row partial-agg broadcast."""
    orders = load_table(spark, sf, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").cast("long").alias("n")
    )
    t = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_keys"),
    )
    top = c.orderBy(F.desc("n"), "key").limit(10)
    w = Window.orderBy(F.desc("n"), "key")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(t))
        .select(
            F.row_number().over(w).cast("long").alias("rank_pos"),
            "key",
            "n",
            F.expr("(n * 1000000L) div total").cast("long").alias("share_ppm"),
            (F.sum("n").over(wsum) * 1000000)
            .cast("long")
            .alias("cum_raw"),
            "total",
            "n_keys",
        )
        .select(
            "rank_pos",
            "key",
            "n",
            "share_ppm",
            F.expr("cum_raw div total").cast("long").alias("cum_share_ppm"),
            "n_keys",
        )
        .orderBy("rank_pos")
    )


@query(
    "x_recursive_cte",
    # Native RECURSIVE CTE — the SQL surface Spark gained in 4.x
    # (SPARK-24497): hop-capped multi-source BFS over the nation trade
    # graph (customer-nation -> supplier-nation edges with >= 20
    # lineitems). Each nation seeds a frontier; three expansion rounds
    # of UNION ALL path enumeration, then min-hop / path-count
    # aggregation. The hop cap bounds path enumeration at
    # |V| * fanout^3 rows (~400k worst case on the dense 25-node
    # graph), so the recursion is safe at ANY scale factor — unlike
    # x_pagerank's unbounded-closure oracle, this oracle runs at sf0.1.
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY c.c_nationkey, s.s_nationkey
        HAVING count(*) >= 20),
    reach AS (
        SELECT n_nationkey AS start, n_nationkey AS node, 0 AS hops
        FROM nation
        UNION ALL
        SELECT r.start, e.dst AS node, r.hops + 1 AS hops
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hops < 3)
    SELECT CAST(start AS BIGINT) AS start_nation,
           CAST(node AS BIGINT) AS node,
           CAST(min(hops) AS BIGINT) AS min_hops,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM reach GROUP BY start, node
    ORDER BY start_nation, node
    """,
    doc="native RECURSIVE CTE (Spark 4.x): hop-capped multi-source BFS over the nation trade graph — min hops + path counts per (start, node) pair; identical WITH RECURSIVE text on both engines",
)
def x_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    """The declarative-iteration surface: where x_pagerank and
    x_dedup_clusters UNROLL their iterations as DataFrame loops with
    localCheckpoint lineage cuts, this runs the engine's own recursive
    CTE executor on the IDENTICAL recursion text the DuckDB oracle
    runs — the strongest cross-engine form a recursive query can take.

    r15 (OPTIMIZATION round, guide §2.4/§1): the edge list is STAGED
    once before the recursion. With edges inlined as a plain CTE item,
    Spark 4.1's UnionLoop re-executes the whole edge pipeline (two
    fact joins + the aggregate) inside EVERY expansion round — the
    executed plan showed the lineitem/orders/customer/supplier joins
    under the loop body, 39 jobs and 5.6 s/run at sf0.1 for a <=625-row
    edge table rebuilt three times. An eager localCheckpoint of that
    table (one job, aggregate-sized) hands the recursion an in-memory
    leaf: 5.6 s -> 3.3 s median at sf0.1 (edge staging 1.4 s, loop
    1.9 s — the residue is the UnionLoop executor's per-iteration
    machinery over tiny frontiers, the declared surface's floor),
    result hash-identical at sf0.001/sf0.01 (the oracle's
    WITH RECURSIVE text is unchanged — only where the engine reads the
    edge relation from moved). At 100 TB this staging IS the shape a
    recursive query needs: the fact-join prologue must not re-run per
    round.

    100 TB shape: the edge build is the expensive part (two fact joins
    + a 625-row-max aggregate — dimension joins broadcast, one orderkey
    shuffle), paid once; the recursion then iterates over
    aggregate-sized frontier tables only. The hop cap (r.hops < 3) is
    load-bearing: it bounds UNION ALL path enumeration on a cyclic
    graph, the same discipline as pagerank's fixed iteration count.
    Spark's recursion guard (spark.sql.cteRecursionLevelLimit, default
    100) never triggers at depth 3."""
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        load_table(spark, sf, t).createOrReplaceTempView(f"__rc_{t}")
    # localCheckpoint keeps until-dropped blocks only; aggregate-sized
    # (<=625 rows — the 25x25 nation matrix bound)
    edges = spark.sql(REGISTRY_SQL_RC_EDGES).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("__rc_edges")
    return spark.sql(REGISTRY_SQL_RC)


REGISTRY_SQL_RC_EDGES = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst
FROM __rc_lineitem l
JOIN __rc_orders o ON o.o_orderkey = l.l_orderkey
JOIN __rc_customer c ON c.c_custkey = o.o_custkey
JOIN __rc_supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY c.c_nationkey, s.s_nationkey
HAVING count(*) >= 20
"""

REGISTRY_SQL_RC = """
WITH RECURSIVE reach AS (
    SELECT n_nationkey AS start, n_nationkey AS node, 0 AS hops
    FROM __rc_nation
    UNION ALL
    SELECT r.start, e.dst AS node, r.hops + 1 AS hops
    FROM reach r JOIN __rc_edges e ON e.src = r.node
    WHERE r.hops < 3)
SELECT CAST(start AS BIGINT) AS start_nation,
       CAST(node AS BIGINT) AS node,
       CAST(min(hops) AS BIGINT) AS min_hops,
       CAST(count(*) AS BIGINT) AS n_paths
FROM reach GROUP BY start, node
ORDER BY start_nation, node
"""


@query(
    "x_sql_pipe",
    # SQL pipe syntax (|>) — the second SQL-language surface Spark
    # gained in 4.x (SPARK-49555, the GoogleSQL-style pipe operators):
    # the same logical query reads top-to-bottom as a dataflow. The
    # oracle is the CLASSIC form — different text, same semantics —
    # so this doubles as a parser-equivalence check, not just an
    # engine-equivalence one.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (Spark 4.x |> operators): filter |> aggregate |> order as a top-down dataflow; classic-SQL oracle makes it a parser-equivalence proof",
)
def x_sql_pipe(spark: SparkSession, sf: str) -> DataFrame:
    """Surface demo with the repo's full determinism discipline riding
    along (DECIMAL-summed revenue, rounded to cents, cast to DOUBLE).
    The pipe text compiles to the identical logical plan as the
    classic form — same pushed filter, same partial/final aggregate —
    so there is no 100 TB delta to reason about; the feature's value
    is readability of long pipelines."""
    load_table(spark, sf, "lineitem").createOrReplaceTempView("__pipe_lineitem")
    return spark.sql(
        """
        FROM __pipe_lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE count(*) AS n_items,
                     CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                                    * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                          AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items, revenue
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "x_collation_group",
    # String collations — the third SQL-language surface Spark gained
    # in 4.x: UTF8_LCASE comparison/grouping without materializing a
    # lowercased key. The fixture's segments are uniform-case, so both
    # engines first build the SAME deterministic mixed-case rendering
    # (initcap on odd custkeys); Spark then groups the collated column
    # directly while the DuckDB oracle groups by lower() — equal
    # results prove the collation semantics, not just the data.
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN c_custkey % 2 = 1
                    THEN upper(substr(c_mktsegment, 1, 1))
                         || lower(substr(c_mktsegment, 2))
                    ELSE c_mktsegment END AS seg,
               c_acctbal
        FROM customer)
    SELECT lower(seg) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_balance
    FROM mixed GROUP BY lower(seg)
    ORDER BY segment
    """,
    doc="Spark 4.x string collation: GROUP BY a UTF8_LCASE-collated column equals the lower()-keyed oracle — case variants counted to prove the data actually exercises it",
)
def x_collation_group(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB note: a collated group key hashes its COLLATION KEY, so
    the aggregate stays one map-side-combined shuffle with no derived
    lower() column materialized per row — same plan as any groupBy.
    n_case_variants > 1 per group proves the rendering actually mixed
    cases (a uniform-case fixture would vacuously pass)."""
    cust = load_table(spark, sf, "customer")
    mixed = cust.select(
        F.when(
            F.col("c_custkey") % 2 == 1, F.initcap(F.col("c_mktsegment"))
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        "c_acctbal",
    )
    collated = mixed.select(
        F.expr("seg COLLATE UTF8_LCASE").alias("segc"), F.col("seg"), "c_acctbal"
    )
    return (
        collated.groupBy("segc")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.countDistinct("seg").cast("long").alias("n_case_variants"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_balance"),
        )
        .select(
            F.lower(F.col("segc").cast("string")).alias("segment"),
            "n_customers",
            "n_case_variants",
            "total_balance",
        )
        .orderBy("segment")
    )


_LATERAL_SQL = """
SELECT n.n_name AS nation, t.c_custkey AS c_custkey, t.c_acctbal AS acctbal
FROM {nation} n, LATERAL (
    SELECT c_custkey, c_acctbal
    FROM {customer} c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 3) t
ORDER BY nation, acctbal DESC, c_custkey
"""


@query(
    "x_lateral_topk",
    # LATERAL correlated subquery join (Spark 4.x SQL surface,
    # SPARK-35551 lineage): per-nation top-3 customers expressed as the
    # SQL-standard LATERAL derived table — the IDENTICAL query text runs
    # on both engines (same proof form as x_recursive_cte), so this is
    # an engine-equivalence check of the correlated-decorrelation path,
    # not a reformulation.
    oracle=_LATERAL_SQL.format(nation="nation", customer="customer"),
    doc="LATERAL correlated top-k join (Spark 4.x): per-nation top-3 customers by balance via a correlated LIMIT subquery; identical SQL text on both engines",
)
def x_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Catalyst decorrelates the LATERAL LIMIT-3 subquery into a
    ranked window join (DecorrelateInnerQuery): the physical plan is a
    partitioned row_number over c_nationkey — the same shape as
    d21_topk_per_group, NOT a per-outer-row re-execution. 100 TB
    posture: one customer shuffle on nationkey, the 25-row nation side
    broadcasts; no correlated loop survives optimization (the trap a
    naive LATERAL executor would hit). No arithmetic — output values
    are raw stored columns, so cross-engine equality is exact."""
    for t in ("nation", "customer"):
        load_table(spark, sf, t).createOrReplaceTempView(f"__lat_{t}")
    return spark.sql(_LATERAL_SQL.format(nation="__lat_nation", customer="__lat_customer"))


@query(
    "x_sql_udf",
    # SQL-language scalar UDF (Spark 4.x CREATE FUNCTION ... RETURN):
    # the logic lives in the catalog as SQL, so Catalyst INLINES the
    # body into the caller's plan — unlike Python UDFs there is no
    # serialization wall; the oracle is the hand-inlined expression,
    # making this a proof that registration + inlining preserves
    # semantics.
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_price
    FROM orders GROUP BY 1 ORDER BY band
    """,
    doc="SQL scalar UDF (Spark 4.x CREATE TEMPORARY FUNCTION ... RETURN): order-size banding function applied per row, inlined by Catalyst; oracle is the hand-inlined CASE",
)
def x_sql_udf(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB posture: a SQL UDF costs NOTHING at runtime — the CASE
    body is substituted into the plan before optimization, stays inside
    WholeStageCodegen, and the aggregate runs as an ordinary
    partial/final hash agg on the band key. This is the sanctioned way
    to share business logic across queries (vs copy-pasted expressions
    or a 100x-slower Python UDF)."""
    load_table(spark, sf, "orders").createOrReplaceTempView("__udf_orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION __chyme_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'small'
                    WHEN p < 150000 THEN 'medium'
                    ELSE 'large' END
        """
    )
    return spark.sql(
        """
        SELECT __chyme_band(o_totalprice) AS band,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_price
        FROM __udf_orders GROUP BY 1 ORDER BY band
        """
    )


@query(
    "x_param_sql",
    # Parameterized SQL (spark.sql(..., args={...}), Spark 3.4+/4.x):
    # named :param markers bound server-side — the injection-safe query
    # surface a multi-tenant pipeline service needs (the reference
    # renders task templates by string substitution,
    # internal/core/template.go — parameter binding is the engine-native
    # replacement). Oracle is the literal-substituted text: binding must
    # be semantically identical to inlining.
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="parameterized SQL with named :param markers (spark.sql args=): date-window order rollup; oracle is the literal-inlined text — binding == inlining",
)
def x_param_sql(spark: SparkSession, sf: str) -> DataFrame:
    """Parameter markers bind typed values into the PARSED plan (no
    string interpolation, no injection surface, plan-cache-friendly for
    repeated windows). Same plan as the literal form: pushed date
    filter, partial/final agg on priority."""
    import datetime

    load_table(spark, sf, "orders").createOrReplaceTempView("__par_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_price
        FROM __par_orders
        WHERE o_orderdate >= :lo AND o_orderdate < :hi
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"lo": datetime.date(1995, 1, 1), "hi": datetime.date(1996, 1, 1)},
    )


@query(
    "x_sql_variable",
    # SQL session variables (Spark 4.x DECLARE VARIABLE / SET VAR):
    # a scalar computed once into a session variable, then used as a
    # predicate in a second statement — the multi-statement-script
    # surface. The oracle inlines the scalar subquery, so the check
    # proves variable capture == inline computation.
    oracle="""
    WITH thr AS (
        SELECT CAST(ROUND(AVG(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS avg_bal
        FROM customer)
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_above
    FROM customer, thr
    WHERE c_acctbal > thr.avg_bal
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="SQL session variables (Spark 4.x DECLARE/SET VAR): corpus-average balance captured into a variable, reused as a filter threshold; oracle inlines the scalar subquery",
)
def x_sql_variable(spark: SparkSession, sf: str) -> DataFrame:
    """The variable holds ONE scalar on the driver — at any data scale
    the second statement sees it as a literal (a broadcast of size 1),
    so the filter pushes down to the scan exactly as if hand-written.
    Decimal-avg discipline pins the threshold bit-identically across
    engines before the comparison."""
    load_table(spark, sf, "customer").createOrReplaceTempView("__var_customer")
    spark.sql("DECLARE OR REPLACE VARIABLE __chyme_avg_bal DOUBLE")
    spark.sql(
        """
        SET VAR __chyme_avg_bal = (
            SELECT CAST(ROUND(AVG(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
            FROM __var_customer)
        """
    )
    return spark.sql(
        """
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_above
        FROM __var_customer
        WHERE c_acctbal > __chyme_avg_bal
        GROUP BY c_nationkey ORDER BY c_nationkey
        """
    )


_GBA_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
FROM {lineitem}
GROUP BY ALL
ORDER BY ALL
"""


@query(
    "x_groupby_all",
    # GROUP BY ALL / ORDER BY ALL (Spark 4.x, DuckDB-originated SQL
    # sugar): the resolver infers the grouping keys (every non-aggregate
    # select item) and the total ordering. Identical text on both
    # engines — a resolver-equivalence proof.
    oracle=_GBA_SQL.format(lineitem="lineitem"),
    doc="GROUP BY ALL / ORDER BY ALL (Spark 4.x resolver sugar): Q1-style rollup with inferred grouping keys; identical SQL text on both engines",
)
def x_groupby_all(spark: SparkSession, sf: str) -> DataFrame:
    """Pure resolver surface: after analysis the plan is byte-identical
    to the explicit GROUP BY l_returnflag, l_linestatus form (same
    partial/final hash agg), so there is no scale delta — the value is
    that generated/templated SQL can't drift out of sync between its
    select list and grouping keys."""
    load_table(spark, sf, "lineitem").createOrReplaceTempView("__gba_lineitem")
    return spark.sql(_GBA_SQL.format(lineitem="__gba_lineitem"))


@query(
    "x_winsorize",
    # Per-group winsorization (robust feature cleaning): clamp each
    # nation's balances into [P05, P95], percentiles taken as EXACT
    # order statistics at integer ranks ceil(p*n) — no interpolating
    # percentile() whose float blend differs across engines; the cut
    # values are stored column values, so clamping introduces no new
    # floats at all.
    oracle="""
    WITH r AS (
        SELECT c_custkey, c_nationkey, c_acctbal,
               row_number() OVER w AS rk,
               count(*) OVER (PARTITION BY c_nationkey) AS n
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)),
    cuts AS (
        SELECT c_nationkey,
               max(CASE WHEN rk = (5 * n + 99) // 100 THEN c_acctbal END) AS lo,
               max(CASE WHEN rk = (95 * n + 99) // 100 THEN c_acctbal END) AS hi
        FROM r GROUP BY c_nationkey)
    SELECT r.c_custkey, r.c_nationkey, r.c_acctbal,
           least(greatest(r.c_acctbal, cuts.lo), cuts.hi) AS bal_w
    FROM r JOIN cuts USING (c_nationkey)
    ORDER BY c_custkey
    """,
    doc="per-nation winsorization at exact-rank P05/P95: integer-rank order statistics as cut values, clamp via least/greatest — engine-exact robust clipping",
)
def x_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: one rank window per group (groups sort
    independently — parallelism = group count), cut values collapse to
    a |groups|-row table that broadcasts back; the clamp is a narrow
    map. Exact-rank cuts (ceil(p*n) = (p_pct*n + 99) div 100, integer)
    rather than interpolated percentiles are what make the op
    hash-provable across engines AND rank-stable under re-partitioning
    — the x_percentiles/x_decile_bins discipline applied to value
    repair instead of bucketing."""
    cust = load_table(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_nationkey")
    r = cust.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    cuts = r.groupBy("c_nationkey").agg(
        F.max(
            F.when(F.col("rk") == F.expr("(5 * n + 99) div 100"), F.col("c_acctbal"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rk") == F.expr("(95 * n + 99) div 100"), F.col("c_acctbal"))
        ).alias("hi"),
    )
    return (
        r.join(F.broadcast(cuts), "c_nationkey")
        .select(
            "c_custkey", "c_nationkey", "c_acctbal",
            F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi")).alias("bal_w"),
        )
        .orderBy("c_custkey")
    )


@query(
    "x_spearman_corr",
    # Exact Spearman rank correlation between two document signals
    # (length vs lexical diversity proxy), per language: rho = 1 -
    # 6*sum(d^2)/(n(n^2-1)) over integer ranks — every term is an exact
    # integer until ONE final division, surfaced in parts-per-million
    # via integer floor division (no float statistics anywhere). Ranks
    # use row_number with doc_id tiebreaks, so ties are broken
    # identically on both engines.
    oracle="""
    WITH sig AS (
        SELECT doc_id, lang,
               n_chars AS a,
               len(list_distinct(string_split(lower(text), ' '))) AS b
        FROM documents),
    r AS (
        SELECT lang,
               row_number() OVER (PARTITION BY lang ORDER BY a, doc_id) AS ra,
               row_number() OVER (PARTITION BY lang ORDER BY b, doc_id) AS rb
        FROM sig),
    s AS (
        SELECT lang, count(*) AS n,
               SUM((ra - rb) * (ra - rb)) AS d2
        FROM r GROUP BY lang)
    SELECT lang, CAST(n AS BIGINT) AS n,
           CAST(1000000 - (6000000 * d2) // (n * (n * n - 1)) AS BIGINT)
               AS spearman_ppm
    FROM s WHERE n > 1 ORDER BY lang
    """,
    doc="exact Spearman rank correlation (length vs distinct-token count) per language, integer-ppm — no float statistics, deterministic tiebreaks",
)
def x_spearman_corr(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: two rank windows per language partition (groups
    sort independently), one aggregate row per language. The rank
    difference formula needs no mean/stddev pass — the reason Spearman
    (unlike Pearson) can be exact in integers. Production use: monotone
    dependence between any two quality signals decides whether one is
    redundant in a filter ensemble."""
    docs = load_table(spark, sf, "documents")
    sig = docs.select(
        "doc_id", "lang",
        F.col("n_chars").alias("a"),
        F.size(F.array_distinct(F.split(F.lower("text"), " "))).alias("b"),
    )
    wa = Window.partitionBy("lang").orderBy("a", "doc_id")
    wb = Window.partitionBy("lang").orderBy("b", "doc_id")
    r = sig.select(
        "lang",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    s = r.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))).alias("d2"),
    )
    return (
        s.filter(F.col("n") > 1)
        .select(
            "lang",
            F.col("n").cast("long").alias("n"),
            F.expr("1000000 - (6000000 * d2) div (n * (n * n - 1))")
            .cast("long")
            .alias("spearman_ppm"),
        )
        .orderBy("lang")
    )


@query(
    "x_ks_test",
    # Exact two-sample Kolmogorov-Smirnov statistic between the 'en'
    # and non-'en' document-length distributions: D = max |F_a - F_b|
    # over the pooled sample, computed as an integer maximum of
    # |ca*nb - cb*na| (cross-multiplied CDF numerators — no float CDFs),
    # surfaced in ppm by ONE final integer division. The distribution-
    # drift gate a corpus refresh runs before shipping.
    oracle="""
    WITH lab AS (
        SELECT n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_a
        FROM documents),
    tot AS (
        SELECT SUM(is_a) AS na, SUM(1 - is_a) AS nb FROM lab),
    cum AS (
        SELECT v,
               SUM(SUM(is_a)) OVER (ORDER BY v) AS ca,
               SUM(SUM(1 - is_a)) OVER (ORDER BY v) AS cb
        FROM lab GROUP BY v),
    d AS (
        SELECT max(abs(ca * tot.nb - cb * tot.na)) AS dmax
        FROM cum CROSS JOIN tot)
    SELECT CAST(tot.na AS BIGINT) AS n_en,
           CAST(tot.nb AS BIGINT) AS n_rest,
           CAST(d.dmax // (tot.na * tot.nb // 1000000 + 1) AS BIGINT) AS ks_scaled
    FROM d CROSS JOIN tot
    """,
    doc="exact two-sample KS statistic (en vs rest doc-length distributions): integer cross-multiplied CDF gap maximum, one final scaled division — distribution-drift gate",
)
def x_ks_test(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: group by the value first (one shuffle to |distinct
    values| rows), then ONE cumulative window over the value-level
    aggregate — the window runs over distinct lengths, not documents
    (n_chars cardinality is bounded by max doc length, thousands not
    billions; for a truly unbounded metric, pre-bucket to fixed-width
    bins first). Integer cross-multiplication |ca*nb - cb*na| keeps the
    CDF comparison exact at any sample imbalance."""
    docs = load_table(spark, sf, "documents")
    lab = docs.select(
        F.col("n_chars").alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_a"),
    )
    tot = lab.agg(
        F.sum("is_a").alias("na"), F.sum(F.lit(1) - F.col("is_a")).alias("nb")
    )
    grouped = lab.groupBy("v").agg(
        F.sum("is_a").alias("ga"), F.sum(F.lit(1) - F.col("is_a")).alias("gb")
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grouped.select(
        "v",
        F.sum("ga").over(wcum).alias("ca"),
        F.sum("gb").over(wcum).alias("cb"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .agg(F.max(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).alias("dmax"))
    )
    return d.crossJoin(F.broadcast(tot)).select(
        F.col("na").cast("long").alias("n_en"),
        F.col("nb").cast("long").alias("n_rest"),
        F.expr("dmax div (na * nb div 1000000 + 1)").cast("long").alias("ks_scaled"),
    )


@query(
    "x_gini_concentration",
    # Gini concentration of token mass across domains (sources): the
    # inequality index a mixture designer watches — Gini ~ 0 means
    # sources contribute evenly, ~ 1 means one source dominates.
    # Exact integer form of the sorted formula:
    # G = (2*sum(i*w_i) - (n+1)*W) / (n*W) over ascending-sorted
    # weights, in ppm by one final integer division.
    oracle="""
    WITH w AS (
        SELECT source, SUM(len(string_split(lower(text), ' '))) AS tokens
        FROM documents GROUP BY source),
    r AS (
        SELECT tokens,
               row_number() OVER (ORDER BY tokens, source) AS i,
               count(*) OVER () AS n,
               SUM(tokens) OVER () AS tot
        FROM w)
    SELECT CAST(max(n) AS BIGINT) AS n_sources,
           CAST(max(tot) AS BIGINT) AS total_tokens,
           CAST((2000000 * SUM(i * tokens) - 1000000 * (max(n) + 1) * max(tot))
                // (max(n) * max(tot)) AS BIGINT) AS gini_ppm
    FROM r
    """,
    doc="Gini concentration of token mass across sources (exact integer sorted formula, ppm) — the mixture-imbalance index",
)
def x_gini_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: token mass collapses to |sources| rows before any
    window — the rank/total windows run over the aggregate, not the
    corpus (the x_benford discipline). The corpus-sized work is one
    map-side-combined token count per source."""
    docs = load_table(spark, sf, "documents")
    w = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("tokens")
    )
    wr = Window.orderBy("tokens", "source")
    wall = Window.partitionBy()
    r = w.select(
        "tokens",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("tokens").over(wall).alias("tot"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_sources"),
        F.max("tot").cast("long").alias("total_tokens"),
        F.expr(
            "(2000000 * SUM(i * tokens) - 1000000 * (max(n) + 1) * max(tot))"
            " div (max(n) * max(tot))"
        )
        .cast("long")
        .alias("gini_ppm"),
    )


@query(
    "x_auc_score",
    # Exact ROC-AUC of a score signal (n_chars) as a predictor of a
    # binary label (lang='en'), per source, via the pair-counting
    # (Mann-Whitney) identity with exact tie handling:
    #   AUC = (#concordant + #tied/2) / (n_pos * n_neg)
    # computed entirely in integers as numer2 / (2*np*nn), where
    # numer2 = SUM over distinct score values of
    #   2*pos_v*neg_below_v  (concordant pairs, doubled)
    #   +  pos_v*neg_v       (tied pairs, i.e. halved after the *2).
    # One final bigint division surfaces ppm. Both divisions operate on
    # non-negative integers (DuckDB's // floors, Spark's div truncates —
    # they only agree above zero, so no signed division is allowed here).
    oracle="""
    WITH lab AS (
        SELECT source, n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos
        FROM documents),
    pv AS (
        SELECT source, v,
               SUM(is_pos)::BIGINT AS pos, SUM(1 - is_pos)::BIGINT AS neg
        FROM lab GROUP BY source, v),
    cum AS (
        SELECT source, pos, neg,
               COALESCE(SUM(neg) OVER (PARTITION BY source ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        FROM pv),
    agg AS (
        SELECT source, SUM(pos) AS np, SUM(neg) AS nn,
               SUM(2 * pos * below + pos * neg) AS numer2
        FROM cum GROUP BY source)
    SELECT source,
           CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           CAST(CAST(numer2 AS HUGEINT) * 1000000 // (2 * np * nn) AS BIGINT) AS auc_ppm
    FROM agg WHERE np > 0 AND nn > 0 ORDER BY source
    """,
    doc="exact per-source ROC-AUC (Mann-Whitney pair counting, integer tie handling, ppm) — the quality-classifier eval gate over a scored corpus",
)
def x_auc_score(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: the corpus collapses to one row per (source,
    distinct score value) in a single map-side-combined groupBy before
    any window runs — the cumulative-negatives window and the final
    aggregate operate on the value histogram (|sources| x |distinct
    scores| rows), not the corpus. No per-row ranks over the full data,
    which is what makes exact AUC (unlike naive rank-sum) feasible at
    scale. Overflow: the final numer2*1e6 runs in DECIMAL(38,0) on the
    Spark side / HUGEINT in the oracle (the x_dup_span_scrub pattern),
    so np*nn per source is safe to ~1.3e16 docs-squared — wrap-around
    under ansi=false (which would silently corrupt auc_ppm at large
    SF while the oracle errored) is off the table. numer2 itself sums
    BIGINT products of per-value histogram counts and stays exact."""
    docs = load_table(spark, sf, "documents")
    pv = (
        docs.select(
            "source",
            F.col("n_chars").alias("v"),
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("is_pos"),
        )
        .groupBy("source", "v")
        .agg(
            F.sum("is_pos").cast("long").alias("pos"),
            F.sum(F.lit(1) - F.col("is_pos")).cast("long").alias("neg"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = pv.select(
        "source", "pos", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("below"),
    )
    agg = cum.groupBy("source").agg(
        F.sum("pos").alias("np"),
        F.sum("neg").alias("nn"),
        F.sum(
            F.lit(2) * F.col("pos") * F.col("below") + F.col("pos") * F.col("neg")
        ).alias("numer2"),
    )
    return (
        agg.filter((F.col("np") > 0) & (F.col("nn") > 0))
        .select(
            "source",
            F.col("np").cast("long").alias("n_pos"),
            F.col("nn").cast("long").alias("n_neg"),
            F.expr("CAST(numer2 AS DECIMAL(38,0)) * 1000000 div (2 * np * nn)")
            .cast("long")
            .alias("auc_ppm"),
        )
        .orderBy("source")
    )


@query(
    "x_calibration_bins",
    # Reliability diagram for a [0,1]-scaled score (ppm fixed-point):
    # decile bins, per-bin count, integer mean score, empirical positive
    # rate, and the |mean - rate| calibration gap. The per-bin gap is
    # what an Expected Calibration Error weights and sums; emitting the
    # bins keeps the op composable (ECE, MCE, or a reliability plot are
    # one trivial aggregate away).
    oracle="""
    WITH s AS (
        SELECT LEAST(n_chars, 2000)::BIGINT * 500 AS score_ppm,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos
        FROM documents),
    b AS (
        SELECT LEAST(score_ppm // 100000, 9) AS bin,
               COUNT(*)::BIGINT AS n,
               SUM(score_ppm)::BIGINT AS s, SUM(is_pos)::BIGINT AS p
        FROM s GROUP BY 1)
    SELECT CAST(bin AS BIGINT) AS bin, n,
           CAST(s // n AS BIGINT) AS mean_score_ppm,
           CAST(p * 1000000 // n AS BIGINT) AS pos_rate_ppm,
           CAST(ABS(s // n - p * 1000000 // n) AS BIGINT) AS gap_ppm
    FROM b ORDER BY bin
    """,
    doc="reliability-diagram decile bins for a ppm-scaled score vs a binary label (count, integer mean score, positive rate, calibration gap) — the classifier-calibration audit",
)
def x_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: one map-side-combined groupBy into at most 10
    rows — each executor emits 10 partial (n, sum_score, sum_pos)
    triples and the exchange carries tens of rows total. All integer
    arithmetic (score is ppm fixed-point), so the bin means are
    partition-order-independent."""
    docs = load_table(spark, sf, "documents")
    s = docs.select(
        (F.least(F.col("n_chars"), F.lit(2000)).cast("long") * 500).alias("score_ppm"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).cast("long").alias("is_pos"),
    )
    b = s.groupBy(
        F.least(F.expr("score_ppm div 100000"), F.lit(9).cast("long")).alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("score_ppm").alias("s"),
        F.sum("is_pos").alias("p"),
    )
    return b.select(
        F.col("bin").cast("long").alias("bin"),
        "n",
        F.expr("s div n").cast("long").alias("mean_score_ppm"),
        F.expr("p * 1000000 div n").cast("long").alias("pos_rate_ppm"),
        F.expr("abs(s div n - p * 1000000 div n)").cast("long").alias("gap_ppm"),
    ).orderBy("bin")


@query(
    "x_transpose_stats",
    # DataFrame.transpose (Spark 4.0+): per-language corpus stats
    # flipped so each language becomes a column and each metric a row —
    # the "wide summary card" shape reports want. The oracle mirrors the
    # pivot by hand; the language set is a fixture invariant
    # (de/en/es/fr/zh at every sf, tests/test_fixture_invariants.py).
    oracle="""
    WITH s AS (
        SELECT lang, COUNT(*)::BIGINT AS n_docs,
               SUM(n_chars)::BIGINT AS sum_chars,
               COUNT(DISTINCT source)::BIGINT AS n_sources
        FROM documents GROUP BY lang)
    SELECT 'n_docs' AS key,
           MAX(CASE WHEN lang='de' THEN n_docs END) AS de,
           MAX(CASE WHEN lang='en' THEN n_docs END) AS en,
           MAX(CASE WHEN lang='es' THEN n_docs END) AS es,
           MAX(CASE WHEN lang='fr' THEN n_docs END) AS fr,
           MAX(CASE WHEN lang='zh' THEN n_docs END) AS zh
    FROM s
    UNION ALL
    SELECT 'sum_chars',
           MAX(CASE WHEN lang='de' THEN sum_chars END),
           MAX(CASE WHEN lang='en' THEN sum_chars END),
           MAX(CASE WHEN lang='es' THEN sum_chars END),
           MAX(CASE WHEN lang='fr' THEN sum_chars END),
           MAX(CASE WHEN lang='zh' THEN sum_chars END)
    FROM s
    UNION ALL
    SELECT 'n_sources',
           MAX(CASE WHEN lang='de' THEN n_sources END),
           MAX(CASE WHEN lang='en' THEN n_sources END),
           MAX(CASE WHEN lang='es' THEN n_sources END),
           MAX(CASE WHEN lang='fr' THEN n_sources END),
           MAX(CASE WHEN lang='zh' THEN n_sources END)
    FROM s
    """,
    doc="DataFrame.transpose over per-language corpus stats: languages become columns, metrics become rows — the wide summary-card shape (Spark 4 surface)",
)
def x_transpose_stats(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: transpose is strictly an aggregate-sized surface —
    it collects the index column to name the output columns, so it must
    NEVER see the corpus. Here the corpus collapses to |langs| rows in
    one map-side-combined groupBy first; transpose then flips a 5-row
    frame on the driver. The scan is the only distributed stage."""
    docs = load_table(spark, sf, "documents")
    stats = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    return stats.transpose()


@query(
    "x_linear_probe_fit",
    # One-pass distributed LINEAR-PROBE FIT: per-language OLS of
    # whitespace token count on character count, via exact integer
    # sufficient statistics (n, Sx, Sy, Sxx, Sxy, Syy). The closed-form
    # slope/intercept/R^2 then come from a FIXED arithmetic tree over
    # those exact integers — cast-to-double happens only at the last
    # step, on identical values, through identical expression shapes in
    # both engines, so the hash compare is sound (the x_auc_score
    # discipline extended from counts to second moments). DuckDB sums
    # in HUGEINT; Spark in DECIMAL — both exact, headroom documented in
    # the docstring.
    oracle="""
    WITH f AS (
        SELECT lang,
               CAST(n_chars AS HUGEINT) AS x,
               CAST(len(string_split(lower(text), ' ')) AS HUGEINT) AS y
        FROM documents),
    s AS (
        SELECT lang, COUNT(*)::HUGEINT AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
        FROM f GROUP BY lang)
    SELECT lang,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                      / CAST(NULLIF(n*sxx - sx*sx, 0) AS DOUBLE), 6) AS DOUBLE) AS slope,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - (CAST(n*sxy - sx*sy AS DOUBLE)
                          / CAST(NULLIF(n*sxx - sx*sx, 0) AS DOUBLE)) * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE), 6) AS DOUBLE) AS intercept,
           CAST(ROUND((CAST(n*sxy - sx*sy AS DOUBLE)
                       / CAST(NULLIF(n*sxx - sx*sx, 0) AS DOUBLE))
                      * (CAST(n*sxy - sx*sy AS DOUBLE)
                         / CAST(NULLIF(n*syy - sy*sy, 0) AS DOUBLE)), 6) AS DOUBLE) AS r2
    FROM s
    """,
    doc="distributed one-pass linear-probe fit: per-language OLS (slope/intercept/R^2) of token count on char count from exact integer sufficient statistics — closed-form model fitting as a single aggregation",
)
def x_linear_probe_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Model fitting as ONE aggregation pass — the cheap-probe training
    story for corpus curation (fit a linear quality/length probe on the
    cluster, score everywhere): no iterations, no driver-side data, no
    collect beyond |groups| rows.

    100 TB shape: the corpus collapses map-side to six sufficient
    statistics per language (partial aggregation combines locally, the
    shuffle moves |langs| x 6 scalars), and the closed-form solve is a
    projection over that aggregate — the same sufficient-statistic
    pattern MLlib's linear summarizer uses, expressed in pure DataFrame
    ops. Exactness: x = n_chars (<= ~1e4), y = whitespace token count
    (<= x), so Sxx <= n * 1e8 and every cross-moment stays exact in
    DECIMAL(38,0) to beyond 1e15 documents per language; n*Sxy and
    Sx*Sy reach ~1e38 only past ~1e14 docs/lang — headroom documented,
    overflow nulls rather than wraps (non-ansi decimal). Degenerate
    groups (zero x- or y-variance) yield NULL slope/r2 via the shared
    NULLIF guard, never a divide-by-zero.
    """
    docs = load_table(spark, sf, "documents")
    d20 = "decimal(20,0)"
    f = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias("y"),
    )
    s = f.groupBy("lang").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast(d20)).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("y").cast(d20)).cast("decimal(38,0)").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d20)).cast("decimal(38,0)").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(d20)).cast("decimal(38,0)").alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(d20)).cast("decimal(38,0)").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # NULLIF twins: a zero denominator becomes NULL before the divide,
    # exactly as the oracle's NULLIF — same tree, same nulls.
    den_d = F.when(den == 0, F.lit(None)).otherwise(den).cast("double")
    vy_d = F.when(vy == 0, F.lit(None)).otherwise(vy).cast("double")
    slope_raw = num.cast("double") / den_d
    intercept_raw = (
        F.col("sy").cast("double") - slope_raw * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2_raw = slope_raw * (num.cast("double") / vy_d)
    return s.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.round(slope_raw, 6).cast("double").alias("slope"),
        F.round(intercept_raw, 6).cast("double").alias("intercept"),
        F.round(r2_raw, 6).cast("double").alias("r2"),
    )
