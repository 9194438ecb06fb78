"""Relational core: scans, filters, joins, aggregations, set ops.

SURVEY.md §2B D-01..D-20 and D-25/D-26. These generalize the reference's
dataflow primitives — its S3 recursive scan (reference
``pkg/aws/s3.go:63-80``), extension predicate (``internal/ingest/
util.go:26-44``), Redis-SET dedup (``internal/core/resource.go:54-108``)
and ledger anti-join idempotence (``internal/tasker/service.go:36-66``) —
into the full declarative surface a Spark engine provides natively.

Scale notes (100 TB posture):
  * Every query is a single declarative plan — Catalyst pushes filters
    and projections into the parquet scan and prunes columns.
  * TRUE dimension joins (region/nation/supplier, filtered part) are
    broadcast-hinted: those sides stay small relative to the fact at
    any scale, so no shuffle of the big side is ever needed. Customer
    and customer-derived build sides scale WITH the fact (~15M rows/TB)
    and carry no hint — a pinned broadcast cannot be demoted by AQE and
    OOMs the build at 100x; unhinted, AQE promotes at runtime only
    while the measured size fits.
  * Aggregations are plain hash aggregates: map-side partial combine
    then a key shuffle; AQE coalesces post-shuffle partitions.
  * The theta join (D-13) is the one intentionally shuffle-heavy shape;
    it pre-partitions both sides on the equi conjunct so the non-equi
    filter runs within co-located partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chyme_spark.ops.common import dec, money, sql_dec, sql_money
from chyme_spark.registry import query
from chyme_spark.session import load_table


@query(
    "d01_parquet_scan",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS l_shipdate
    FROM lineitem
    """,
    doc="D-01 full parquet scan of lineitem (ref scan-source pkg/aws/s3.go:63-80)",
)
def d01_parquet_scan(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
    )


@query(
    "d02_projection",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_money(sql_dec('l_extendedprice') + ' * (1 - ' + sql_dec('l_discount') + ')')} AS net_price
    FROM lineitem
    """,
    doc="D-02 projection with computed column (ref template field selection)",
)
def d02_projection(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("net_price"),
    )


@query(
    "d03_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
    doc="D-03 conjunctive predicate, pushed to the scan (ref FilterFunc internal/ingest/util.go:26-44)",
)
def d03_filter(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


# Synthetic resource-catalog URL: documents.source is 'srcN'; we derive a
# deterministic file extension from doc_id so the chyme extension filter
# (ref internal/ingest/util.go:29 regex '^(.+)\.%s$') has realistic prey.
_EXTS = ["mov", "mp4", "txt", "json", "MOV", "parquet"]
_URL_SQL = (
    "concat('s3://data-lake/', source, '/obj_', CAST(doc_id AS VARCHAR), '.', "
    "CASE CAST(doc_id % 6 AS INT) WHEN 0 THEN 'mov' WHEN 1 THEN 'mp4' WHEN 2 THEN 'txt' "
    "WHEN 3 THEN 'json' WHEN 4 THEN 'MOV' ELSE 'parquet' END)"
)


def synthetic_urls(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> (doc_id, url) resource catalog rows."""
    docs = load_table(spark, sf, "documents")
    ext = (
        F.when(F.col("doc_id") % 6 == 0, "mov")
        .when(F.col("doc_id") % 6 == 1, "mp4")
        .when(F.col("doc_id") % 6 == 2, "txt")
        .when(F.col("doc_id") % 6 == 3, "json")
        .when(F.col("doc_id") % 6 == 4, "MOV")
        .otherwise("parquet")
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("s3://data-lake/"), F.col("source"), F.lit("/obj_"),
            F.col("doc_id").cast("string"), F.lit("."), ext,
        ).alias("url"),
    )


@query(
    "d04_regex_ext_filter",
    oracle=f"""
    WITH catalog AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    SELECT doc_id, url FROM catalog
    WHERE regexp_matches(lower(url), '^(.+)\\.(mov|mp4)$')
    """,
    doc="D-04 chyme's signature regex extension filter (ref internal/ingest/util.go:26-44)",
)
def d04_regex_ext_filter(spark: SparkSession, sf: str) -> DataFrame:
    cat = synthetic_urls(spark, sf)
    return cat.filter(F.lower(F.col("url")).rlike(r"^(.+)\.(mov|mp4)$"))


@query(
    "d05_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="D-05 set-semantics dedup (ref Redis SET internal/core/resource.go:54-108)",
)
def d05_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select("user_id", "event_type").distinct()


@query(
    "d06_keyed_dedup",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey, l_partkey
        -- l_quantity completes the tiebreak: sf0.001 contains a pair of
        -- rows identical in (okey, pkey, linenumber, suppkey) differing
        -- only in quantity, which left this order underdetermined (the
        -- Spark side's min(struct) always included it)
        ORDER BY l_linenumber, l_suppkey, l_quantity) = 1
    """,
    doc="D-06 deterministic keyed dedup via row_number (ref task-hash ledger internal/core/task.go:157-179)",
)
def d06_keyed_dedup(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    # survivor = lexicographic min of (l_linenumber, l_suppkey) per key,
    # expressed as min(struct) so it's a HASH AGGREGATE with map-side
    # partial combine — at 100 TB this shuffles one row per key, where
    # the equivalent row_number() window shuffles every input row and
    # then sorts each partition
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(F.min(F.struct("l_linenumber", "l_suppkey", "l_quantity")).alias("w"))
        .select(
            "l_orderkey",
            "l_partkey",
            F.col("w.l_linenumber").alias("l_linenumber"),
            F.col("w.l_quantity").alias("l_quantity"),
        )
    )


@query(
    "d07_inner_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="D-07 inner equi hash join",
)
def d07_inner_join(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    # NO forced broadcast: customer scales with the fact (~15M rows/TB),
    # so a pinned hint OOMs the build side at 100x and AQE cannot demote
    # it. Left unhinted, AQE promotes to broadcast at runtime while the
    # measured size fits and falls back to a keyed shuffle beyond that.
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "d08_broadcast_join",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand,
           {sql_money(sql_dec('l.l_extendedprice') + ' * (1 - ' + sql_dec('l.l_discount') + ')')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    """,
    doc="D-08 explicit broadcast hash join; plan asserted BroadcastHashJoin in tests",
)
def d08_broadcast_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_size") <= 20)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey",
        "l_linenumber",
        "p_brand",
        money(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("revenue"),
    )


@query(
    "d09_left_outer_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COALESCE(o.o_orderkey, -1) AS o_orderkey,
           COALESCE(o.o_orderstatus, 'NONE') AS o_orderstatus
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="D-09 left outer join with null handling",
)
def d09_left_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("o_orderkey"),
            F.coalesce(F.col("o_orderstatus"), F.lit("NONE")).alias("o_orderstatus"),
        )
    )


@query(
    "d10_left_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="D-10 left semi join — the 'already processed?' existence check",
)
def d10_left_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    cust = load_table(spark, sf, "customer")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "d11_left_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="D-11 left anti join — pop-vs-ledger idempotence (ref internal/tasker/service.go:36-66)",
)
def d11_left_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    cust = load_table(spark, sf, "customer")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "d12_star_join",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {sql_money('SUM(' + sql_dec('l.l_extendedprice') + ' * (1 - ' + sql_dec('l.l_discount') + '))')} AS revenue,
           COUNT(*) AS n_lines
    FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="D-12 5-way star join: true dims (nation/region) broadcast; the customer-derived dim is unhinted (AQE-promoted while it fits)",
)
def d12_star_join(spark: SparkSession, sf: str) -> DataFrame:
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    # EAGER AGGREGATION pushed below the fact join (Yan & Larson 1995;
    # Catalyst doesn't do this rewrite itself): revenue and line count
    # are additive per l_orderkey, so collapsing lineitem to one row
    # per order first (a) shrinks the join input ~4x (TPC-H
    # lines-per-order) and narrows it to 3 columns, and (b) leaves the
    # child hash-partitioned on the join key, so the orders join reuses
    # the aggregation's shuffle instead of re-exchanging the fact side.
    # Measured crossover (r10, noop sink, medians of 9): at sf0.1 this
    # is ~1.1x SLOWER than the unpushed form — AQE broadcasts orders
    # there, so the plain join never exchanges lineitem and the
    # high-cardinality pre-agg is pure overhead — but at 10x data it is
    # 1.4x FASTER (1.55s vs 2.19s) and at 20x ties-or-wins (2.11s vs
    # 2.40s): once orders outgrows the broadcast threshold (always, at
    # cluster scale) the pre-agg replaces the fact-side join exchange
    # with an exchange of the SAME key that then sorts/joins 4x fewer
    # rows. Decimal sums are exact; money() rounds once at the end, so
    # the result is bit-identical to the unpushed form at every scale.
    li_pre = li.groupBy("l_orderkey").agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("rev"),
        F.count("*").alias("nl"),
    )
    return (
        li_pre.join(orders, li_pre.l_orderkey == orders.o_orderkey)
        # dims is customer-derived (scales with the fact): no forced
        # broadcast — AQE promotes at runtime only while it fits
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            money(F.sum("rev")).alias("revenue"),
            F.sum("nl").alias("n_lines"),
        )
    )


@query(
    "d13_theta_join",
    oracle="""
    SELECT o1.o_custkey AS custkey, COUNT(*) AS n_pairs
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey AND o1.o_orderdate < o2.o_orderdate
    GROUP BY o1.o_custkey
    """,
    doc="D-13 range/theta join: equi conjunct shuffles, non-equi filters in-partition",
)
def d13_theta_join(spark: SparkSession, sf: str) -> DataFrame:
    o1 = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey"), F.col("o_orderdate").alias("d1")
    )
    o2 = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey2"), F.col("o_orderdate").alias("d2")
    )
    return (
        o1.join(o2, (o1.custkey == o2.custkey2) & (o1.d1 < o2.d2))
        .groupBy("custkey")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "d14_hash_agg_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_money('SUM(' + sql_dec('l_quantity') + ')')} AS sum_qty,
           {sql_money('SUM(' + sql_dec('l_extendedprice') + ')')} AS sum_base_price,
           {sql_money('SUM(' + sql_dec('l_extendedprice') + ' * (1 - ' + sql_dec('l_discount') + '))')} AS sum_disc_price,
           {sql_money('SUM(' + sql_dec('l_extendedprice') + ' * (1 - ' + sql_dec('l_discount') + ') * (1 + ' + sql_dec('l_tax') + '))')} AS sum_charge,
           {sql_money('SUM(' + sql_dec('l_quantity') + ') / COUNT(*)')} AS avg_qty,
           {sql_money('SUM(' + sql_dec('l_extendedprice') + ') / COUNT(*)')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="D-14 TPC-H Q1-shaped hash aggregation; decimal sums keep the hash order-insensitive",
)
def d14_hash_agg_q1(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money(F.sum(dec("l_quantity"))).alias("sum_qty"),
        money(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
        money(F.sum(disc_price)).alias("sum_disc_price"),
        money(F.sum(disc_price * (1 + dec("l_tax")))).alias("sum_charge"),
        money(F.sum(dec("l_quantity")) / F.count("*")).alias("avg_qty"),
        money(F.sum(dec("l_extendedprice")) / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "d15_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="D-15 exact distinct count (ref SCard internal/core/resource.go:105-108)",
)
def d15_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"), F.count("*").alias("n_orders")
    )


@query(
    "d16_approx_count_distinct",
    oracle=None,  # rows-only: HLL implementations differ across engines
    doc="D-16 approx distinct (HLL); rows-only (ref queue-depth estimate pkg/aws/sqs.go:110-131)",
)
def d16_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_custs")
    )


@query(
    "d17_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
           GROUPING(r_name, n_name) AS gid, COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="D-17 rollup with grouping_id",
)
def d17_rollup(spark: SparkSession, sf: str) -> DataFrame:
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    j = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        j.rollup("r_name", "n_name")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n_nations"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "gid",
            "n_nations",
        )
    )


@query(
    "d18_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {sql_money('SUM(' + sql_dec('o_totalprice') + ')')} AS total_spent
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 10
    """,
    doc="D-18 post-aggregation HAVING filter",
)
def d18_having(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), money(F.sum(dec("o_totalprice"))).alias("total_spent"))
        .filter(F.col("n_orders") > 10)
    )


@query(
    "d19_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank_pos
    FROM orders WHERE o_totalprice > 400000
    """,
    doc="D-19 global sort; rank column pins the total order into the value hash",
)
def d19_sort(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: a bare ``Window.orderBy`` global row_number moves
    every filtered row into ONE task (the empty-window scale-killer the
    r5 verdict named on Q11/Q15 — this was the last fact-sized one).
    Two-level rank instead (the x_compaction_plan / x_stratified_split
    pattern): rows range-group by an order-preserving price bucket
    (totalprice div 100 — cardinality bounded by the PRICE DOMAIN, not
    the row count), rank locally per bucket in parallel, and add each
    bucket's exclusive prefix count computed on the bucket-count table
    (<= ~1000 rows at any scale, where the tiny global window is the
    accepted bounded-aggregate shape). offset + local rank reproduces
    the oracle's single global window exactly; ties share a bucket by
    construction, so cross-bucket order is total."""
    orders = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    base = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / 100).cast("long").alias("grp"),
    )
    wl = Window.partitionBy("grp").orderBy(F.desc("o_totalprice"), "o_orderkey")
    local = base.withColumn("lrank", F.row_number().over(wl))
    counts = base.groupBy("grp").agg(F.count("*").alias("n"))
    wg = Window.orderBy(F.desc("grp")).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "grp", F.coalesce(F.sum("n").over(wg), F.lit(0)).alias("off")
    )
    return local.join(F.broadcast(offsets), "grp").select(
        "o_orderkey",
        "o_totalprice",
        (F.col("off") + F.col("lrank")).cast("int").alias("rank_pos"),
    )


@query(
    "d20_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="D-20 global top-k with unique tiebreak (ref BatchSize pop internal/core/resource.go:59)",
)
def d20_limit_topk(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k,
    # then a k-row merge on the driver — no global sort at any scale.
    return orders.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    ).limit(10)


@query(
    "d25_union",
    oracle="""
    SELECT actor_id, COUNT(*) AS n_rows FROM (
        SELECT user_id AS actor_id FROM events
        UNION ALL
        SELECT o_custkey AS actor_id FROM orders
    ) GROUP BY actor_id
    """,
    doc="D-25 union all + accounting (ref multi-template fan-out merge internal/tasker/template.go:26-35)",
)
def d25_union(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(F.col("user_id").alias("actor_id"))
    orders = load_table(spark, sf, "orders").select(F.col("o_custkey").alias("actor_id"))
    return ev.unionByName(orders).groupBy("actor_id").agg(F.count("*").alias("n_rows"))


@query(
    "d26_intersect_except",
    oracle="""
    SELECT custkey, 'with_orders' AS tag FROM (
        SELECT c_custkey AS custkey FROM customer
        INTERSECT
        SELECT o_custkey FROM orders)
    UNION ALL
    SELECT custkey, 'no_orders' AS tag FROM (
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders)
    """,
    doc="D-26 intersect / except (ref Redis set semantics internal/core/resource.go:85)",
)
def d26_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    ocust = load_table(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    both = cust.intersect(ocust).withColumn("tag", F.lit("with_orders"))
    neither = cust.exceptAll(ocust).distinct().withColumn("tag", F.lit("no_orders"))
    return both.unionByName(neither)
