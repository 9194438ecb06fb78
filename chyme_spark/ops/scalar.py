"""Scalar function surface: strings, URL parsing, hashes, dates, math,
conditionals, arrays, maps, JSON, pivot.

SURVEY.md §2B D-27..D-36. These generalize the reference's string/hash
plumbing: URL-to-resource parsing (ref ``internal/core/resource.go:15-24``),
``PathToKey`` string splitting (ref ``pkg/aws/s3.go:159-162``), SHA-1
task identity with order-insensitive collation (ref
``pkg/hash/hash.go:18-58``), and the Task JSON wire format (ref
``internal/core/task.go:99``, ``pkg/aws/sqs.go:46``).

All pure per-row projections: narrow transformations, no shuffle, fully
inside whole-stage codegen — they cost one scan at any data size.
DuckDB lacks sha1, so hash parity uses md5 + sha2-256 (same collation
semantics, different digest than the reference's sha1 — deliberately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chyme_spark.ops.common import dec, money
from chyme_spark.ops.relational import _URL_SQL, synthetic_urls
from chyme_spark.registry import query
from chyme_spark.session import load_table


@query(
    "d27_string_fns",
    oracle="""
    SELECT p_partkey,
           lower(p_name)  AS name_lower,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 5) AS name_head,
           concat_ws('-', p_brand, p_type) AS brand_type,
           string_split(p_type, ' ')[1] AS type_first,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           length(trim(p_name)) AS name_len
    FROM part
    """,
    doc="D-27 scalar string bundle (ref PathToKey pkg/aws/s3.go:159-162)",
)
def d27_string_fns(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.length(F.trim(F.col("p_name"))).alias("name_len"),
    )


@query(
    "d28_url_parse",
    oracle=f"""
    WITH catalog AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z0-9]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z0-9]+://([^/]+)/', 1) AS bucket,
           regexp_extract(url, '^[a-z0-9]+://[^/]+/(.*)$', 1) AS key,
           lower(regexp_extract(url, '\\.([A-Za-z0-9]+)$', 1)) AS ext
    FROM catalog
    """,
    doc="D-28 URL -> (scheme,bucket,key,ext) parse (ref Resource internal/core/resource.go:15-24)",
)
def d28_url_parse(spark: SparkSession, sf: str) -> DataFrame:
    cat = synthetic_urls(spark, sf)
    return cat.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"^([a-z0-9]+)://", 1).alias("scheme"),
        F.regexp_extract("url", r"^[a-z0-9]+://([^/]+)/", 1).alias("bucket"),
        F.regexp_extract("url", r"^[a-z0-9]+://[^/]+/(.*)$", 1).alias("key"),
        F.lower(F.regexp_extract("url", r"\.([A-Za-z0-9]+)$", 1)).alias("ext"),
    )


@query(
    "x_url_canonicalize",
    # messy-URL fixture built deterministically from doc_id on BOTH
    # sides, then canonicalized: lowercase scheme+host, strip fragment,
    # strip utm_* tracking params (fixing the separator left behind),
    # strip trailing slash. DuckDB regexp_replace needs the explicit
    # 'g' flag to match Spark's always-global behavior, and uses \\1
    # backrefs where Spark uses $1.
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               concat('HTTP://', CASE WHEN doc_id % 2 = 0 THEN 'Example.COM' ELSE 'example.com' END,
                      '/path/', CAST(doc_id % 40 AS VARCHAR),
                      CASE CAST(doc_id % 3 AS INT)
                           WHEN 0 THEN concat('?utm_source=feed&utm_campaign=x&id=', CAST(doc_id % 7 AS VARCHAR))
                           WHEN 1 THEN '#frag'
                           ELSE '/' END) AS url
        FROM documents),
    c AS (
        SELECT doc_id, url,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(url, '#.*$', '', 'g'),
                     '[?&]utm_[^&]*', '', 'g'),
                   '^([^?]*)&', '\\1?', 'g'),
                 '/$', '', 'g') AS stripped
        FROM raw)
    SELECT doc_id, url,
           concat(lower(regexp_extract(stripped, '^([^/]+//[^/]+)', 1)),
                  regexp_extract(stripped, '^[^/]+//[^/]+(.*)$', 1)) AS url_canon
    FROM c
    """,
    doc="URL canonicalization for web-corpus dedup: lowercase authority, strip fragments/tracking params/trailing slash (all-JVM regex)",
)
def x_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    """The step BEFORE url-level dedup on a crawl: near-identical URLs
    (case-variant hosts, tracking params, fragments) must collapse to
    one canonical key or content dedup does the work 10x over. Pure
    regexp_replace chain — whole-stage codegen, no Python."""
    docs = load_table(spark, sf, "documents")
    mess = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("?utm_source=feed&utm_campaign=x&id="), (F.col("doc_id") % 7).cast("string")))
        .when(F.col("doc_id") % 3 == 1, F.lit("#frag"))
        .otherwise(F.lit("/"))
    )
    host = F.when(F.col("doc_id") % 2 == 0, "Example.COM").otherwise("example.com")
    raw = docs.select(
        "doc_id",
        F.concat(F.lit("HTTP://"), host, F.lit("/path/"), (F.col("doc_id") % 40).cast("string"), mess).alias("url"),
    )
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(F.col("url"), r"#.*$", ""), r"[?&]utm_[^&]*", ""),
            r"^([^?]*)&",
            "$1?",
        ),
        r"/$",
        "",
    )
    c = raw.withColumn("stripped", stripped)
    return c.select(
        "doc_id",
        "url",
        F.concat(
            F.lower(F.regexp_extract("stripped", r"^([^/]+//[^/]+)", 1)),
            F.regexp_extract("stripped", r"^[^/]+//[^/]+(.*)$", 1),
        ).alias("url_canon"),
    )


@query(
    "x_text_normalize",
    # explicit [ \t\n\r] class (not \s): Java's \s and RE2's \s disagree
    # on \x0B, and the oracle hash is byte-exact
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_chars_raw,
           strlen(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'))) AS n_chars_norm,
           md5(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'))) AS norm_md5
    FROM documents
    """,
    doc="text normalization: lowercase + whitespace-run collapse + trim, byte-exact across engines (corpus canonical form)",
)
def x_text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical text form ahead of hashing/dedup — the cheapest way to
    make near-identical crawl records collapse into the exact-dedup
    path instead of burdening MinHash. All-JVM regexp, codegen'd."""
    docs = load_table(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), "[ \t\n\r]+", " "))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
    )


@query(
    "d29_hash_fns",
    oracle=f"""
    WITH catalog AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    SELECT doc_id,
           md5(url) AS url_md5,
           sha256(url) AS url_sha256,
           sha256(concat(least(md5(url), md5(CAST(doc_id AS VARCHAR))),
                         greatest(md5(url), md5(CAST(doc_id AS VARCHAR))))) AS pair_hash
    FROM catalog
    """,
    doc="D-29 digest + order-insensitive collated pair hash (ref hash.Collate pkg/hash/hash.go:26-40)",
)
def d29_hash_fns(spark: SparkSession, sf: str) -> DataFrame:
    cat = synthetic_urls(spark, sf)
    md5_url = F.md5("url")
    md5_id = F.md5(F.col("doc_id").cast("string"))
    return cat.select(
        "doc_id",
        md5_url.alias("url_md5"),
        F.sha2(F.col("url"), 256).alias("url_sha256"),
        F.sha2(
            F.concat(F.least(md5_url, md5_id), F.greatest(md5_url, md5_id)), 256
        ).alias("pair_hash"),
    )


@query(
    "d30_datetime_fns",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)  AS order_year,
           month(o_orderdate) AS order_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           -- floor, not bare CAST: duckdb CAST(double->BIGINT) rounds
           -- while Spark unix_timestamp truncates — divergent on any
           -- fractional second (the x_range_frame sf0.1 lesson);
           -- o_orderdate is day-granular today, but only by generator
           -- convention
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
    doc="D-30 date/time bundle over order timestamps",
)
def d30_datetime_fns(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_s"),
    )


@query(
    "d31_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(abs(l_quantity - 25) AS DOUBLE) AS qty_dev,
           CAST(ceil(l_quantity / 7)  AS DOUBLE) AS qty_ceil,
           CAST(floor(l_quantity / 7) AS DOUBLE) AS qty_floor,
           CAST(pow(l_quantity, 2) AS DOUBLE) AS qty_sq,
           CAST(ROUND(ln(l_quantity), 6) AS DOUBLE) AS qty_ln
    FROM lineitem
    """,
    doc="D-31 math bundle on integral-valued quantities (exact except ln, which is rounded)",
)
def d31_math_fns(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).cast("double").alias("qty_dev"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).cast("double").alias("qty_floor"),
        F.pow("l_quantity", F.lit(2)).cast("double").alias("qty_sq"),
        F.round(F.log(F.col("l_quantity")), 6).cast("double").alias("qty_ln"),
    )


@query(
    "d32_conditional_fns",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '---') AS seg_or_dash,
           CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_missing
    FROM customer
    """,
    doc="D-32 when/otherwise, coalesce, nullif, isnull (ref error branching internal/worker/service.go:84-117)",
)
def d32_conditional_fns(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("---")).alias("seg_or_dash"),
        F.isnull("c_acctbal").alias("bal_missing"),
    )


@query(
    "d33_array_fns",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           unnest([0, 1, 2]) AS pos,
           CAST(unnest(embedding[1:3]) AS DOUBLE) AS val
    FROM embeddings
    """,
    doc="D-33 array size/slice/posexplode over embedding vectors (ref fan-out explode analog)",
)
def d33_array_fns(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.posexplode(F.slice("embedding", 1, 3)),
    ).select("vec_id", "dim", "pos", F.col("col").cast("double").alias("val"))


@query(
    "d34_map_fns",
    oracle="""
    SELECT doc_id,
           source AS cfg_source,
           lang AS cfg_lang,
           2 AS cfg_size
    FROM documents
    """,
    doc="D-34 build + read MapType config (ref ExecutionStrategy.Config internal/core/executor.go:27); oracle checks round-trip values",
)
def d34_map_fns(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    cfg = F.create_map(
        F.lit("source"), F.col("source"),
        F.lit("lang"), F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.element_at(cfg, "source").alias("cfg_source"),
        F.element_at(cfg, "lang").alias("cfg_lang"),
        F.size(cfg).alias("cfg_size"),
    )


@query(
    "d35_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
    doc="D-35 JSON field extraction (ref Task JSON wire format pkg/aws/sqs.go:46)",
)
def d35_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@query(
    "x_explode_outer",
    # null-safe fan-out: rows whose array is empty/NULL survive with a
    # NULL element instead of vanishing — the fan-out-accounting twin of
    # the template expansion (a resource matching no template must still
    # be visible to the ledger, not silently dropped)
    oracle="""
    WITH src AS (
        SELECT p_partkey,
               CASE WHEN p_size % 3 = 0 THEN NULL
                    ELSE string_split(p_type, ' ') END AS words
        FROM part)
    SELECT s.p_partkey, u.w AS word
    FROM src s LEFT JOIN (SELECT p_partkey, unnest(words) AS w FROM src) u
      USING (p_partkey)
    """,
    doc="explode_outer: null/empty arrays keep their row (null-safe fan-out)",
)
def x_explode_outer(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    words = F.when(F.col("p_size") % 3 == 0, F.lit(None)).otherwise(
        F.split("p_type", " ")
    )
    return part.select("p_partkey", F.explode_outer(words).alias("word"))


@query(
    "x_string_fns2",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, p_type) AS brand_type_dist,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           repeat('*', CAST(p_size % 5 AS INT)) AS stars,
           contains(lower(p_type), 'brushed') AS is_brushed
    FROM part
    """,
    doc="second string bundle: edit distance (near-dup scoring), replace/pad/reverse/repeat/contains",
)
def x_string_fns2(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.lower("p_type").contains("brushed").alias("is_brushed"),
    )


@query(
    "x_unpivot",
    oracle="""
    SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
    FROM (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
                 CAST(c_nationkey AS DOUBLE) AS nationkey FROM customer)
    UNPIVOT (val FOR metric IN (acctbal, nationkey))
    """,
    doc="unpivot/melt (pivot's inverse) via stack()",
)
def x_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    return cust.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', acctbal, 'nationkey', nationkey) AS (metric, val)",
    )


@query(
    "x_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json_structure(props) IS NOT NULL AS parsed_ok
    FROM events
    """,
    doc="from_json with explicit schema into a typed struct (full D-35 surface: schema-on-read of the Task JSON analog)",
)
def x_from_json_struct(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        parsed.isNotNull().alias("parsed_ok"),
    )


@query(
    "x_map_fns2",
    oracle="""
    SELECT doc_id,
           2 AS n_keys,
           concat('source,lang') AS keys_csv,
           upper(source) AS source_upper
    FROM documents
    """,
    doc="map transforms: map_keys ordering, transform_values; oracle checks round-trip values",
)
def x_map_fns2(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    cfg = F.create_map(
        F.lit("source"), F.col("source"),
        F.lit("lang"), F.col("lang"),
    )
    upped = F.transform_values(cfg, lambda k, v: F.upper(v))
    return docs.select(
        "doc_id",
        F.size(cfg).alias("n_keys"),
        F.array_join(F.map_keys(cfg), ",").alias("keys_csv"),
        F.element_at(upped, "source").alias("source_upper"),
    )


@query(
    "x_skew_salted_agg",
    # correctness of the SALTING pattern: pre-aggregate on (key, salt),
    # then final-aggregate on key — decimal sums make the two-phase
    # result exactly equal to the direct group-by oracle.
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="skew-mitigation salting: two-phase aggregate over (key, salt) then key; hash-identical to the direct aggregate",
)
def x_skew_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    # l_returnflag has ~3 values over the whole table — the canonical
    # hot-key shape. Phase 1 spreads each key over 16 salts so no
    # single reducer owns a whole key; phase 2 merges 3*16 tiny rows.
    salted = li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)))
    phase1 = salted.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("c"), F.sum(dec("l_quantity")).alias("s")
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("c").alias("n_rows"),
        money(F.sum("s")).alias("sum_qty"),
    )


@query(
    "x_percentiles",
    oracle="""
    SELECT event_type,
           CAST(ROUND(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)), 2) AS DOUBLE) AS p50,
           CAST(ROUND(CAST(quantile_cont(value, 0.9) AS DECIMAL(18,6)), 2) AS DOUBLE) AS p90,
           CAST(min(value) AS DOUBLE) AS v_min,
           CAST(max(value) AS DOUBLE) AS v_max
    FROM events GROUP BY event_type
    """,
    doc="exact percentiles (linear interpolation) per group; min/max exact",
)
def x_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)").cast("decimal(18,6)"), 2).cast("double").alias("p50"),
        F.round(F.expr("percentile(value, 0.9)").cast("decimal(18,6)"), 2).cast("double").alias("p90"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


@query(
    "x_approx_quantiles",
    oracle=None,  # rows-only: GK-sketch results are implementation-defined;
    # the accuracy contract vs exact percentiles is pinned in
    # tests/test_training_ops.py instead
    doc="approx quantiles via mergeable GK sketch (approx_percentile): the single-pass scale path exact percentile cannot take",
)
def x_approx_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based quantiles — the 100 TB twin of x_percentiles.

    Exact ``percentile`` materializes every group value (sort or
    full-list aggregation: memory scales with group size, unusable on a
    billion-row group). ``approx_percentile`` keeps a bounded
    Greenwald-Khanna sketch per partition and MERGES them — one pass,
    O(1/accuracy) state per group regardless of corpus size. accuracy
    10000 bounds rank error at 1/10000 of the group.
    """
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("p90"),
        F.expr("approx_percentile(value, 0.99, 10000)").alias("p99"),
        F.count("*").alias("n"),
    )


@query(
    "x_skew_salted_join",
    # correctness of the JOIN-salting pattern: replicate the small side
    # over every salt, salt the big side's rows, equi-join on
    # (key, salt) — result is row-identical to the plain join.
    oracle="""
    SELECT e.event_type, n.n_name,
           count(*) AS n_rows,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events e JOIN nation n ON (e.user_id % 25) = n.n_nationkey
    GROUP BY e.event_type, n.n_name
    """,
    doc="skew-mitigation join salting: small side replicated per salt, big side salted, equi-join on (key, salt); hash-identical to the plain join",
)
def x_skew_salted_join(spark: SparkSession, sf: str, n_salts: int = 8) -> DataFrame:
    """Hot-key join without AQE: when one join key owns a huge share of
    the big side (the power-law reality of web corpora), a plain hash
    join sends the whole hot key to one reducer. Salting splits each
    big-side key across ``n_salts`` reducers and replicates the small
    side ``n_salts``x — bounded, because the replicated side is the
    small one. AQE's skew-join split does this adaptively for sort-merge
    joins; the explicit form works for any join and any engine, and is
    the shape to reach for when a stage graph shows one straggling task.
    """
    ev = load_table(spark, sf, "events").withColumn("nkey", F.col("user_id") % 25)
    nat = load_table(spark, sf, "nation")
    salted_big = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).cast("int"))
    salted_small = nat.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_big.join(
        salted_small, (F.col("nkey") == F.col("n_nationkey")) & (salted_big.salt == salted_small.salt)
    )
    return joined.groupBy("event_type", "n_name").agg(
        F.count("*").alias("n_rows"),
        money(F.sum(dec("value"))).alias("sum_value"),
    )


@query(
    "x_stats_moments",
    # stddev/variance built-ins accumulate doubles in partition order —
    # nondeterministic across engines. Compute the moments from exact
    # decimal power sums instead: identical doubles on both sides.
    oracle="""
    WITH s AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,4))) AS s1,
               SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS s2
        FROM events GROUP BY event_type)
    SELECT event_type, n,
           CAST(ROUND(s1 / n, 2) AS DOUBLE) AS mean_value,
           CAST(ROUND(CAST((n * s2 - s1 * s1) AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 2) AS DOUBLE)
               AS var_value
    FROM s
    """,
    doc="mean/variance from exact decimal power sums (order-insensitive where the stddev built-ins are not)",
)
def x_stats_moments(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).alias("s1"),
        F.sum(dec("value") * dec("value")).alias("s2"),
    )
    return s.select(
        "event_type",
        "n",
        F.round(F.col("s1") / F.col("n"), 2).cast("double").alias("mean_value"),
        F.round(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1)),
            2,
        ).cast("double").alias("var_value"),
    )


@query(
    "d36_pivot",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS cnt_O,
           COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS cnt_F,
           COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS cnt_P
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="D-36 pivot on order status with explicit value list",
)
def d36_pivot(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    # customer scales with the fact: no forced broadcast (AQE promotes
    # at runtime while the measured build side fits)
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    # explicit pivot values: skips the extra distinct-scan AND makes the
    # output schema deterministic (required for the hash oracle)
    p = j.groupBy("c_mktsegment").pivot("o_orderstatus", ["O", "F", "P"]).count()
    return p.select(
        "c_mktsegment",
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_P"),
    )


@query(
    "x_variant_json",
    # Spark 4 VariantType: parse once into the binary variant encoding,
    # then typed variant_get extraction — the engine-native form of
    # schema-flexible JSON (vs d35's per-access string re-parse).
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    """,
    doc="VariantType JSON: parse_json -> variant_get typed extraction (single parse, schema-on-read; Spark 4 engine feature)",
)
def x_variant_json(spark: SparkSession, sf: str) -> DataFrame:
    """At 100 TB the variant encoding is the difference between parsing
    each JSON document once (columnar binary, shredding-ready) and
    re-parsing the string per extracted field (d35's get_json_object);
    same answers, engine-level win. Missing paths yield NULL, matching
    the oracle's json_extract_string."""
    ev = load_table(spark, sf, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "string").alias("missing"),
    )
