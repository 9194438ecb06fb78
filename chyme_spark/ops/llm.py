"""LLM-training-data pipeline operators: dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search (brute cosine + LSH
bucketed), text analysis (tokens, language-ID, quality, fingerprints).

North-star surface beyond the reference (BASELINE.json): the reference
dedups *URLs* with a Redis SET (ref ``internal/core/resource.go:54-108``);
these operators generalize that to content-level dedup at 100 TB.

Scale design (every operator):
  * no ``collect()``; candidate generation is always an equi-join on a
    hash bucket (LSH band, SimHash chunk), never an all-pairs product;
  * shingling/minhashing is JVM-side (``xxhash64``/higher-order array
    fns) — no Python in the hot path;
  * the brute-force cosine path broadcasts the (small) query set and
    makes one pass over the corpus: the canonical verify-baseline for
    the LSH variant;
  * skewed shingles (stop-ngrams shared by everything) would blow up
    the inverted-index join — the exact-Jaccard operator filters
    candidates through distinct pairs first, and AQE skew-join handles
    residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chyme_spark.registry import query
from chyme_spark.session import load_table

# ---------------------------------------------------------------------------
# shared text plumbing
# ---------------------------------------------------------------------------


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


def _ngrams(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams, built with higher-order array functions
    (JVM-side; the array never leaves Tungsten).

    ``tokens`` MUST be a bound attribute (a materialized column), not an
    inline expression: the lambda references it per element, and an
    inline ``split(...)`` would re-execute once per element — O(len^2)
    row work. Callers stage the token array with a select first.

    Documents shorter than ``n`` tokens yield an EMPTY gram set: an
    unguarded ``sequence(0, size-n)`` would descend into negative
    indices and element_at would throw (ADVICE r1). Matches the DuckDB
    oracle, which naturally produces zero n-grams for short docs.
    """
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def doc_ngrams(spark: SparkSession, sf: str, n: int = 3) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks"))
    return staged.select("doc_id", F.explode(_ngrams(F.col("toks"), n)).alias("g"))


def md5_bucket(col: str, mod: int):
    """Deterministic sampling coin: first 8 hex chars of md5(col) as an
    integer bucket in [0, mod). The single definition behind every
    hash-sampled op (split/mixture/resample) — one place to change the
    coin, three queries stay consistent (round-6 review finding)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % mod


# DuckDB mirror of doc_ngrams (positional self-join; duckdb can't lateral
# generate_series over a column)
_NG_SQL = """
tok AS (
    SELECT doc_id,
           unnest(string_split(lower(text), ' ')) AS tok,
           generate_subscripts(string_split(lower(text), ' '), 1) AS pos
    FROM documents),
ng AS (
    SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS g
    FROM tok a
    JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2)
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@query(
    "d42_exact_dedup",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
    doc="D-42 exact content dedup, deterministic survivor = min doc_id (ref Redis SET dedup generalized to content)",
)
def d42_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    # min(doc_id) per content hash = deterministic survivor, as a hash
    # aggregate with map-side combine (shuffles one row per distinct
    # hash — a window row_number would shuffle and sort every row)
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_hash")
    )


@query(
    "x_ngram_jaccard",
    oracle=f"""
    WITH {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
    """,
    doc="exact n-gram Jaccard near-dup pairs via inverted-index join (ground truth for MinHash)",
)
def x_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    # the gram string never reaches the output: shuffle/join on its
    # 8-byte xxhash64 instead (same trade as x_duplicate_ngram_fraction;
    # zero collisions on the oracle-checked data, pinned there by the
    # exact-gram DuckDB oracle itself)
    ng = doc_ngrams(spark, sf).select("doc_id", F.xxhash64("g").alias("g"))
    sizes = ng.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ng.alias("a")
    b = ng.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    # sizes is one row PER DOCUMENT — corpus-scaled, so the join is
    # un-hinted: AQE broadcasts at fixture scale and shuffle-joins at
    # 100 TB (a pinned hint cannot be demoted and would OOM the build;
    # round-6 review, same policy as the r5 customer-side demotions)
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 4).cast("double").alias("jaccard"))
    )


_MINHASH_K = 16
_BANDS = 4
_ROWS_PER_BAND = _MINHASH_K // _BANDS
_JACCARD_TAU = 0.8


def doc_shingle_sets(spark: SparkSession, sf: str, n: int = 3) -> DataFrame:
    """One row per doc: (doc_id, hs: distinct HASHED shingle array, n: |hs|).

    Shingles are hashed to 64-bit longs directly from the token triple
    (``xxhash64(t[i], t[i+1], t[i+2])``) — the gram string is never
    materialized, the per-doc set is an array of longs, and the whole
    MinHash pipeline stays shuffle-free until the LSH bucket groupBy.
    64-bit collisions are negligible for Jaccard estimation (the same
    trade every production near-dup pipeline makes)."""
    docs = load_table(spark, sf, "documents")
    # small-file guard: a single parquet file yields 1-2 input splits, so
    # the whole shingle+minhash map side would run on one core. At real
    # scale the input has >= cores files and this branch never fires —
    # the condition, not an unconditional exchange, is the point.
    # (inputFiles() is a metadata call; .rdd.getNumPartitions() would
    # build a whole Python RDD conversion just to ask.)
    par = spark.sparkContext.defaultParallelism
    if len(docs.inputFiles()) < par:
        docs = docs.repartition(par, "doc_id")
    # stage the token array as an attribute: referencing an inline
    # split(...) inside the transform lambda would re-split per element
    staged = docs.select("doc_id", _tokens().alias("toks"))
    # one F.expr = one gateway call; building the same tree from Python
    # Column ops costs dozens of py4j round-trips per lambda. Short docs
    # (< n tokens) get an empty set, not a descending-sequence crash
    # (ADVICE r1); minhash of an empty set is then a null signature.
    ats = ", ".join(f"element_at(toks, cast(i + {j + 1} as int))" for j in range(n))
    hs = F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(toks) - {n}), i -> xxhash64({ats}))) "
        f"ELSE cast(array() as array<bigint>) END"
    )
    return staged.select(
        "doc_id",
        hs.alias("hs"),
    ).withColumn("n", F.size("hs"))


_LSH_BUCKET_CAP = 256  # all-pairs above this switches to star pairing


def lsh_candidates(
    sets: DataFrame,
    k: int = _MINHASH_K,
    bands: int = _BANDS,
    max_bucket: int = _LSH_BUCKET_CAP,
) -> DataFrame:
    """MinHash-band the per-doc shingle sets, group docs per
    (band, band_hash) bucket, and emit in-bucket pairs — candidate
    generation is one hash shuffle, never an all-pairs product, and
    never a self-join that would recompute the signature subtree twice.

    The k minhashes and the band hashes are ONE nested-transform
    expression over ``hs``: per band, transform the band's seed range to
    ``array_min(xxhash64(seed, shingle))`` minhashes and xxhash64 the
    resulting row vector into the bucket key. Each seed's corpus pass
    happens exactly once (same work as k materialized signature
    columns) but the analyzed plan carries one expression instead of
    k + bands — round 1 spent most of d43's wall-clock compiling the
    16-column tree. Bucketing is identical to hashing the k columns
    pairwise: the band hash is a deterministic function of the same
    min-value vector, so two docs collide iff they did before.

    Bucket sizes are bounded by collision likelihood (near-dup
    clusters), so per-bucket pairing is cheap — but nothing used to
    ENFORCE that (VERDICT r6 #4): one hot (band, bh) on a skewed real
    corpus (10^5 boilerplate-identical pages, or a degenerate band
    hash) would explode quadratically in a single task. ``max_bucket``
    now caps the all-pairs form: a bucket with more than ``max_bucket``
    members emits STAR pairs instead — every member paired with the
    bucket's minimum doc_id — so per-bucket pair output drops from
    O(N^2) to O(N) while CONNECTIVITY is fully preserved (all members
    stay in one component through the hub, which is exactly what the
    downstream connected-components / survivor selection consumes; no
    bucket is dropped, so transitive recall is unchanged). The cost is
    direct pair recall beyond the cap: a member pair whose similarity
    to each other exceeds tau but whose similarity to the hub does not
    would surface only through another band's bucket. For the
    degenerate-bucket hazard this cap exists for (identical or
    near-identical cluster members), hub similarity ~= pair similarity,
    so the loss is nil — pinned by the adversarial identical-docs test
    in tests/test_llm_recall.py. Task memory stays O(bucket) longs (the
    sorted id array any groupBy-collect holds), never O(bucket^2)."""
    # the banding itself is band_signatures — ONE definition, so the
    # incremental ledger gate's collide-iff-collide contract with this
    # function is structural, not a copy-paste invariant (r10 review)
    banded = band_signatures(sets, k, bands)
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                # ids is sorted, so ids[0] is the deterministic hub
                f"CASE WHEN size(ids) <= {int(max_bucket)} THEN "
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b)))) "
                "ELSE transform(slice(ids, 2, size(ids) - 1), "
                "y -> struct(ids[0] AS a, y AS b)) END"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
    return pairs.distinct()


@query(
    "d43_minhash_lsh",
    oracle=None,  # rows-only: LSH recall is probabilistic in the banding
    doc="D-43 MinHash+LSH near-dup dedup: shingle -> 16 minhashes -> 4-band bucket join -> exact-Jaccard verify >= 0.8",
)
def d43_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    # persist = the in-session analog of staging the shingle-set table to
    # storage (which is what a 100 TB run would do): the scan+shingle pass
    # runs once, and the candidate branch + both verify joins reuse it
    # (until-dropped: blocks live while the returned frame is referenced,
    # the x_tpch_q15 persist convention)
    sets = doc_shingle_sets(spark, sf).persist()
    cand = lsh_candidates(sets)
    # Verify candidates with exact Jaccard over per-doc shingle-set
    # arrays: the candidate list is tiny relative to the corpus (that is
    # LSH's whole point), so two equi-joins against the 1-row-per-doc
    # sets table + array_intersect beat re-joining an exploded
    # (doc, shingle) table. Per-doc sets are bounded (doc length), so
    # the arrays stay small at any corpus size.
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.hs"), F.col("sb.hs")))
    jac = inter * 1.0 / (F.col("sa.n") + F.col("sb.n") - inter)
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.round(jac, 4).cast("double").alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_TAU)
    )


@query(
    "x_simhash_neardup",
    oracle=None,  # rows-only: hash-bit geometry is implementation-defined
    doc="SimHash near-dup: 64-bit bit-majority signature over token hashes; 16-bit chunk banding (any equal chunk => candidate; Hamming<=k verify)",
)
def x_simhash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    # counts-weighted (multiset) tokens: frequency shifts move the
    # signature, which discriminates better than set-membership alone
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    h = F.xxhash64("tok")
    # bit-majority: sum +1/-1 per bit position, JVM-side (64 conditional aggs)
    bit_aggs = [
        F.sum(F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("doc_id").agg(*bit_aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    signed = sums.select("doc_id", sig.alias("simhash"))
    # band into 4 x 16-bit chunks; near-dups must share >= 1 chunk (Hamming<=3 guarantee... pigeonhole for <=3 flips over 4 chunks)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for c in range(4)
        ]
    )
    banded = signed.select("doc_id", "simhash", F.explode(chunks).alias("cc")).select(
        "doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.cv").alias("cv")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.cv") == F.col("b.cv"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(F.col("hamming") <= 3)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _np_round4(raw):
    """HALF_UP away from zero to 4 decimals, matching Spark F.round /
    DuckDB ROUND — np.round is half-to-even, which would flip a .00005
    tie in the 4th decimal vs the oracle (ADVICE r2; same formula as
    x_cosine_topk_np, training.py)."""
    import numpy as np

    return np.sign(raw) * np.floor(np.abs(raw) * 1e4 + 0.5) / 1e4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


@query(
    "d44_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    pairs AS (
        SELECT q.qid, e.vec_id,
               list_sum(list_transform(list_zip(q.qe, e.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cosine
        FROM q JOIN embeddings e ON e.vec_id <> q.qid)
    SELECT qid, vec_id, CAST(ROUND(cosine, 4) AS DOUBLE) AS cosine
    FROM pairs
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY ROUND(cosine, 4) DESC, vec_id) <= 3
    """,
    doc="D-44 brute-force cosine top-k: broadcast query set, one corpus pass, per-query top-k (ANN baseline)",
)
def d44_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    # norms precomputed once per row on each side — inside the pair join
    # they would be recomputed |queries| times per corpus vector
    corpus = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("nrm").alias("qnrm")
    )
    pairs = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    cos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    scored = pairs.select("qid", "vec_id", F.round(cos, 4).cast("double").alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).drop("rn")


@query(
    "x_ann_lsh_topk",
    oracle=None,  # rows-only: bucketing is hash-geometry specific
    doc="ANN scale path: random-hyperplane (sign-of-projection via deterministic hash planes) LSH buckets; search only same-bucket candidates",
)
def x_ann_lsh_topk(
    spark: SparkSession, sf: str, n_planes: int = 8, topk: int = 3, multiprobe: int = 0
) -> DataFrame:
    """Hyperplane-LSH bucketed ANN.

    ``n_planes`` is THE scale knob: it sets the bucket count
    (2**n_planes) and thus the per-bucket candidate fraction
    (~corpus/2**n_planes per probe). Size it so a bucket holds a
    searchable slice: n_planes ~ log2(corpus_rows / target_bucket_rows)
    — e.g. 1e9 rows at ~64k-row buckets wants ~14 planes; the 8-plane
    default (256 buckets) is calibrated to the sf0.1 fixture, not to a
    real corpus. More planes = higher precision / lower recall per
    probe.

    ``multiprobe`` recovers that recall: 1 probes the query's bucket
    PLUS every bucket at Hamming distance 1 (n_planes+1 probes — the
    near-miss buckets where a borderline projection flipped one bit),
    which multiplies scanned candidates by ~n_planes+1 while leaving
    the corpus bucketing untouched. This is how a high-plane config
    stays honest at 100 TB: planes set the partition granularity,
    probes buy back recall per query. 0 = exact-bucket only. Recall
    floor and monotonicity are pinned by tests/test_llm_recall.py.
    """
    emb = load_table(spark, sf, "embeddings")
    # deterministic pseudo-random hyperplanes: plane p, dim d weight in
    # {-1,+1} from xxhash64 parity — reproducible with no RNG state
    def bucket(col: Column) -> Column:
        bits = []
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    col,
                    F.sequence(F.lit(0), F.size(col) - 1),
                    lambda x, i: x.cast("double")
                    * F.when(F.xxhash64(F.lit(p), i).bitwiseAND(F.lit(1)) == 1, 1.0).otherwise(-1.0),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)))
        out = F.lit(0)
        for b in bits:
            out = out.bitwiseOR(b)
        return out

    # norms computed ONCE per vector and carried as columns — the inline
    # _norm form would re-fold O(dim) per candidate pair (~2x scoring
    # CPU at corpus x multiprobe; round-6 review — d44 documents the
    # same precompute)
    bucketed = emb.select(
        "vec_id",
        "embedding",
        bucket(F.col("embedding")).alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    q = bucketed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"),
        F.col("nrm").alias("qnrm"),
    )
    if multiprobe:
        # the probe buckets are all distinct (qb, qb^1, qb^2, ...), and a
        # corpus vector lives in exactly one bucket, so the explode can
        # never produce a duplicate (qid, vec_id) candidate pair
        probes = F.array(F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
        q = q.select("qid", "qe", "qnrm", F.explode(probes).alias("qb"))
    cand = bucketed.join(F.broadcast(q), (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("qid")))
    cos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    scored = cand.select("qid", "vec_id", F.round(cos, 4).cast("double").alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= topk).drop("rn")


@query(
    "x_ann_ivf_topk",
    oracle=None,  # rows-only: centroid geometry is trainer-specific
    doc="ANN scale path #2 — IVF: KMeans centroids partition the corpus; a query probes only its nprobe nearest cells (MLlib, seed-pinned)",
)
def x_ann_ivf_topk(
    spark: SparkSession, sf: str, k: int = 16, nprobe: int = 2, topk: int = 3
) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans cells partition the corpus, a
    query scans only its ``nprobe`` nearest cells.

    Scale knobs: ``k`` (cell count) should grow with the corpus —
    the standard sizing is k ~ sqrt(corpus_rows) (1e9 rows -> ~32k
    cells) so each cell holds ~sqrt(n) vectors and a probe scans
    ~nprobe*sqrt(n) candidates; the k=16 default is calibrated to the
    sf0.1 fixture. ``nprobe`` trades recall for scan cost linearly —
    raise it (2 -> 8-32) when recall matters more than latency. Train
    KMeans on a sample at real scale; assignment is a broadcast of the
    k x dim centroid matrix, one corpus pass. Recall floor on the
    fixture is pinned by tests/test_llm_recall.py.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf, "embeddings")
    vecs = emb.select("vec_id", "embedding", array_to_vector("embedding").alias("features"))
    model = KMeans(k=k, seed=42, maxIter=10).fit(vecs)
    # norm carried as a column: one O(dim) fold per vector, not per
    # candidate pair (round-6 review; same precompute as d44/LSH)
    assigned = model.transform(vecs).select(
        "vec_id", "embedding", F.col("prediction").alias("cell"),
        _norm(F.col("embedding")).alias("nrm"),
    )

    # centroids are tiny (k x dim): a literal DataFrame, broadcast into the probe join
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    q = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    qdist = q.join(F.broadcast(centroids), how="cross").select(
        "qid", "qe", "qnrm", "cell",
        _dot(F.col("qe"), F.col("centroid")).alias("cdot"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cdot"), "cell")
    probes = (
        qdist.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qe", "qnrm", "cell")
    )

    # search only the probed cells: the join key is the cell id, so the
    # corpus is scanned once and each query touches ~nprobe/k of it
    cand = assigned.join(F.broadcast(probes), "cell").filter(F.col("vec_id") != F.col("qid"))
    cos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    scored = cand.select("qid", "vec_id", F.round(cos, 4).cast("double").alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= topk).drop("rn")


@query(
    "x_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(ROUND(
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
           AS DOUBLE) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
          >= 0.45
    """,
    doc="embedding-cosine near-dup pairs (>=0.45), exact, via block-matrix equi-join (no nested-loop broadcast)",
)
def x_embedding_neardup(
    spark: SparkSession, sf: str, n_blocks: int | None = None
) -> DataFrame:
    """Exact cosine similarity self-join, distributed as a block-matrix
    product instead of round-1's O(n^2) BroadcastNestedLoopJoin.

    Each vector hashes to one of ``n_blocks`` blocks; the tiny
    (bi<=bj) block-pair table is broadcast against both sides, and the
    pair search becomes an EQUI-join on (bi,bj): one shuffle per side,
    every cogroup cell holding one bounded block-product. Each
    unordered vector pair meets in exactly one block-pair cell, so the
    result set is identical to the brute-force join (the DuckDB
    oracle). n_blocks defaults ADAPTIVE — clamp(n/1000, 8, 64), so a
    cell's per-side population stays ~1000 rows and its score matrix
    task-sized however the corpus grows; replication is ~n_blocks per
    side, rows shipped ~n_blocks x n (linear in both).

    Physical strategy (r11): each cell is ONE chunked float64 dgemm
    inside cogrouped applyInPandas — the per-pair HOF-expression form
    re-folded both arrays per candidate in interpreted eval and
    measured 14.7 s at sf0.1 in the r11 bench rotation; the gemm twin
    is ~10x faster with a hash-identical result at all three SFs (the
    x_cosine_topk_np precedent: float64 BLAS sums match the HOF/DuckDB
    sequential sums at round-4 on real data).

    Why not LSH candidates + exact verify (VERDICT r1's suggestion):
    at tau=0.45 the fixture's qualifying pairs sit at cosine 0.45-0.51,
    where the hyperplane agreement probability is ~0.65 vs 0.5 for
    random pairs — banding tight enough for near-exact recall admits
    nearly all pairs as candidates (1-(1-0.65^2)^18 recall needs 36
    planes whose random-pair candidate rate is ~99%). Exact quadratic
    work is intrinsic to a tau=0.45 similarity join; this shape
    distributes it evenly. For corpus-scale near-dup use the approximate
    paths (x_ann_lsh_topk / x_ann_ivf_topk) at a high threshold.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf, "embeddings")
    if n_blocks is None:
        # bounded driver action (one scalar count): block granularity
        # must track the corpus or a cell's score matrix outgrows a task
        n_blocks = max(8, min(64, emb.count() // 1000))
    blk = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks)).cast("int")
    e = emb.select("vec_id", "embedding", blk.alias("blk"))
    # two physically-distinct block-pair frames: left/right feed a
    # cogroup over the same lineage, and a shared bp makes bi/bj
    # ambiguous under Spark's self-join analyzer
    pairs = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    bp_l = spark.createDataFrame(pairs, "bi int, bj int")
    bp_r = spark.createDataFrame(pairs, "bi int, bj int")
    left = e.join(F.broadcast(bp_l), e.blk == bp_l.bi).select(
        "bi", "bj", F.col("vec_id").alias("vid_a"), F.col("embedding").alias("emb_a"),
    )
    right = e.join(F.broadcast(bp_r), e.blk == bp_r.bj).select(
        "bi", "bj", F.col("vec_id").alias("vid_b"), F.col("embedding").alias("emb_b"),
    )

    def cell(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        if l.empty or r.empty:
            return empty
        a = np.array(l["emb_a"].tolist(), dtype=np.float64)
        b = np.array(r["emb_b"].tolist(), dtype=np.float64)
        na = np.sqrt((a * a).sum(axis=1))
        nb = np.sqrt((b * b).sum(axis=1))
        va = l["vid_a"].to_numpy()
        vb = r["vid_b"].to_numpy()
        diagonal = int(l["bi"].iloc[0]) == int(l["bj"].iloc[0])
        outs = []
        # chunk the gemm so the score matrix stays ~chunk x |b| doubles
        # regardless of cell population (memory bound per task)
        for s in range(0, len(a), 2048):
            ae, ve, ne = a[s : s + 2048], va[s : s + 2048], na[s : s + 2048]
            cos = (ae @ b.T) / np.outer(ne, nb)
            # cross-block cells (bi<bj) hold each unordered pair exactly
            # once in whatever id order the hash dealt; only the diagonal
            # holds both orderings and needs the id filter. Canonicalize
            # with min/max, exactly like the least/greatest of the HOF form.
            if diagonal:
                mask = (ve[:, None] < vb[None, :]) & (cos >= 0.45)
            else:
                mask = (ve[:, None] != vb[None, :]) & (cos >= 0.45)
            ii, jj = np.nonzero(mask)
            if len(ii):
                pa, pb = ve[ii], vb[jj]
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_a": np.minimum(pa, pb),
                            "vec_b": np.maximum(pa, pb),
                            # HALF_UP like the oracle's ROUND (ADVICE r2)
                            "cosine": _np_round4(cos[ii, jj]),
                        }
                    )
                )
        return pd.concat(outs) if outs else empty

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(cell, "vec_a long, vec_b long, cosine double")
    )


def _adaptive_k(n: int) -> int:
    """The gate/compactor shared cell-count policy: clamp(n/64, 16,
    1024). One definition so the compactor can never silently build a
    codebook under a different k-policy than the gate it feeds (and
    the conservation test asserts against this same helper)."""
    return max(16, min(1024, n // 64))


def _cell_quantizer(c_mat, np_: int, payload: bool = False):
    """mapInPandas kernel factory: rank IVF cells for each vector by
    squared Euclidean distance to the broadcast codebook ``c_mat``
    (KMeans' own assignment metric, so a vector's rank-1 cell is
    exactly where the trained model would file it): |q - c|^2 = |q|^2 -
    2 q.c + |c|^2, with |q|^2 constant per query dropped from the
    ranking. One (batch x dim) @ (dim x k) float64 dgemm per Arrow
    batch — the HOF-expression form (cross-join + per-pair interpreted
    folds + window rank) measured 53 s of x_incremental_ann's 50x spot
    check on this stage alone; the gemm does it in ~1 s and replaces
    the rank shuffle with a narrow map. Ties rank lower-cell-first
    (stable argsort == the (cdist, cell) ordering). Output schema is
    ``vec_id long, cell int, pr int`` (pr = 1-based probe rank).
    ``payload=True`` (requires np_ == 1) is the pure assignment form
    for x_ivf_compaction's re-layout: it passes the row's embedding
    and nrm THROUGH, emitting ``cell int, vec_id long, embedding
    array<double>, nrm double`` so the layout write needs no join back
    to the corpus — the only shuffle left is the by-cell repartition.
    Shared by the ingest gate and the compactor so both sides of the
    replay contract quantize with the SAME arithmetic."""
    import numpy as np
    import pandas as pd

    if payload and np_ != 1:
        raise ValueError("payload assignment is single-cell: np_ must be 1")
    c_sq = (c_mat * c_mat).sum(axis=1)

    def quantize(batches):
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d = c_sq[None, :] - 2.0 * (x @ c_mat.T)
            top = np.argsort(d, axis=1, kind="stable")[:, :np_]
            if payload:
                yield pd.DataFrame(
                    {
                        "cell": top[:, 0].astype("int32"),
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "embedding": pdf["embedding"],
                        "nrm": pdf["nrm"].to_numpy(),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), np_),
                    "cell": top.ravel().astype("int32"),
                    "pr": np.tile(np.arange(1, np_ + 1, dtype="int32"), len(pdf)),
                }
            )

    return quantize


def _ensure_ann_ledger(spark: SparkSession, sf: str, k: int | None = None) -> str:
    """Build (or reuse, session-cached per (sf, k)) the ingest gate's
    IVF ledger — the "yesterday" side: a centroid codebook
    ``centroids/ (cell, centroid)`` trained on the proportional history
    half (vec_id < (max_id+1)//2), and the history vectors
    hive-partitioned BY CELL under ``cells/`` — and return its
    directory. Factored out of x_incremental_ann (r15) so the overlay
    read path (x_ann_overlay_search) serves the SAME session geometry
    the gate admits against, instead of a second drifting build.

    Same session-cache discipline as every persisted-ledger fixture
    (_cached_ledger_dir): content is deterministic per (sf, k) (KMeans
    seed-pinned), the dir is reused across calls, and removal is
    deferred to exit because consumers lazily READ it. ``k`` is in the
    cache key — an explicit-k call must never reuse an adaptive-k
    ledger. ``k=None`` applies the shared occupancy policy
    (_adaptive_k over the history count; one bounded scalar action)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf, "embeddings")
    # proportional split (bounded driver action: one scalar) — see
    # x_incremental_ann's docstring for why the hist/batch boundary
    # scales with the corpus instead of staying a fixed constant
    split = (emb.agg(F.max("vec_id")).first()[0] + 1) // 2
    hist = emb.select(
        "vec_id", "embedding",
        array_to_vector("embedding").alias("features"),
        _norm(F.col("embedding")).alias("nrm"),
    ).filter(F.col("vec_id") < split)
    if k is None:
        # adaptive cell count (bounded driver action: one scalar count
        # over a column-pruned scan) — the clamp floor keeps the tiny
        # fixtures at the measured k=16 geometry and the cap bounds
        # codebook training. Policy shared with the compactor
        # (_adaptive_k).
        k = _adaptive_k(hist.count())
    ledger_dir, fresh = _cached_ledger_dir(f"ann_k{k}", sf)
    if fresh:
        model = KMeans(k=k, seed=42, maxIter=10).fit(hist)
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "cell int, centroid array<double>",
        )
        centroids.write.mode("overwrite").parquet(f"{ledger_dir}/centroids")
        (
            model.transform(hist)
            .select(F.col("prediction").alias("cell"), "vec_id", "embedding", "nrm")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{ledger_dir}/cells")
        )
        _mark_ledger_built(ledger_dir)
    return ledger_dir


@query(
    "x_incremental_ann",
    oracle=None,  # rows-only: the IVF cell geometry (MLlib KMeans,
    # seed-pinned) has no DuckDB twin, same as x_ann_ivf_topk; the
    # contract is pinned by tests/test_llm_recall.py::
    # test_incremental_ann_* (soundness vs exact cosine, recall vs
    # x_embedding_neardup on the union, probe monotonicity).
    doc="incremental embedding ingestion gate: new vector batch quantized against a PERSISTED IVF ledger (centroid codebook + cell-partitioned postings), exact-cosine verify of colliding cells only — the embedding sibling of x_incremental_neardup, no history re-scan",
)
def x_incremental_ann(
    spark: SparkSession, sf: str, k: int | None = None, nprobe: int = 4,
    tau: float = 0.45, ledger_dir: str | None = None,
) -> DataFrame:
    """The embedding sibling of x_incremental_neardup (VERDICT r10 #4):
    yesterday's corpus is a PERSISTED IVF ledger — a centroid codebook
    (cell, centroid) trained once on history, and the history vectors
    parquet-partitioned BY CELL — and today's batch is admitted or
    rejected without ever re-scanning or reshuffling history. A batch
    vector is quantized against the broadcast codebook, probes its
    ``nprobe`` nearest cells, and is exact-cosine verified against ONLY
    the vectors resting in those cells; rejection rule is
    earlier-doc-wins (dup_of = smallest verified duplicate), mirroring
    both incremental gates. In-batch near-dups use the same geometry:
    an earlier batch vector would have been appended to the ledger in
    its PRIMARY cell, so a later vector catches it iff one of its probe
    cells is that primary cell. Output is the full batch disposition
    (vec_id, kept, dup_of, cosine), like the MinHash gate's.

    100 TB design: the ledger is the embedding store itself, laid out
    by cell — the probed-cell set (<= k ints, metadata-sized) is pushed
    as a LITERAL partition filter onto the ledger read, so the hive
    layout prunes at plan time and a day's ingest reads ~nprobe/k of
    history (only the probed cells' files), never the corpus. The codebook
    is k x dim — a broadcast literal. Nothing quadratic BY CONSTRUCTION:
    both candidate paths cost ~|batch| x nprobe x (cell occupancy), and
    occupancy is held bounded because k is ADAPTIVE — clamp(hist/64, 16,
    1024), the x_semdedup precedent — so a replication-scaled corpus
    grows cells, not cell population (a fixed k=16 made the in-batch
    path O(batch^2/16): ~2.5e9 candidate pairs at the 50x spot check;
    the adaptive k holds it at ~nprobe x 64 x batch). The hist/batch
    split is PROPORTIONAL (vec_id < (max_id+1)/2 — which is 250 at the
    two driver SFs, the same boundary as x_incremental_neardup's fixed
    convention) for the same reason: a fixed-size history under a
    growing batch would measure fixture pathology, not the operator.
    Codebook drift (history grows, centroids staling) is the
    operational knob: :func:`x_ivf_compaction` retrains on a sample
    every N days and rewrites the layout — the compaction story, not
    the ingest story — and a compacted ledger replays through this
    gate via ``ledger_dir=``. The split / hist-count lookups are
    bounded driver actions (two scalars).

    Recall honesty: IVF probing is approximate — a near-threshold pair
    whose two vectors quantize to disjoint probe sets is missed.
    tests/test_llm_recall.py measures the gate against the EXACT
    offline pair join (x_embedding_neardup) on the union and pins the
    fixture floor; nprobe is the recall-vs-scan-cost knob (k ~
    sqrt(corpus) sizing, same as x_ann_ivf_topk's docstring).
    """
    emb = load_table(spark, sf, "embeddings")
    vecs = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    # proportional split (bounded driver action: one scalar)
    split = (vecs.agg(F.max("vec_id")).first()[0] + 1) // 2
    batch = vecs.filter(F.col("vec_id") >= split)

    # --- build + persist the IVF ledger (the "yesterday" side) --------
    # the build lives in _ensure_ann_ledger (shared with the overlay
    # read path, r15). A caller-provided ledger_dir (x_ivf_compaction's
    # replay contract) skips the build entirely — the dir's codebook IS
    # the geometry, so k is read from it, never recomputed.
    if ledger_dir is not None and k is not None:
        # a provided ledger IS the geometry — honoring k here is
        # impossible and silently ignoring it would let a caller
        # believe they got 64-cell geometry from a dir built with
        # another k (r12 review)
        raise ValueError("pass k or ledger_dir, not both: a provided ledger fixes the geometry")
    if ledger_dir is not None:
        _require_built(
            ledger_dir,
            "IVF ledger (build one via x_incremental_ann's default "
            "path or x_ivf_compaction)",
        )
    else:
        ledger_dir = _ensure_ann_ledger(spark, sf, k)
    led_cent = spark.read.parquet(f"{ledger_dir}/centroids")
    led_cells = spark.read.parquet(f"{ledger_dir}/cells")

    # --- quantize the batch against the broadcast codebook ------------
    # rank cells by squared Euclidean distance (KMeans' own assignment
    # metric, so a batch vector's rank-1 cell is exactly where the
    # trained model would file it): |q - c|^2 = |q|^2 - 2 q.c + |c|^2,
    # with |q|^2 constant per query dropped from the ranking. Physical
    # strategy is the x_cosine_topk_np one: one (batch x dim) @ (dim x
    # k) float64 dgemm per Arrow batch inside mapInPandas — the
    # HOF-expression form (cross-join + per-pair interpreted folds +
    # window rank over |batch| x k rows) measured 53 s of the 50x spot
    # check on this stage alone; the gemm does it in ~1 s and replaces
    # the rank shuffle with a narrow map. Ties rank lower-cell-first
    # (stable argsort == the (cdist, cell) ordering).
    import numpy as np
    import pandas as pd

    # codebook to the driver: bounded by the clamp (<= 1024 x dim)
    cent_rows = led_cent.orderBy("cell").collect()
    c_mat = np.array([r.centroid for r in cent_rows], dtype=np.float64)
    # nprobe > |codebook| means "probe everything" — clamp, or the
    # quantizer's repeat/tile lengths diverge from argsort's column count
    np_ = min(int(nprobe), len(c_mat))
    quantize = _cell_quantizer(c_mat, np_)

    # persist: this subplan feeds THREE consumers — the probed-cell
    # collect below, the cogroup's probe side, and the in-batch resident
    # branch (probes.filter(pr == 1)) — and without a persist each one
    # re-scans the batch and re-runs the codebook gemm (round-11
    # review; the d43 sets.persist() precedent). Tiny: <= |batch| x
    # nprobe (vec_id, cell, pr) rows. Not unpersisted here because the
    # RETURNED DataFrame lazily reads it; ContextCleaner-bounded (the
    # analytics.py x_tpch_q15 persist note) — the cache is dropped when
    # the DataFrame is GC'd, and a session-level caller that
    # materializes the disposition may unpersist sooner (ADVICE r11).
    probe_cells = batch.select("vec_id", "embedding").mapInPandas(
        quantize, "vec_id long, cell int, pr int"
    ).persist()
    probes = probe_cells.join(
        batch.select("vec_id", F.col("embedding").alias("qe"), F.col("nrm").alias("qnrm")),
        "vec_id",
    )

    # --- candidates + verify (colliding cells only, PRUNED scan) ------
    # The probed-cell set is metadata-sized (<= k integers, bounded by
    # the codebook, never by data), so collect it and push a LITERAL
    # cell IN (...) onto the ledger read: the hive layout then prunes at
    # plan time (PartitionFilters — pinned by tests/test_round11_ops.py)
    # and a small daily batch reads ONLY its probed cells' files, which
    # is the whole point of an ingestion gate over 100 TB of history.
    # (Spark's DPP does not fire here — the probe side is a computed
    # subplan, not a filtered dim — so the pruning must be explicit.
    # A corpus-wide batch probes every cell and degrades gracefully to
    # the full-layout read.) This is a bounded driver action: <= k ints.
    probed_cells = sorted(
        r.cell for r in probe_cells.select("cell").distinct().collect()
    )
    # Residents of a probed cell = history vectors RESTING there (one
    # cell each, so no candidate dedup) + earlier batch vectors whose
    # PRIMARY cell it is (where they would have been appended on
    # admission). hist ids < split <= batch ids, so ONE earlier-doc
    # rule (dup_of < vec_id) covers both paths — it also drops
    # self-pairs when a batch vector probes its own primary cell.
    residents = (
        led_cells.filter(F.col("cell").isin(probed_cells))
        .select(
            "cell", F.col("vec_id").alias("dup_of"),
            F.col("embedding").alias("emb_old"), F.col("nrm").alias("nrm_old"),
        )
        .unionByName(
            probes.filter(F.col("pr") == 1).select(
                "cell", F.col("vec_id").alias("dup_of"),
                F.col("qe").alias("emb_old"), F.col("qnrm").alias("nrm_old"),
            )
        )
    )

    # Exact-cosine verify as CHUNKED gemms per cell (cogrouped
    # applyInPandas): each vector crosses the wire once per cell it
    # touches — the per-pair HOF form shipped and re-folded both arrays
    # per CANDIDATE (occupancy x more traffic, ~100 s of the 50x spot
    # check). Hardenings vs the naive full-matrix form, all for the
    # duplicate-flood batch (every vector near-identical, so the whole
    # batch concentrates into ONE cell and |probes| ~ |residents| ~
    # |batch|, defeating the adaptive-k occupancy bound — identical
    # vectors land in one cell regardless of k): the gemm is chunked on
    # BOTH axes — 2048 probe rows x 4096 resident columns (probe bound
    # shared with x_embedding_neardup's cell kernel) — so the score
    # matrix is task-sized no matter how large the cell grows (the
    # probe-axis-only form still built 2048 x |residents| matrices,
    # ~700 MB peak at the measured 20k-resident flood; ADVICE r11), a
    # running per-probe (min dup_of, its cosine) carries across
    # resident chunks (in a NORMAL run dup_of values are unique per
    # cell — a history vector rests in one cell, an in-batch resident
    # in its one primary cell — and in ledger_dir REPLAY mode an
    # admitted batch vector can appear as a resident TWICE, from the
    # ledger and from the in-batch branch, possibly in different
    # chunks: both copies carry the identical embedding/nrm, so the
    # duplicate contributes an equal (dup_of, cosine) pair and the
    # strict-< running min keeps whichever arrived first — the
    # cross-chunk min is the chunked min of chunk mins either way;
    # r12 review pinned this invariant), and the candidate-selection
    # matrix is built only for rows that hit, not the whole chunk. The min-dup_of reduction happens INSIDE
    # the kernel — the gate only ever consumes the smallest verified
    # duplicate per probe, so emitting all matching pairs (quadratic in
    # a flood: every pair verifies at cosine ~1.0) would shuffle
    # O(batch^2) rows to compute an O(batch)-row groupBy. Per (cell,
    # probe) the kernel emits at most ONE row; (vec_id, dup_of)
    # candidates stay unique across cells, so the downstream global min
    # is unchanged.
    tau_ = float(tau)

    def verify(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": [], "dup_of": [], "cosine": []})
        if left.empty or right.empty:
            return empty
        i64max = np.iinfo(np.int64).max
        p = np.array(left["qe"].tolist(), dtype=np.float64)
        r = np.array(right["emb_old"].tolist(), dtype=np.float64)
        qn = left["qnrm"].to_numpy()
        rn = right["nrm_old"].to_numpy()
        vid = left["vec_id"].to_numpy()
        dof = right["dup_of"].to_numpy().astype(np.int64)
        outs = []
        for s in range(0, len(p), 2048):
            pe, ve, ne = p[s : s + 2048], vid[s : s + 2048], qn[s : s + 2048]
            best_dup = np.full(len(pe), i64max, dtype=np.int64)
            best_cos = np.zeros(len(pe), dtype=np.float64)
            for t in range(0, len(r), 4096):
                re_, de, dn = r[t : t + 4096], dof[t : t + 4096], rn[t : t + 4096]
                # threshold the RAW cosine (exactly like
                # x_embedding_neardup's WHERE-before-ROUND — a rounded
                # threshold would disagree with the exact pair join on
                # [tau - 0.00005, tau) pairs and break the
                # exhaustive-probe == exact contract); round HALF_UP
                # only for the reported value (ADVICE r2)
                cos = (pe @ re_.T) / np.outer(ne, dn)
                mask = (de[None, :] < ve[:, None]) & (cos >= tau_)
                hit = mask.any(axis=1)
                if not hit.any():
                    continue
                rows = np.nonzero(hit)[0]
                # per-row argmin of dup_of over matching columns, built
                # for the hit rows only
                dsel = np.where(mask[rows], de[None, :], i64max)
                jmin = dsel.argmin(axis=1)
                cmin = dsel[np.arange(len(rows)), jmin]
                upd = cmin < best_dup[rows]
                urows = rows[upd]
                best_dup[urows] = cmin[upd]
                best_cos[urows] = cos[urows, jmin[upd]]
            found = np.nonzero(best_dup < i64max)[0]
            if len(found):
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": ve[found],
                            "dup_of": best_dup[found],
                            "cosine": _np_round4(best_cos[found]),
                        }
                    )
                )
        return pd.concat(outs) if outs else empty

    verified = (
        probes.groupBy("cell")
        .cogroup(residents.groupBy("cell"))
        .applyInPandas(verify, "vec_id long, dup_of long, cosine double")
    )
    rejects = verified.groupBy("vec_id").agg(
        F.min("dup_of").alias("dup_of"),
        F.min_by("cosine", "dup_of").alias("cosine"),
    )
    return (
        batch.select("vec_id")
        .join(rejects, "vec_id", "left")
        .select(
            "vec_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
            "cosine",
        )
        .orderBy("vec_id")
    )


def compact_ann_ledger(
    spark: SparkSession, sf: str, nprobe: int = 4, tau: float = 0.45
) -> str:
    """Build (or reuse, session-cached per (sf, nprobe, tau)) the
    COMPACTED IVF ledger and return its directory — the worker behind
    :func:`x_ivf_compaction`, factored out so tests can replay the gate
    against the rebuilt layout via ``x_incremental_ann(...,
    ledger_dir=...)``. Steps: (1) run the ingest gate to disposition
    today's batch; (2) corpus = every vector minus the rejected batch
    (one anti join — history + admitted, exactly what the post-ingest
    ledger holds); (3) retrain the codebook with seed-pinned KMeans on
    a DETERMINISTIC hash-sample of the corpus (pmod(xxhash64(vec_id),
    n//65536) == 0 — partition-layout-independent, caps training at
    ~65536 vectors no matter the corpus size); (4) re-quantize the
    whole corpus against the new codebook (np_=1 — pure assignment,
    same gemm arithmetic as the gate's probe ranking) and rewrite the
    hive cell layout in one pass."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    out_dir, fresh = _cached_ledger_dir(f"ann_compact_np{nprobe}_tau{tau}", sf)
    if not fresh:
        return out_dir
    disp = x_incremental_ann(spark, sf, nprobe=nprobe, tau=tau)
    rejected = disp.filter(~F.col("kept")).select("vec_id")
    emb = load_table(spark, sf, "embeddings")
    vecs = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    # persist: feeds the count, the KMeans sample, the assignment map
    # AND the layout join below; unpersisted after the (eager) writes
    corpus = vecs.join(rejected, "vec_id", "left_anti").persist()
    n = corpus.count()  # bounded driver action: one scalar
    k2 = _adaptive_k(n)  # the gate's shared cell-count policy
    # CEIL, not floor: floor would let the expected sample drift up to
    # ~2x65536 just under each power-of-mod boundary (r12 review)
    mod = max(1, -(-n // 65536))
    train = corpus.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0
    ).select(array_to_vector("embedding").alias("features"))
    model = KMeans(k=k2, seed=42, maxIter=10).fit(train)
    cents = model.clusterCenters()
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    c_mat = np.array([[float(x) for x in c] for c in cents], dtype=np.float64)
    # payload assignment: the quantizer passes embedding/nrm THROUGH,
    # so the re-layout is one narrow map + exactly ONE shuffle (the
    # by-cell repartition) — no join back to the corpus, and the write
    # is CLUSTERED by cell (without the repartition every write task
    # holds rows of ~every cell and the hive write emits up to
    # tasks x k2 small files — the small-files problem
    # x_compaction_plan exists to fix, r12 review)
    (
        corpus.select("vec_id", "embedding", "nrm")
        .mapInPandas(
            _cell_quantizer(c_mat, 1, payload=True),
            "cell int, vec_id long, embedding array<double>, nrm double",
        )
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{out_dir}/cells")
    )
    _mark_ledger_built(out_dir)
    corpus.unpersist()
    return out_dir


@query(
    "x_ivf_compaction",
    oracle=None,  # rows-only: the compacted layout is KMeans geometry
    # (seed-pinned MLlib), no DuckDB twin — same determinism class as
    # x_incremental_ann; the contract is pinned by
    # tests/test_round12_ops.py::test_ivf_compaction_* (vector
    # conservation, exhaustive-replay equivalence with the pre-compaction
    # gate, recall non-degrading at the default nprobe).
    doc="IVF ledger compaction: retrain the codebook on a deterministic hash-sample of history + admitted batch, re-quantize and rewrite the hive cell layout in one pass — the day-end maintenance op that closes x_incremental_ann's codebook-drift loop; reports per-cell occupancy of the compacted ledger",
)
def x_ivf_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """Closes the codebook-drift loop x_incremental_ann's docstring
    defers: as history grows, the hist-trained centroids stale and cell
    occupancy skews, eroding both the probe recall and the adaptive-k
    occupancy bound. The day-end compactor retrains the codebook on a
    deterministic hash-sample of the POST-ingest corpus (history +
    admitted batch — rejected vectors are gone for good), re-quantizes
    every vector with the same gemm arithmetic the gate probes with,
    and rewrites the hive cell layout in one pass; tomorrow's ingest
    gates against the fresh geometry (``x_incremental_ann(...,
    ledger_dir=...)``). The ingest/compact split mirrors the
    reference's task lifecycle — tasks accumulate against a ledger
    between maintenance passes (ref internal/tasker/service.go:36-66)
    — generalized to the vector store.

    Equivalence contract (tests/test_round12_ops.py): the rebuilt
    ledger holds EXACTLY the original vectors (conservation — no loss,
    no dup, layout is pure re-partitioning), and with exhaustive
    probing a replayed batch gets the IDENTICAL disposition against
    the compacted ledger as against the original (geometry affects
    only which cells are probed, never the exact-cosine verdicts);
    at finite nprobe the corpus-trained codebook's recall is measured
    non-degrading vs the stale hist-trained one.

    100 TB design: retraining is capped at ~65536 sampled vectors by a
    partition-independent hash filter (KMeans cost is O(sample), never
    O(corpus)); the re-layout is the corpus's ONE full shuffle (by new
    cell, the hive write) — the honest, amortized cost of compaction,
    paid every N days so that every daily ingest between passes reads
    ~nprobe/k of history via plan-time pruning. The occupancy report
    returned here is metadata-sized (k2 <= 1024 rows) and is the
    operational signal for SCHEDULING the next pass (occupancy skew =
    drift). Nothing quadratic; the only driver actions are two scalars
    and the <= 1024-row codebook."""
    out_dir = compact_ann_ledger(spark, sf)
    cells = spark.read.parquet(f"{out_dir}/cells")
    cent = spark.read.parquet(f"{out_dir}/centroids")
    emb = load_table(spark, sf, "embeddings")
    split = (emb.agg(F.max("vec_id")).first()[0] + 1) // 2
    occ = cells.groupBy("cell").agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.when(F.col("vec_id") < split, 1).otherwise(0)).alias("n_hist"),
        F.sum(F.when(F.col("vec_id") >= split, 1).otherwise(0)).alias("n_admitted"),
    )
    return (
        cent.select("cell")
        .join(occ, "cell", "left")
        .fillna(0, ["n_vecs", "n_hist", "n_admitted"])
        .orderBy("cell")
    )


@query(
    "x_ann_overlay_search",
    # The READ path of the vector-store lifecycle (gate =
    # x_incremental_ann, GC = x_ivf_compaction), the embedding sibling
    # of x_index_overlay_search: serve cosine top-3 THROUGH the
    # base+delta overlay — the IVF ledger's cell layout with a
    # vec-grain tombstone ledger applied as an anti-join, plus the
    # gate's ADMITTED batch as a flat buffer scanned exhaustively (the
    # FAISS/Lucene delta model: new vectors are brute-forced until the
    # compactor folds them into cells) — without re-quantizing and
    # without waiting for compaction. Fixture conventions: queries =
    # vec_id < 10 (d44's), history < 250 (the gate's proportional
    # split at the driver SFs), tombstones vec_id % 7 == 3 (the
    # retraction family's deterministic-takedown modulus), admission
    # replayed at tau = 0.45 (x_embedding_neardup's threshold). The
    # default serve is EXHAUSTIVE (nprobe=None probes every cell), so
    # the oracle can pin overlay serving equal to exact top-k over the
    # surviving corpus — the overlay PLUMBING (tombstone anti-join,
    # delta union, admission replay) is what the hash checks; the
    # finite-nprobe production path reuses the gate's probe machinery
    # and is pinned by recall/pruning contracts in pytest.
    oracle="""
    WITH rej AS (
        SELECT DISTINCT b.vec_id
        FROM embeddings b JOIN embeddings a ON a.vec_id < b.vec_id
        WHERE b.vec_id >= 250
          AND list_sum(list_transform(list_zip(a.embedding, b.embedding),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                 * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              >= 0.45),
    surv AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE (vec_id < 250 AND vec_id % 7 <> 3)
           OR (vec_id >= 250 AND vec_id NOT IN (SELECT vec_id FROM rej))),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    pairs AS (
        SELECT q.qid, s.vec_id,
               list_sum(list_transform(list_zip(q.qe, s.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cosine
        FROM q JOIN surv s ON s.vec_id <> q.qid)
    SELECT qid, vec_id, CAST(ROUND(cosine, 4) AS DOUBLE) AS cosine
    FROM pairs
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY ROUND(cosine, 4) DESC, vec_id) <= 3
    """,
    doc="cosine top-3 served through the base+delta vector overlay (IVF cell ledger - vec tombstones + the gate's admitted flat buffer), pinned equal to exact top-k over the surviving corpus — vector search stays correct between compactions",
)
def x_ann_overlay_search(
    spark: SparkSession, sf: str, nprobe: int | None = None,
    topk: int = 3, tau: float = 0.45,
) -> DataFrame:
    """Why this op exists: the gate's O(cell-read) admissions and the
    retraction family's O(1) vec-grain tombstones are only a win if
    SEARCH can use them before the compactor runs. This is the vector
    twin of x_index_overlay_search (the Lucene read model, as FAISS
    deployments do it): the base is the IVF ledger's hive cell layout
    read with the tombstone ledger applied as a vec-keyed anti-join;
    the delta is the gate's admitted batch held in a FLAT buffer that
    every query scans exhaustively (quantizing delta vectors into
    cells is exactly the work compaction exists to batch up); the two
    sides union into one scoring pass. Serving equals a from-scratch
    rebuild of the surviving corpus — the oracle pins exactly that.

    Default nprobe=None serves EXHAUSTIVELY (every cell probed), which
    is what makes the driver fixture hash-checkable: at exhaustive
    probing the gate's admission is the exact earlier-wins rule (the
    recall suite's exhaustive == exact contract) and overlay top-k is
    exact top-k, both SQL-expressible. Finite nprobe is the production
    knob: queries quantize against the ledger codebook with the gate's
    own _cell_quantizer gemm, and the probed-cell set (<= k ints) is
    pushed as a LITERAL cell IN (...) onto the base read so the hive
    layout prunes at plan time (PartitionFilters — the gate's 100 TB
    story, pinned for this op by tests/test_round15_ann_overlay.py).
    The flat
    delta is scanned by every query in BOTH modes — that is the FAISS
    trade: the buffer stays small because compaction folds it in.

    100 TB shape: base candidates cost ~|queries| x nprobe x (cell
    occupancy) with the adaptive-k bound; delta candidates cost
    |queries| x |buffer| (bounded by compaction cadence, not corpus);
    the tombstone anti-join is vec-keyed against a metadata-sized
    takedown ledger (broadcast); top-k is a per-query window over a
    query-bounded candidate set. Nothing touches unprobed history. In
    production the admitted set is READ from the gate's disposition
    output rather than recomputed — the in-line replay here is fixture
    plumbing, same as every incremental op's history build."""
    ledger_dir = _ensure_ann_ledger(spark, sf)
    led_cells = spark.read.parquet(f"{ledger_dir}/cells")
    emb = load_table(spark, sf, "embeddings")
    vecs = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    split = (vecs.agg(F.max("vec_id")).first()[0] + 1) // 2

    # vec-grain tombstone ledger over history — the retraction family's
    # deterministic-takedown modulus, replayable by the oracle. The
    # gate ran at ingest time, BEFORE these takedowns, so admission
    # verdicts stand (a tombstoned history vector still rejected its
    # batch duplicates); only SERVING drops the tombstoned vectors.
    tombs = vecs.filter(
        (F.col("vec_id") < split) & (F.col("vec_id") % 7 == _RETRACT_RESIDUE)
    ).select("vec_id")

    # the delta buffer: the gate's ADMITTED batch. Exhaustive probing
    # (nprobe >= k after the clamp) makes the disposition exact, which
    # the oracle's rej CTE replays as "any earlier vector at >= tau".
    disp = x_incremental_ann(spark, sf, nprobe=1024, tau=tau)
    admitted = disp.filter(F.col("kept")).select("vec_id")
    delta = vecs.filter(F.col("vec_id") >= split).join(
        F.broadcast(admitted), "vec_id", "left_semi"
    )

    q = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )

    base = led_cells.select("vec_id", "embedding", "nrm").join(
        F.broadcast(tombs), "vec_id", "left_anti"
    )
    if nprobe is None:
        # exhaustive serve: every cell is a candidate source — the
        # oracle-checkable mode, and the recall ceiling the finite
        # path's contract measures against
        cand = base.unionByName(delta).join(
            F.broadcast(q), F.col("vec_id") != F.col("qid")
        )
    else:
        import numpy as np

        led_cent = spark.read.parquet(f"{ledger_dir}/centroids")
        # codebook to the driver: bounded by the clamp (<= 1024 x dim)
        cent_rows = led_cent.orderBy("cell").collect()
        c_mat = np.array([r.centroid for r in cent_rows], dtype=np.float64)
        np_ = min(int(nprobe), len(c_mat))
        # persist: feeds the probed-cell collect AND the per-query
        # probe join (the gate's probe_cells precedent); until-dropped,
        # bounded by |queries| rows
        pc = (
            q.select(F.col("qid").alias("vec_id"), F.col("qe").alias("embedding"))
            .mapInPandas(_cell_quantizer(c_mat, np_), "vec_id long, cell int, pr int")
            .persist()
        )
        # literal cell IN (...) pushed onto the hive layout so the scan
        # prunes at plan time (bounded driver action: <= k ints)
        probed = sorted(r.cell for r in pc.select("cell").distinct().collect())
        probes = pc.select(F.col("vec_id").alias("qid"), "cell")
        base_cand = (
            led_cells.filter(F.col("cell").isin(probed))
            .join(F.broadcast(tombs), "vec_id", "left_anti")
            # per-query restriction: a base vector is a candidate for
            # exactly the queries that probed its cell; a query's probe
            # cells are distinct and a vector rests in ONE cell, so no
            # (qid, vec_id) duplicates arise
            .join(F.broadcast(probes), "cell")
            .join(F.broadcast(q), "qid")
            .select("vec_id", "embedding", "nrm", "qid", "qe", "qnrm")
        )
        delta_cand = delta.join(F.broadcast(q), F.lit(True)).select(
            "vec_id", "embedding", "nrm", "qid", "qe", "qnrm"
        )
        cand = base_cand.unionByName(delta_cand).filter(
            F.col("vec_id") != F.col("qid")
        )
    cos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    scored = cand.select("qid", "vec_id", F.round(cos, 4).cast("double").alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@query(
    "d45_token_counts",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
    SELECT token, COUNT(*) AS n FROM tok GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """,
    doc="D-45 corpus token frequency top-20 (deterministic tiebreak on token)",
)
def d45_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@query(
    "x_doc_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_tokens,
           len(list_distinct(string_split(lower(text), ' '))) AS n_uniq_tokens,
           length(text) AS n_chars_text,
           n_chars,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_ish
    FROM documents
    """,
    doc="per-doc token counting: whitespace tokens + BPE-ish regex tokens, cross-checked against the n_chars column",
)
def x_doc_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = _tokens()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.length("text").alias("n_chars_text"),
        "n_chars",
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), F.lit(0))).alias("n_bpe_ish"),
    )


_LANG_MARKERS = {
    "en": ("the", "a", "of", "is"),
    "de": ("der", "und", "die", "nicht"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "et", "les", "des"),
}


@query(
    "x_langid",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(lower(text), ' '), t -> t IN ('the','a','of','is')))   AS s_en,
               len(list_filter(string_split(lower(text), ' '), t -> t IN ('der','und','die','nicht'))) AS s_de,
               len(list_filter(string_split(lower(text), ' '), t -> t IN ('el','la','los','que')))  AS s_es,
               len(list_filter(string_split(lower(text), ' '), t -> t IN ('le','et','les','des')))  AS s_fr
        FROM documents)
    SELECT doc_id, lang AS label_lang, s_en, s_de, s_es, s_fr,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    """,
    doc="heuristic language-ID via stopword-marker counts (deterministic argmax, priority en>de>es>fr)",
)
def x_langid(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = _tokens()
    def marker_count(markers: tuple[str, ...]) -> Column:
        # single-arg lambda: a second parameter would make PySpark pass the
        # element index as arg 2
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: marker_count(markers) for lang, markers in _LANG_MARKERS.items()}
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        *[scores[lang].alias(f"s_{lang}") for lang in _LANG_MARKERS],
    )
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_MARKERS}
    predicted = (
        F.when((s["en"] == 0) & (s["de"] == 0) & (s["es"] == 0) & (s["fr"] == 0), "unknown")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return scored.withColumn("predicted_lang", predicted)


@query(
    "x_quality_score",
    # quality = 0.4*min(n_tok/64,1) + 0.4*(n_uniq/n_tok) + 0.2*min(4*n_stop/n_tok,1),
    # evaluated as EXACT integer arithmetic over the common denominator
    # 640*n_tok, rounded half-up at 1e-4 with integer ops — float rounding
    # at a .00005 tie differs between engines, integers never do.
    oracle="""
    WITH stats AS (
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
               len(list_filter(string_split(lower(text), ' '),
                               t -> t IN ('the','a','of','is','and','to','in'))) AS n_stop
        FROM documents)
    SELECT doc_id,
           CAST(((4 * LEAST(n_tok, 64) * n_tok + 256 * n_uniq
                  + 128 * LEAST(4 * n_stop, n_tok)) * 10000 + 320 * n_tok)
                // (640 * n_tok) AS DOUBLE) / 10000 AS quality
    FROM stats
    """,
    doc="document quality score: length + lexical-diversity + stopword-ratio composite (training-data filtering)",
)
def x_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = _tokens()
    stops = ("the", "a", "of", "is", "and", "to", "in")
    stats = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.size(F.filter(toks, lambda t: t.isin(*stops))).cast("long").alias("n_stop"),
    )
    num = (
        4 * F.least(F.col("n_tok"), F.lit(64)) * F.col("n_tok")
        + 256 * F.col("n_uniq")
        + 128 * F.least(4 * F.col("n_stop"), F.col("n_tok"))
    )
    return stats.withColumn("num", num).selectExpr(
        "doc_id",
        # `div` = integer division; all terms positive so it equals floor
        "CAST((num * 10000 + 320 * n_tok) div (640 * n_tok) AS DOUBLE) / 10000 AS quality",
    )


@query(
    "x_deterministic_split",
    # content-hash bucketing -> train/val/test assignment that is stable
    # across runs, partitions, AND engines (never random()): the
    # canonical held-out-split primitive for training corpora. Bucket =
    # first 8 hex chars of md5(text) as an int, mod 100.
    oracle="""
    WITH b AS (
        SELECT doc_id, ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
        FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           min(doc_id) AS first_doc
    FROM b GROUP BY 1
    """,
    doc="deterministic train/val/test split by content hash (80/10/10): stable across runs, partitions, and engines",
)
def x_deterministic_split(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    bucket = md5_bucket("text", 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


# ---------------------------------------------------------------------------
# corpus hygiene: decontamination / repetition / PII
# ---------------------------------------------------------------------------


@query(
    "x_decontaminate",
    # benchmark decontamination (the GPT-3/PaLM pipeline step): flag
    # every training document that shares >= 1 word n-gram with the
    # held-out eval set. Eval set here = doc_id % 50 == 0 (synthetic,
    # deterministic); production uses 8-13-grams against the benchmark
    # suite — n is a knob, the join shape is the operator.
    oracle=f"""
    WITH {_NG_SQL},
    ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % 50 = 0)
    SELECT ng.doc_id, count(DISTINCT ng.g) AS n_shared
    FROM ng JOIN ev USING (g)
    WHERE ng.doc_id % 50 <> 0
    GROUP BY ng.doc_id
    """,
    doc="training-set decontamination: docs sharing any word n-gram with the eval set, with shared-gram counts",
)
def x_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-set n-gram overlap scan. The eval side (a benchmark suite)
    is tiny relative to a training corpus, so its distinct-gram set
    broadcasts and the scan is one corpus pass with a map-side hash
    probe — no shuffle of the training grams at all."""
    ng = doc_ngrams(spark, sf)
    ev = ng.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    return (
        ng.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
    )


_EVAL_TAU = 0.4


@query(
    "x_eval_contamination",
    # semantic (embedding-space) twin of x_decontaminate's n-gram scan,
    # aggregated in the OTHER direction: a per-EVAL-example contamination
    # report against the train corpus (how many train vectors sit above
    # tau, the max similarity reached, and the closest train id). The
    # n-gram scan answers "which train docs to drop"; this answers
    # "which eval examples are compromised" — the report an eval-suite
    # owner actually reads. Cosines are raw-double comparisons on both
    # sides (dot folded in array order is bit-identical across engines,
    # the x_embedding_neardup precedent); rounding only at the terminal
    # projection.
    oracle=f"""
    WITH ev AS (
        SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 16),
    tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 16),
    pairs AS (
        SELECT ev.qid, tr.vec_id,
               list_sum(list_transform(list_zip(ev.qe, tr.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(ev.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(tr.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cos
        FROM ev CROSS JOIN tr),
    agg AS (
        SELECT qid,
               CAST(SUM(CASE WHEN cos >= {_EVAL_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               MAX(cos) AS mc
        FROM pairs GROUP BY qid),
    best AS (
        SELECT qid, vec_id AS closest_train_id FROM pairs
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) = 1)
    SELECT a.qid AS eval_id, a.n_hits,
           CAST(ROUND(a.mc, 4) AS DOUBLE) AS max_cos, b.closest_train_id
    FROM agg a JOIN best b USING (qid)
    """,
    doc="per-eval-example contamination report vs the train corpus: broadcast eval suite, one corpus pass, map-side partial agg (exchange carries <= partitions x |eval| rows)",
)
def x_eval_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding decontamination in the eval->train direction.

    100 TB shape: the eval suite (here vec_id < 16; production ~10k
    benchmark examples) broadcasts with precomputed norms; the train
    corpus is scanned ONCE, each row scoring |eval| cosines map-side.
    The per-qid aggregate is partial BEFORE the exchange, so the only
    corpus-wide shuffle carries at most partitions x |eval| rows — the
    100 TB scan never re-materializes. Ties for the closest train
    vector break to the smallest vec_id via max(struct(cos, -vec_id)),
    matching the oracle's ORDER BY cos DESC, vec_id."""
    emb = load_table(spark, sf, "embeddings")
    e = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    ev = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    tr = e.filter(F.col("vec_id") >= 16)
    cos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    return (
        tr.join(F.broadcast(ev))
        .select("qid", "vec_id", cos.alias("cos"))
        .groupBy("qid")
        .agg(
            F.sum(F.when(F.col("cos") >= _EVAL_TAU, 1).otherwise(0)).alias("n_hits"),
            F.round(F.max("cos"), 4).cast("double").alias("max_cos"),
            (-F.max(F.struct(F.col("cos"), (-F.col("vec_id")).alias("nid")))["nid"])
            .alias("closest_train_id"),
        )
        .select(
            F.col("qid").alias("eval_id"), "n_hits", "max_cos", "closest_train_id"
        )
    )


@query(
    "x_repetition_filter",
    # Gopher-style repetition rule: docs whose duplicate-2-gram fraction
    # exceeds 20% are low-quality boilerplate. Emitted as exact integer
    # counts (n_grams, n_dup) + a boolean computed by integer cross-
    # multiplication — no float rounding to drift between engines.
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        FROM documents),
    ng2 AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS g
        FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
    agg AS (
        SELECT doc_id, count(*) AS n_grams,
               count(*) - count(DISTINCT g) AS n_dup
        FROM ng2 GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.n_grams, 0) AS n_grams,
           coalesce(a.n_dup, 0) AS n_dup,
           coalesce(a.n_dup * 5 > a.n_grams, false) AS flagged
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    doc="repetition quality filter: duplicate-2-gram fraction > 20% flags boilerplate (Gopher rule, exact integer arithmetic)",
)
def x_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks"))
    toks = F.col("toks")
    n_grams = F.greatest(F.size(toks) - 1, F.lit(0)).cast("long")
    n_dup = (n_grams - F.size(_ngrams(toks, 2)).cast("long")).alias("n_dup")
    return staged.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_dup,
    ).withColumn("flagged", F.col("n_dup") * 5 > F.col("n_grams"))


@query(
    "x_pii_scrub",
    # PII redaction: count + replace emails/phone patterns. The fixture
    # text carries no PII, so both engines first SEED identical
    # deterministic PII strings into a slice of docs (doc_id % 7 / % 11)
    # — the redaction regexes and the replacement are the operator under
    # test. Patterns use [0-9]/[a-z] classes only (identical semantics
    # in Java regex and RE2); DuckDB regexp_replace needs the 'g' flag
    # to match Spark's replace-all default.
    oracle="""
    WITH seeded AS (
        SELECT doc_id,
               text || CASE
                 WHEN doc_id % 7 = 0 THEN ' contact: user' || doc_id || '@example.com'
                 WHEN doc_id % 11 = 0 THEN ' tel: 555-01' || lpad((doc_id % 100)::VARCHAR, 2, '0')
                 ELSE '' END AS t
        FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9]+\\.[a-z]+')) AS n_emails,
           len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS n_phones,
           regexp_replace(regexp_replace(t, '[a-z0-9.]+@[a-z0-9]+\\.[a-z]+', '<EMAIL>', 'g'),
                          '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
    FROM seeded
    """,
    doc="PII scrubbing: email/phone detection counts + redacted text (regexp_extract_all / replace-all)",
)
def x_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact: user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            )
            .when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" tel: 555-01"), F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0")),
            )
            .otherwise(F.lit("")),
        ).alias("t"),
    )
    email = r"[a-z0-9.]+@[a-z0-9]+\.[a-z]+"
    phone = r"[0-9]{3}-[0-9]{4}"
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(email), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(phone), 0)).cast("long").alias("n_phones"),
        F.regexp_replace(F.regexp_replace("t", email, "<EMAIL>"), phone, "<PHONE>").alias("scrubbed"),
    )


@query(
    "x_domain_stats",
    # per-source (domain) corpus accounting — the aggregation behind
    # domain-level filtering/weighting decisions in a web-corpus
    # pipeline. Exact integer sums only; one hash-agg shuffle keyed on
    # the domain, map-side combined.
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents GROUP BY source
    """,
    doc="per-domain corpus stats: doc/token/char counts and language spread (domain filtering/weighting input)",
)
def x_domain_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens()).cast("long")).alias("n_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "x_mixture_sample",
    # deterministic data-mixture sampling: per-language keep rates
    # (en 100%, zh/es 50%, everything else 25%) applied by CONTENT-HASH
    # bucket, never random() — the sampling decision for a given doc is
    # stable across runs, partitions, and engines, so a re-run of the
    # pipeline reproduces the training mix bit-for-bit. Same md5-bucket
    # primitive as x_deterministic_split.
    oracle="""
    WITH b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
        FROM documents),
    kept AS (
        SELECT doc_id, lang FROM b
        WHERE bucket < CASE WHEN lang = 'en' THEN 100
                            WHEN lang IN ('zh', 'es') THEN 50
                            ELSE 25 END)
    SELECT lang, count(*) AS n_kept, min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM kept GROUP BY lang
    """,
    doc="deterministic per-language mixture sampling by content-hash bucket (reproducible training-mix weights)",
)
def x_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    bucket = md5_bucket("text", 100)
    rate = (
        F.when(F.col("lang") == "en", 100)
        .when(F.col("lang").isin("zh", "es"), 50)
        .otherwise(25)
    )
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_CC_ROUNDS_LOG: list[int] = []  # probe observability; see _min_label_cc


def _min_label_cc(pairs: DataFrame) -> DataFrame:
    """Connected components over an undirected pair list ``(doc_a,
    doc_b)`` via iterative min-label propagation — the standard
    large-scale CC: each round every node takes the min label among
    itself and its neighbors; converges in O(component diameter)
    rounds. Returns ``(doc, old_label, label)`` for every doc that
    appears in at least one pair — ``old_label`` is the final round's
    pre-update scratch column (r15: callers project ``(doc, label)``;
    the frame is returned un-projected so its persist stays visible to
    the callers that release it). Isolated docs are the caller's
    business — the recursive-CTE oracles only see docs reachable
    through an edge.

    Extracted from x_dedup_clusters (VERDICT r13 #1) so the dedup-
    cluster trio pays it ONCE through :func:`_ensure_cluster_base`
    instead of once per query. The per-round driver action is one
    scalar (changed-count) — the data never leaves the cluster.

    APPENDS the executed round count (fixpoint round included) to
    module-level ``_CC_ROUNDS_LOG`` — probe observability for the
    diameter-vs-data question: if round counts grow with scale, the
    large-star/small-star variant (O(log n) rounds) is owed; flat
    round counts mean the cost is per-round data volume, which
    decomposition/caching already addresses (VERDICT r13 #1). A log,
    not a scalar: one op can run several CCs (x_cluster_label_update:
    history + quotient) and warm-ledger calls run none — a clobbered
    scalar would mislead on both (r14 review).

    Raises if the 20-round cap is hit before fixpoint: a component
    with diameter > 20 would otherwise silently get non-minimal labels
    — wrong clusters with no error (r14 review). At that point the
    right fix is the large-star/small-star variant, and the error says
    so; every measured fixture/probe graph converges in <= 4 rounds
    (see the probe log in README round 14)."""
    # r15 (OPTIMIZATION round, guide §2.4/§1): one explode builds both
    # edge directions in a single evaluation of the caller's pair
    # subtree — the former two-branch union evaluated it twice inside
    # the persist-materializing first action (callers hand us join
    # pipelines, not scans; the retract path's was the whole
    # tombstone/touched filter chain)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")),
                    F.struct(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("doc_a"), F.col("e.d").alias("doc_b"))
        .persist()
    )
    labels = edges.select(F.col("doc_a").alias("doc"), F.col("doc_a").alias("label")).distinct()
    prev_cached = None
    for rnd in range(20):  # bound >> any real component diameter here
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # r15: carry the pre-round label through the SAME join that
        # computes the new one, so the per-round convergence check is a
        # filter over this materialization instead of a second
        # labels-join per round (guide §2.4 — the join result already
        # held both values; re-deriving the pairing was a free-standing
        # shuffle join each round)
        step = (
            labels.join(neighbor_min, labels.doc == neighbor_min.doc_a, "left")
            .select(
                "doc",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
            )
        )
        # every 5 rounds, truncate the accumulated join lineage: persist
        # keeps round N+1 from recomputing round N, but the logical plan
        # still deepens each round and deep components would blow
        # analysis/codegen time at real scale
        if rnd % 5 == 4:
            step = step.localCheckpoint(eager=True)
        else:
            step = step.persist()
        changed = step.filter(F.col("label") != F.col("old_label")).count()
        if prev_cached is not None and prev_cached.is_cached:
            prev_cached.unpersist()
        prev_cached = step
        # the returned frame keeps step's persist (is_cached True) so
        # callers can release it; consumers project (doc, label) and
        # never see the old_label scratch column
        labels = step
        if changed == 0:
            _CC_ROUNDS_LOG.append(rnd + 1)
            break
    else:
        edges.unpersist()
        # At the CURRENT cap (20, a multiple of the checkpoint cadence
        # 5) the final round's labels are always localCheckpointed:
        # is_cached is False for those (they live outside the cache
        # manager) and their blocks are released by the ContextCleaner
        # once this raise drops the last reference — so today there is
        # no persist leak on this path. The guard exists for the
        # persist case, which becomes reachable the moment the cap or
        # cadence changes (ADVICE r14; case precision: r15 review).
        if labels.is_cached:
            labels.unpersist()
        raise RuntimeError(
            "min-label CC did not reach fixpoint in 20 rounds — a "
            "component with diameter > 20; switch _min_label_cc to the "
            "large-star/small-star variant (O(log n) rounds) before "
            "raising the cap"
        )
    edges.unpersist()
    return labels


def _ensure_cluster_base(spark: SparkSession, sf: str) -> str:
    """Build (or reuse, session-cached per sf) the near-dup CLUSTER
    ledger shared by the dedup-cluster trio (x_dedup_clusters,
    x_neardup_survivors, x_dedup_report): ``pairs/`` — the exact
    n-gram-Jaccard >= 0.8 pair list (x_ngram_jaccard's output,
    materialized so the CC loop's per-round joins re-scan a columnar
    file instead of re-running the inverted-index self-join) — and
    ``labels/`` — the connected-component labels ``(doc_id,
    cluster_id)`` with cluster_id = min doc_id per component.

    VERDICT r13 #1: the trio previously re-ran candidate generation
    (and survivors the whole CC loop) independently — measured 28.5x /
    24.6x / 20.2x time on 20x data. The content is deterministic per
    sf (exact Jaccard, min-label CC), so the session-scoped reuse is a
    correctness no-op — same argument as :func:`_ensure_neardup_base`.
    At 100 TB this IS the production shape: a near-dup pass lands its
    pair list and cluster labels as tables once, and every downstream
    report / survivor policy / removal job reads them."""
    base, fresh = _cached_ledger_dir("cluster", sf)
    if fresh:
        x_ngram_jaccard(spark, sf).write.mode("overwrite").parquet(f"{base}/pairs")
        pairs = spark.read.parquet(f"{base}/pairs").select("doc_a", "doc_b")
        labels = _min_label_cc(pairs)
        labels.select(
            F.col("doc").alias("doc_id"), F.col("label").alias("cluster_id")
        ).write.mode("overwrite").parquet(f"{base}/labels")
        # the parquet write materialized everything downstream of the
        # loop's final persist — release it instead of leaving one
        # cached labels DF behind per session build (r14 review)
        if labels.is_cached:
            labels.unpersist()
        _mark_ledger_built(base)
    return base


@query(
    "x_dedup_clusters",
    # near-dup pairs -> connected components -> canonical survivor per
    # cluster. Spark side: iterative min-label propagation (the standard
    # large-scale CC: each round, every node takes the min label among
    # itself and its neighbors; converges in O(component diameter)
    # rounds). Oracle: recursive CTE transitive closure.
    oracle=f"""
    WITH RECURSIVE {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(doc, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc)
    SELECT doc AS doc_id, min(label) AS cluster_id,
           CAST(doc = min(label) AS BOOLEAN) AS is_survivor
    FROM reach GROUP BY doc
    """,
    doc="near-dup clustering: connected components over Jaccard>=0.8 pairs via iterative min-label propagation; survivor = min doc_id per cluster",
)
def x_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clustering over the shared cluster ledger
    (:func:`_ensure_cluster_base` — candidate pairs + min-label CC,
    built once per session and read by the whole dedup-cluster trio;
    VERDICT r13 #1 decomposition). The query itself is a narrow
    projection over the labels table."""
    base = _ensure_cluster_base(spark, sf)
    labels = spark.read.parquet(f"{base}/labels")
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
    )


@query(
    "x_neardup_survivors",
    # canonical selection: within each near-dup cluster keep the
    # HIGHEST-QUALITY doc (tie-break min doc_id), not the min-id doc —
    # the survivor policy a real corpus prep run wants. Quality uses
    # x_quality_score's exact-integer formula so the rank order is
    # engine-stable; cluster labels use x_dedup_clusters' recursive-CTE
    # closure.
    oracle=f"""
    WITH RECURSIVE {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(doc, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc),
    labels AS (SELECT doc AS doc_id, min(label) AS cluster_id FROM reach GROUP BY doc),
    qstats AS (
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
               len(list_filter(string_split(lower(text), ' '),
                               t -> t IN ('the','a','of','is','and','to','in'))) AS n_stop
        FROM documents),
    q AS (
        SELECT doc_id,
               CAST(((4 * LEAST(n_tok, 64) * n_tok + 256 * n_uniq
                      + 128 * LEAST(4 * n_stop, n_tok)) * 10000 + 320 * n_tok)
                    // (640 * n_tok) AS DOUBLE) / 10000 AS quality
        FROM qstats)
    SELECT l.doc_id, l.cluster_id, q.quality,
           (row_number() OVER (PARTITION BY l.cluster_id
                               ORDER BY q.quality DESC, l.doc_id) = 1) AS keep
    FROM labels l JOIN q ON q.doc_id = l.doc_id
    """,
    doc="near-dup canonical selection: keep the highest-quality doc per Jaccard cluster (quality-ranked survivor policy)",
)
def x_neardup_survivors(spark: SparkSession, sf: str) -> DataFrame:
    """The step after clustering that a corpus prep pipeline actually
    ships: per near-dup cluster, keep ONE doc chosen by quality (length
    + lexical diversity + stopword ratio), not by id accident.

    Scale shape: cluster labels are READ from the trio's shared ledger
    (_ensure_cluster_base — candidate pairs + min-label CC paid once
    per session, VERDICT r13 #1; previously this query re-ran both,
    measured 24.6x time on 20x data), quality is a narrow per-row
    projection, and the survivor pick is one window over cluster_id —
    a single keyed shuffle on top of the labels scan.
    """
    labels = x_dedup_clusters(spark, sf).select("doc_id", "cluster_id")
    q = x_quality_score(spark, sf).select("doc_id", "quality")
    ranked = labels.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), "doc_id")
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .select("doc_id", "cluster_id", "quality", (F.col("rn") == 1).alias("keep"))
    )


@query(
    "x_incremental_dedup",
    # the daily-ingest shape: dedup the NEW batch internally (keep min
    # doc_id per content hash), then anti-join against the historical
    # corpus's hash set — new rows never reshuffle old data, old data
    # contributes only its compact hash column.
    oracle="""
    WITH old AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
    batch AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 250
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
    SELECT b.doc_id, b.h AS content_hash
    FROM batch b LEFT JOIN old o ON b.h = o.h
    WHERE o.h IS NULL
    """,
    doc="incremental dedup: new batch self-dedup + anti-join vs historical hash set (the daily-pipeline ledger pattern, ref resource SET internal/core/resource.go:54-108)",
)
def x_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """At 100 TB the historical side is petabytes, but this plan only
    ever moves its HASH column (one narrow projection off the corpus
    scan — columnar pruning makes that cheap) and the new batch. The
    anti-join shuffles on the hash: both sides co-partition, no
    replication. This is the generalization of the reference's Redis
    SET membership test to content hashes at corpus scale."""
    docs = load_table(spark, sf, "documents")
    old_hashes = docs.filter(F.col("doc_id") < 250).select(F.md5("text").alias("content_hash")).distinct()
    batch = docs.filter(F.col("doc_id") >= 250).select("doc_id", F.md5("text").alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    batch_dedup = batch.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    return batch_dedup.join(old_hashes, "content_hash", "left_anti").select("doc_id", "content_hash")


def _apply_label_updates(old_labels: DataFrame, new_pairs: DataFrame) -> DataFrame:
    """Merge a batch of near-dup pairs into an existing cluster-label
    ledger WITHOUT re-clustering the history — the quotient-graph
    (union-find) update:

    1. contract: map each pair endpoint to its existing cluster label
       (unlabeled endpoints stand for themselves), so every old
       component collapses to its representative node;
    2. cluster the contracted graph — it is |batch-pairs|-sized, never
       corpus-sized, and components untouched by the batch never enter
       the loop;
    3. expand: members of a relabeled old cluster follow their
       representative; contracted nodes outside the ledger are new.

    Exactness: the labels equal a from-scratch CC over (old edges ∪
    new pairs). Old edges only connect nodes inside one old component,
    so contracting components preserves the union graph's
    connectivity; labels are component-minima, and each old rep IS its
    component's minimum, so the quotient minimum is the true minimum.

    Returns ``(doc_id, cluster_id, status)`` with status ∈ {'new',
    'relabeled', 'unchanged'} — the audit column an incremental
    pipeline logs. Generalizes the reference's ingest-accumulate SET
    lifecycle (internal/core/resource.go:54-88) to cluster labels,
    completing gate → compaction → label-maintenance for the near-dup
    family."""
    ma = old_labels.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("na"))
    mb = old_labels.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("nb"))
    contracted = (
        new_pairs.join(ma, "doc_a", "left")
        .join(mb, "doc_b", "left")
        .select(
            F.coalesce("na", "doc_a").alias("u"),
            F.coalesce("nb", "doc_b").alias("v"),
        )
        .select(F.least("u", "v").alias("doc_a"), F.greatest("u", "v").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    # qlab's final persist stays alive until the returned DataFrame is
    # dropped (the result reads it lazily, so an eager unpersist here
    # would force a recompute). It is QUOTIENT-sized — nodes bounded by
    # the batch's pair endpoints, never the corpus — the same bounded-
    # persist trade the d43 precedent documents (r14 review).
    qlab = _min_label_cc(contracted).select(
        F.col("doc").alias("node"), F.col("label").alias("qlabel")
    )
    updated_old = old_labels.join(
        qlab, old_labels.cluster_id == qlab.node, "left"
    ).select(
        "doc_id",
        F.coalesce("qlabel", "cluster_id").alias("new_cluster"),
        F.col("cluster_id").alias("old_cluster"),
    )
    # contracted nodes absent from the ledger: batch docs, plus history
    # docs that had no near-dup until this batch (the ledger never saw
    # them — they are 'new' to it, same as the oracle's NULL old label)
    newly = qlab.join(
        old_labels.select(F.col("doc_id").alias("node")), "node", "left_anti"
    ).select(
        F.col("node").alias("doc_id"),
        F.col("qlabel").alias("new_cluster"),
        F.lit(None).cast("long").alias("old_cluster"),
    )
    return (
        updated_old.unionByName(newly)
        .select(
            "doc_id",
            F.col("new_cluster").alias("cluster_id"),
            F.when(F.col("old_cluster").isNull(), F.lit("new"))
            .when(F.col("old_cluster") != F.col("new_cluster"), F.lit("relabeled"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


@query(
    "x_cluster_label_update",
    # Incremental cluster-label maintenance (VERDICT r13 #8): history =
    # docs < 250 with a pre-built label ledger; a batch of near-dup
    # pairs touching docs >= 250 arrives; labels are updated by
    # contracting old components to their representatives and
    # clustering only the batch-touched quotient graph. Oracle: the
    # result must equal FROM-SCRATCH clustering of the union — one
    # recursive CTE over all pairs for the final labels, a second over
    # history-only pairs for the status column.
    oracle=f"""
    WITH RECURSIVE {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(doc, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc),
    labels AS (SELECT doc AS doc_id, min(label) AS cluster_id FROM reach GROUP BY doc),
    old_edges AS (SELECT s, d FROM edges WHERE s < 250 AND d < 250),
    reach_old(doc, label) AS (
        SELECT s, s FROM old_edges
        UNION
        SELECT e.s, r.label FROM old_edges e JOIN reach_old r ON e.d = r.doc),
    old_labels AS (SELECT doc AS doc_id, min(label) AS old_cluster FROM reach_old GROUP BY doc)
    SELECT l.doc_id, l.cluster_id,
           CASE WHEN o.old_cluster IS NULL THEN 'new'
                WHEN o.old_cluster <> l.cluster_id THEN 'relabeled'
                ELSE 'unchanged' END AS status
    FROM labels l LEFT JOIN old_labels o ON o.doc_id = l.doc_id
    """,
    doc="incremental cluster-label maintenance: a batch of near-dup pairs merges into the persisted label ledger via quotient-graph CC over touched components only, pinned equal to from-scratch clustering of the union (the union-find ledger update, VERDICT r13 #8)",
)
def x_cluster_label_update(spark: SparkSession, sf: str) -> DataFrame:
    """The lifecycle op the near-dup family was missing: the gate
    (x_incremental_neardup) admits a batch and emits its near-dup
    pairs, the compactor (x_neardup_compaction) GCs the signature
    ledger — and this op folds the batch's pairs into the CLUSTER
    LABEL ledger without re-running CC over the history.

    100 TB shape: the contracted graph handed to the CC loop is
    batch-sized (one pair per admitted near-dup edge, components
    contracted to single nodes), so label maintenance costs
    O(batch + touched components) regardless of corpus size; the
    history contributes exactly two narrow joins against the ledger
    (endpoint mapping + representative expansion), both keyed on the
    label column a real deployment would bucket by. Re-running
    x_dedup_clusters from scratch — the alternative this op exists to
    avoid — re-pays the full candidate join plus a corpus-wide CC
    whose round count tracks the LARGEST component diameter, not the
    batch's.

    Fixture plumbing: the pair list comes from the trio's shared
    cluster ledger (_ensure_cluster_base — already materialized once
    per session), split at the registry's standard history boundary
    (doc_id < 250, same as x_incremental_dedup/x_incremental_neardup);
    the history ledger is the min-label CC of the old-old pairs,
    session-cached like every persisted-ledger fixture. In production
    the batch pairs arrive from the ingestion gate's
    admitted-candidates output and the history ledger is yesterday's
    labels table — nothing here recomputes history."""
    base = _ensure_cluster_base(spark, sf)
    pairs = spark.read.parquet(f"{base}/pairs").select("doc_a", "doc_b")
    old_dir, fresh = _cached_ledger_dir("clusterold", sf)
    if fresh:
        # doc_a < doc_b, so doc_b < 250 bounds both endpoints
        hist = _min_label_cc(pairs.filter(F.col("doc_b") < 250))
        hist.select(
            F.col("doc").alias("doc_id"), F.col("label").alias("cluster_id")
        ).write.mode("overwrite").parquet(f"{old_dir}/labels")
        if hist.is_cached:  # release the loop's final persist (r14 review)
            hist.unpersist()
        _mark_ledger_built(old_dir)
    old_labels = spark.read.parquet(f"{old_dir}/labels")
    new_pairs = pairs.filter(F.col("doc_b") >= 250)
    return _apply_label_updates(old_labels, new_pairs)


def _retract_labels(
    old_labels: DataFrame, pairs: DataFrame, tomb: DataFrame
) -> DataFrame:
    """Retract a tombstone set from a cluster-label ledger WITHOUT
    re-clustering the corpus — the split-capable complement of
    :func:`_apply_label_updates` (VERDICT r14 #1). Merge-only quotient
    contraction cannot express retraction: removing an articulation
    doc SPLITS its component. Steps:

    1. touch: components holding >= 1 tombstoned doc (semi-join the
       ledger against the tombstones, distinct labels — broadcast,
       retractions are rare relative to the corpus);
    2. localized re-CC: pull ONLY the touched components' pairs from
       the pair ledger (a pair's endpoints share a component, so
       membership via ``doc_a`` suffices), drop pairs with a
       tombstoned endpoint, re-run :func:`_min_label_cc` on that
       bounded subgraph;
    3. passthrough: untouched components keep their labels verbatim —
       they never enter the CC loop (pinned by the sentinel-label
       test in tests/test_round15_ops.py: wrong-on-purpose untouched
       labels survive, which a corpus-wide re-CC would have fixed).

    Exactness vs from-scratch CC over the surviving pairs: edge
    removal never CONNECTS components, so the surviving pair list
    partitions into untouched components' pairs (byte-unchanged) and
    touched components' surviving pairs; CC labels are a
    per-component function of that component's own edges, and an
    untouched component's min doc cannot be tombstoned (it would be
    touched) — so both sides agree componentwise. The DuckDB oracle
    on x_cluster_label_retract pins exactly this equality.

    Returns ``(doc_id, cluster_id, status)`` over every doc in the
    OLD ledger — the audit a takedown/recrawl batch logs: status ∈
    {'retracted' (tombstoned; cluster_id NULL), 'isolated' (survives
    but lost its every edge, leaves the pair ledger; cluster_id
    NULL), 'relabeled' (its component split or lost its min doc),
    'unchanged'}.

    100 TB shape: cost is O(tombstones + touched components) — two
    broadcast semi/anti-joins over the ledger plus a CC whose input
    is the touched subgraph, never the corpus; the untouched history
    is a filter-only passthrough a real deployment wouldn't even
    rewrite (partition-preserving no-op). The from-scratch
    alternative re-pays the full candidate join plus a corpus-wide
    CC per takedown batch."""
    # distinct: a real takedown/TTL feed can deliver the same doc_id
    # twice (retry, overlapping sources); without it the left join at
    # the status stage would fan out duplicate 'retracted' rows and
    # break the one-row-per-ledger-doc audit invariant (r15 review)
    # r15 (OPTIMIZATION round, guide §5): tomb_docs / touched /
    # touched_docs are each consumed 2-4 times (semi/anti filters, the
    # status join, the CC input) and are bounded BY DESIGN — tombstone
    # batch and touched components, never the corpus — so persist them
    # once instead of re-running the filter chain per consumer; the
    # persists live until the returned DataFrame is dropped, the same
    # bounded trade relab documents below. Measured on the sf0.1
    # fixture the re-evaluations were most of the op's wall clock
    # (every consumer re-paid the broadcast-join pipeline).
    tomb_docs = tomb.select("doc_id").distinct().persist()  # until-dropped
    touched = (
        old_labels.join(F.broadcast(tomb_docs), "doc_id", "left_semi")
        .select("cluster_id")
        .distinct()
        .persist()  # until-dropped; see the block note above
    )
    untouched = old_labels.join(
        F.broadcast(touched), "cluster_id", "left_anti"
    ).select("doc_id", "cluster_id", F.lit("unchanged").alias("status"))
    touched_docs = old_labels.join(
        F.broadcast(touched), "cluster_id", "left_semi"
    ).persist()  # until-dropped; see the block note above
    sub_pairs = pairs.join(
        touched_docs.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    )
    surv_pairs = (
        sub_pairs.join(
            F.broadcast(tomb_docs.select(F.col("doc_id").alias("doc_a"))),
            "doc_a",
            "left_anti",
        )
        .join(
            F.broadcast(tomb_docs.select(F.col("doc_id").alias("doc_b"))),
            "doc_b",
            "left_anti",
        )
        .select("doc_a", "doc_b")
    )
    # relab's final persist stays alive until the returned DataFrame is
    # dropped (lazy read — same bounded, subgraph-sized trade as
    # _apply_label_updates' qlab, r14 review). Tombstoned docs never
    # appear in it: surv_pairs excludes their every edge.
    relab = _min_label_cc(surv_pairs).select(
        F.col("doc").alias("doc_id"), F.col("label").alias("new_cluster")
    )
    touched_out = (
        touched_docs.join(
            F.broadcast(tomb_docs.withColumn("is_tomb", F.lit(True))),
            "doc_id",
            "left",
        )
        .join(relab, "doc_id", "left")
        .select(
            "doc_id",
            F.col("new_cluster").alias("cluster_id"),
            F.when(F.col("is_tomb"), F.lit("retracted"))
            .when(F.col("new_cluster").isNull(), F.lit("isolated"))
            .when(F.col("new_cluster") != F.col("cluster_id"), F.lit("relabeled"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
    return untouched.unionByName(touched_out)


_RETRACT_RESIDUE = 3  # deterministic takedown stand-in: doc_id % 7 == 3
# (portable to the DuckDB oracle, unlike the band compactor's
# xxhash64-pmod rule — that op is rows-only, this one is hash-pinned)


@query(
    "x_cluster_label_retract",
    # Retraction/split maintenance (VERDICT r14 #1): tombstone ledger
    # docs with doc_id % 7 == 3, re-CC ONLY the tombstone-touched
    # components over their surviving pairs, pass every other
    # component through verbatim. Oracle: the result must equal
    # FROM-SCRATCH clustering of the SURVIVING pairs — one recursive
    # CTE over all pairs for the old labels (status + row universe), a
    # second over surviving pairs for the new labels — the same
    # double-CTE pattern that pins x_cluster_label_update.
    oracle=f"""
    WITH RECURSIVE {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(doc, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc),
    old_labels AS (SELECT doc AS doc_id, min(label) AS old_cluster FROM reach GROUP BY doc),
    surv_pairs AS (
        SELECT doc_a, doc_b FROM pairs
        WHERE doc_a % 7 <> 3 AND doc_b % 7 <> 3),
    surv_edges AS (
        SELECT doc_a AS s, doc_b AS d FROM surv_pairs
        UNION ALL SELECT doc_b, doc_a FROM surv_pairs),
    reach_new(doc, label) AS (
        SELECT s, s FROM surv_edges
        UNION
        SELECT e.s, r.label FROM surv_edges e JOIN reach_new r ON e.d = r.doc),
    new_labels AS (SELECT doc AS doc_id, min(label) AS cluster_id FROM reach_new GROUP BY doc)
    SELECT o.doc_id, n.cluster_id,
           CASE WHEN o.doc_id % 7 = 3 THEN 'retracted'
                WHEN n.cluster_id IS NULL THEN 'isolated'
                WHEN n.cluster_id <> o.old_cluster THEN 'relabeled'
                ELSE 'unchanged' END AS status
    FROM old_labels o LEFT JOIN new_labels n ON n.doc_id = o.doc_id
    """,
    doc="cluster-label retraction: tombstoned docs leave the near-dup label ledger via localized re-CC over tombstone-touched components only (splits included — the maintenance the merge-only quotient update cannot express), pinned equal to from-scratch clustering of the surviving pairs",
)
def x_cluster_label_retract(spark: SparkSession, sf: str) -> DataFrame:
    """Closes the near-dup label LIFECYCLE (VERDICT r14 #1): the gate
    (x_incremental_neardup) admits batches, x_cluster_label_update
    folds their pairs into the label ledger (merge-only), the band
    compactor (x_neardup_compaction) tombstones docs out of the
    SIGNATURE ledger — but until now nothing could take a tombstone
    out of the LABEL ledger, and removing an articulation doc must
    SPLIT its component, which quotient-graph contraction cannot
    express. This op is that missing maintenance pass: localized
    re-CC over tombstone-touched components only (the bounded
    subgraph read back from the cluster ledger's pairs/), everything
    else a verbatim passthrough — see :func:`_retract_labels` for the
    componentwise-exactness argument and the 100 TB cost shape.

    Fixture plumbing: ledger = the trio's shared cluster ledger
    (_ensure_cluster_base, already materialized once per session);
    tombstones = ledger docs with ``doc_id % 7 == 3`` — the band
    compactor's deterministic-takedown convention, with a modulus
    rule portable to the DuckDB oracle in place of its Spark-only
    xxhash64 pmod. In production the tombstones arrive from the same
    takedown/TTL feed x_neardup_compaction consumes, so one retraction
    batch maintains both ledgers."""
    base = _ensure_cluster_base(spark, sf)
    pairs = spark.read.parquet(f"{base}/pairs").select("doc_a", "doc_b")
    old_labels = spark.read.parquet(f"{base}/labels")
    tomb = old_labels.filter(
        F.col("doc_id") % 7 == _RETRACT_RESIDUE
    ).select("doc_id")
    return _retract_labels(old_labels, pairs, tomb)


def band_signatures(
    sets: DataFrame, k: int = _MINHASH_K, bands: int = _BANDS
) -> DataFrame:
    """Flat (doc_id, band, bh) MinHash band signatures — the LEDGER
    shape: one row per (doc, band), persistable as an append-only table
    keyed by (band, bh). This is THE banding definition:
    :func:`lsh_candidates` builds its buckets from this relation, so
    "two docs collide in the ledger iff they collide in d43's buckets"
    holds structurally rather than by keeping two expression copies in
    sync (r10 review)."""
    if k % bands:
        raise ValueError(f"minhash k={k} must be divisible by bands={bands}")
    rows = k // bands
    band_structs = F.expr(
        f"transform(sequence(0, {bands - 1}), b -> named_struct("
        f"'band', b, "
        f"'bh', xxhash64(transform(sequence(b * {rows}, (b + 1) * {rows} - 1), "
        f"s -> array_min(transform(hs, h -> xxhash64(s, h)))))))"
    )
    return sets.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


_LEDGER_DIRS: dict[str, str] = {}


def _cached_ledger_dir(kind: str, sf: str) -> tuple[str, bool]:
    """Session-scoped tempdir for a persisted-ledger fixture.

    Returns ``(path, fresh)``: one uid-private dir per (kind, sf) for
    the life of the interpreter, registered for cleanup at exit exactly
    once. ``fresh`` is True until the caller confirms a successful
    build via :func:`_mark_ledger_built` — freshness is decided by an
    on-disk sentinel, NOT by dict membership, so a build that dies
    midway (KMeans OOM, a failed parquet write, Ctrl-C) is retried on
    the next call instead of poisoning every later read in the session
    with a partial dir (round-11 review). The dir itself is still
    reused across calls so repeated invocations in a long-lived session
    don't accumulate dirs or atexit entries (ADVICE r10)."""
    import atexit
    import os
    import shutil
    import tempfile

    key = f"{kind}:{sf}"
    if key not in _LEDGER_DIRS:
        d = tempfile.mkdtemp(prefix=f"chyme_{kind}_ledger_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _LEDGER_DIRS[key] = d
    d = _LEDGER_DIRS[key]
    return d, not os.path.exists(os.path.join(d, ".built"))


def _require_built(ledger_dir: str, what: str) -> None:
    """Fail fast when a caller-provided ledger dir lacks the ``.built``
    sentinel (r12 advice; shared by every ledger-replay gate so the
    validation has one point of change — r13 review): a stale, partial,
    or wrong path would otherwise silently become the gate's geometry
    or surface as an opaque parquet-read error deep in the plan. The
    sentinel is what :func:`_mark_ledger_built` stamps after the eager
    writes, so its absence means "not a ledger"."""
    import os

    if not os.path.exists(os.path.join(ledger_dir, ".built")):
        raise ValueError(
            f"ledger_dir={ledger_dir!r} has no .built sentinel — not a "
            f"completed {what}"
        )


def _mark_ledger_built(ledger_dir: str) -> None:
    """Record that a ledger build completed — see _cached_ledger_dir."""
    import os

    with open(os.path.join(ledger_dir, ".built"), "w") as fh:
        fh.write("ok\n")


def _ensure_neardup_base(spark: SparkSession, sf: str, sets: DataFrame | None = None) -> str:
    """Build (or reuse, session-cached per sf) the BASE MinHash band
    ledger for the gate's fixed history side (doc_id < 250): the band
    index (doc_id, band, bh) plus the signature store (doc_id, hs, n).
    One uid-private (0700) tempdir per (kind, sf) for the life of the
    interpreter (_cached_ledger_dir): removal is deferred to exit
    because consumers lazily READ the ledger — eager cleanup would race
    them — and repeated calls (bench rotations, test suites) REUSE the
    dir instead of leaking one dir + one atexit entry per call (ADVICE
    r10). The content is deterministic per sf, so reuse is also a
    correctness no-op. Shared by the ingestion gate (builds when no
    ledger_dir is passed) and x_neardup_compaction (the maintenance
    pass reads it as the pre-compaction state)."""
    ledger_dir, fresh = _cached_ledger_dir("neardup", sf)
    if fresh:
        if sets is None:
            sets = doc_shingle_sets(spark, sf)
        hist_sets = sets.filter(F.col("doc_id") < 250)
        band_signatures(hist_sets).write.mode("overwrite").parquet(f"{ledger_dir}/bands")
        hist_sets.write.mode("overwrite").parquet(f"{ledger_dir}/sets")
        _mark_ledger_built(ledger_dir)
    return ledger_dir


@query(
    "x_incremental_neardup",
    oracle=None,  # rows-only: the MinHash banding (xxhash64 seeds) has
    # no DuckDB twin, same as d43; the contract is pinned by
    # tests/test_llm_recall.py::test_incremental_neardup_* (soundness
    # vs exact Jaccard, recall vs offline d43 on the union, and
    # batch==offline bucket agreement).
    doc="incremental NEAR-dup dedup: new batch banded + joined against a persisted MinHash band-signature ledger of the historical corpus (plus in-batch LSH self-dedup), exact-Jaccard verified — the daily-crawl ingestion gate",
)
def x_incremental_neardup(
    spark: SparkSession, sf: str, ledger_dir: str | None = None
) -> DataFrame:
    """The near-dup sibling of x_incremental_dedup: yesterday's corpus
    is represented by a PERSISTED ledger — two append-only parquet
    relations, the band index (doc_id, band, bh) and the signature
    store (doc_id, hs, n) — and today's batch is admitted or rejected
    without ever reshuffling historical text. Rejection rule is
    earlier-doc-wins, mirroring the exact sibling's min-id survivor:
    a batch doc is rejected when exact Jaccard >= tau against (a) any
    ledger doc colliding with it in some band, or (b) any LOWER-id
    batch doc surfaced by in-batch LSH (lsh_candidates). Output is the
    full batch disposition: (doc_id, kept, dup_of = smallest verified
    duplicate, jaccard to it). Greedy-by-id is deliberately NOT the
    clustered survivor policy — x_neardup_survivors is the offline
    clustering pass; an ingestion gate must decide per doc, online.

    100 TB design: the ledger join moves only 24-byte (band, bh,
    doc_id) rows and the batch's band signatures — history's text and
    shingle sets stay at rest; the verify step fetches ONLY the
    colliding ledger signatures (equi-join on doc_id against the
    signature store, pushed to its scan). In-batch candidates reuse
    d43's bucket machinery with its star cap. Each day appends the
    admitted docs' bands + signatures to the ledger; nothing is ever
    rewritten (the reference's Redis SET membership gate,
    internal/core/resource.go:54-108, generalized to similarity).
    Empty-shingle docs (shorter than the gram width) collide in every
    band but verify to null Jaccard and are kept — a length gate
    belongs upstream (x_gopher_rules).

    r13: ``ledger_dir=`` replays today's batch against a MAINTAINED
    ledger (x_neardup_compaction's tombstone/GC rewrite) instead of
    the freshly-built one — the same maintenance loop as the ANN
    sibling's ``ledger_dir=``; the dir must carry the ``.built``
    sentinel (same fail-fast rule)."""
    # until-dropped (the d43 staging analog; x_tpch_q15 convention)
    sets = doc_shingle_sets(spark, sf).persist()
    batch_sets = sets.filter(F.col("doc_id") >= 250)

    if ledger_dir is not None:
        _require_built(
            ledger_dir,
            "band ledger (build one via the default path or "
            "x_neardup_compaction)",
        )
    if ledger_dir is None:
        ledger_dir = _ensure_neardup_base(spark, sf, sets)
    led_bands = spark.read.parquet(f"{ledger_dir}/bands")
    led_sets = spark.read.parquet(f"{ledger_dir}/sets")

    # --- candidates: batch x ledger (band-hash equi-join) -------------
    cand_hist = (
        band_signatures(batch_sets)
        .join(
            led_bands.select("band", "bh", F.col("doc_id").alias("dup_of")),
            ["band", "bh"],
        )
        .select("doc_id", "dup_of")
        .distinct()
    )
    # --- candidates: batch x batch (in-batch LSH, earlier id wins) ----
    cand_batch = lsh_candidates(batch_sets).select(
        F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("dup_of")
    )

    # --- exact-Jaccard verify -----------------------------------------
    new_side = batch_sets.select(
        F.col("doc_id"), F.col("hs").alias("hs_new"), F.col("n").alias("n_new")
    )
    old_side = (
        led_sets.select(
            F.col("doc_id").alias("dup_of"), F.col("hs").alias("hs_old"),
            F.col("n").alias("n_old"),
        )
        .unionByName(
            batch_sets.select(
                F.col("doc_id").alias("dup_of"), F.col("hs").alias("hs_old"),
                F.col("n").alias("n_old"),
            )
        )
    )
    inter = F.size(F.array_intersect(F.col("hs_new"), F.col("hs_old")))
    jac = inter * 1.0 / (F.col("n_new") + F.col("n_old") - inter)
    verified = (
        cand_hist.unionByName(cand_batch)
        .join(new_side, "doc_id")
        .join(old_side, "dup_of")
        .select("doc_id", "dup_of", F.round(jac, 4).cast("double").alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_TAU)
    )
    rejects = verified.groupBy("doc_id").agg(
        F.min("dup_of").alias("dup_of"),
        F.min_by("jaccard", "dup_of").alias("jaccard"),
    )
    return (
        batch_sets.select("doc_id")
        .join(rejects, "doc_id", "left")
        .select(
            "doc_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
            "jaccard",
        )
        .orderBy("doc_id")
    )


def compact_neardup_ledger(spark: SparkSession, sf: str, retract_mod: int = 7) -> str:
    """Build (or reuse, session-cached per (sf, retract_mod)) the
    COMPACTED band ledger: apply a deterministic retraction set to the
    base ledger — history docs with ``pmod(xxhash64(doc_id),
    retract_mod) == 0`` stand in for takedowns/TTL expiry — and rewrite
    both relations without them, clustered by band. Returns its dir.

    The write path is the maintenance story the gate's docstring
    defers: the DAILY path only appends (bands, signatures) and
    tombstones; this pass is the periodic GC that makes retraction
    real — until it runs, a tombstoned doc's bands still collide with
    every future batch and its signature still wins verifies. Steps:
    (1) tombstones = the retraction set, written into the compacted dir
    as the audit relation; (2) bands/sets are anti-joined against it —
    a filter-only rewrite, NO shuffle except (3) the by-band
    repartition so the band index lands one file per band (the ANN
    compactor's one-file-per-cell rule: without it every write task
    holds rows of every band and the layout fragments)."""
    out_dir, fresh = _cached_ledger_dir(f"neardup_compact_m{retract_mod}", sf)
    if not fresh:
        return out_dir
    base = _ensure_neardup_base(spark, sf)
    led_bands = spark.read.parquet(f"{base}/bands")
    led_sets = spark.read.parquet(f"{base}/sets")
    tomb = led_sets.select("doc_id").filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(retract_mod)) == 0
    )
    tomb.write.mode("overwrite").parquet(f"{out_dir}/tombstones")
    tombstones = spark.read.parquet(f"{out_dir}/tombstones")
    (
        led_bands.join(tombstones, "doc_id", "left_anti")
        .repartition("band")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(f"{out_dir}/bands")
    )
    led_sets.join(tombstones, "doc_id", "left_anti").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/sets")
    _mark_ledger_built(out_dir)
    return out_dir


@query(
    "x_neardup_compaction",
    oracle=None,  # rows-only: the band index is xxhash64 MinHash
    # geometry (no DuckDB twin, same class as d43 / x_incremental_
    # neardup); the contract is pinned by tests/test_round13_ops.py::
    # test_neardup_compaction_* (conservation, replay equivalence with
    # a scratch-built surviving-history ledger, retraction soundness,
    # one-file-per-band layout).
    doc="MinHash band-ledger compaction: tombstone a deterministic retraction set, GC both ledger relations (anti-join, filter-only), rewrite the band index clustered one-file-per-band — the maintenance op that makes retraction real for x_incremental_neardup; reports per-band occupancy",
)
def x_neardup_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """Closes the retraction loop x_incremental_neardup's docstring
    defers ("nothing is ever rewritten") — the MinHash sibling of
    x_ivf_compaction, completing the maintenance symmetry the r12
    verdict proposed: every persisted-ledger gate now has its periodic
    rewrite pass. Until this runs, a retracted doc keeps colliding
    with (and rejecting) every future batch doc near it; after it, the
    gate replayed with ``ledger_dir=`` behaves exactly as if the
    retracted docs had never been ingested. The ingest/compact split
    mirrors the reference's resource lifecycle — SAdd accumulates SET
    membership on ingest while removal is a separate pass (SPopN, ref
    internal/core/resource.go:54-88) — generalized from exact URL
    membership to similarity ledgers.

    Equivalence contract (tests/test_round13_ops.py): the compacted
    relations hold EXACTLY the base ledger's rows minus the
    tombstoned docs' (conservation — GC is pure filtering, never
    recomputation, so surviving signatures stay bit-identical), and a
    replayed batch gets the IDENTICAL disposition against the
    compacted ledger as against a ledger built from scratch on the
    surviving history. Per doc, retraction can only admit or raise
    dup_of (the min over a smaller verified set) — asserted
    row-for-row.

    100 TB design: tombstoning is metadata-sized and append-only (the
    daily path); the GC pass is TWO anti-joins that broadcast the
    tombstone set (retractions are rare relative to the corpus) and
    stream the ledger through a filter — no recomputation of shingles,
    minhashes, or band hashes, because retraction cannot change a
    SURVIVING doc's signature (unlike the ANN compactor, which must
    re-quantize: codebook geometry is global, band hashing is
    per-doc). The only shuffle is the by-band clustering of the
    rewritten index, the same honest re-layout cost as the ANN
    sibling's by-cell write. The occupancy report is bands-sized
    (metadata) and is the scheduling signal: tombstone fraction per
    band = reclaimable collision traffic."""
    out_dir = compact_neardup_ledger(spark, sf)
    base = _ensure_neardup_base(spark, sf)
    before = (
        spark.read.parquet(f"{base}/bands")
        .groupBy("band")
        .agg(F.count("*").alias("n_before"))
    )
    after = (
        spark.read.parquet(f"{out_dir}/bands")
        .groupBy("band")
        .agg(F.count("*").alias("n_after"))
    )
    return (
        before.join(after, "band", "left")
        .fillna(0, ["n_after"])
        .select(
            "band",
            "n_before",
            "n_after",
            (F.col("n_before") - F.col("n_after")).alias("n_tombstoned"),
        )
        .orderBy("band")
    )


@query(
    "x_tfidf",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS nd FROM documents)
    SELECT t.doc_id, t.token,
           CAST(ROUND(t.tf * ln(n.nd * 1.0 / d.df), 4) AS DOUBLE) AS tfidf
    FROM tf t JOIN dfreq d USING (token) CROSS JOIN n
    WHERE t.doc_id < 20
    QUALIFY row_number() OVER (PARTITION BY t.doc_id
                               ORDER BY ROUND(t.tf * ln(n.nd * 1.0 / d.df), 4) DESC, t.token) <= 3
    """,
    doc="TF-IDF top-3 terms per doc (first 20 docs): tf x ln(N/df), the classic relevance weighting for corpus analysis",
)
def x_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks"))
    tok = staged.select("doc_id", F.explode("toks").alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    nd = docs.agg(F.count("*").alias("nd"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(F.col("nd") * 1.0 / F.col("df")), 4)
            .cast("double")
            .alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).drop("rn")


@query(
    "x_fingerprint",
    oracle=f"""
    WITH {_NG_SQL}
    SELECT doc_id,
           min(md5(g)) AS fp_min,
           max(md5(g)) AS fp_max,
           count(*) AS n_shingles
    FROM ng GROUP BY doc_id
    """,
    doc="document fingerprint: min/max shingle digest (winnowing-style content signature)",
)
def x_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    ng = doc_ngrams(spark, sf)
    return ng.groupBy("doc_id").agg(
        F.min(F.md5("g")).alias("fp_min"),
        F.max(F.md5("g")).alias("fp_max"),
        F.count("*").alias("n_shingles"),
    )


_WINNOW_K = 5  # tokens per gram (the repo's 5-gram convention)
_WINNOW_W = 4  # grams per winnowing window


@query(
    "x_winnowing_fingerprint",
    # Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
    # algorithm, public): hash every positional k-gram, slide a window
    # of w hashes, select each window's MINIMUM — any two documents
    # sharing a token run of >= w+k-1 are GUARANTEED to share a selected
    # fingerprint, while the index holds only ~2/(w+1) of the grams.
    # The shared-fp count per doc is then the same contamination signal
    # as x_duplicate_ngram_fraction, computed over the sub-linear
    # winnowed set — the index you can actually afford at 100 TB.
    # md5 is the digest (byte-identical in both engines, the
    # x_fingerprint precedent); the window min is a string min.
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    h AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= {_WINNOW_K} THEN
                 list_transform(generate_series(1, len(toks) - {_WINNOW_K - 1}),
                                i -> md5(array_to_string(toks[i:i+{_WINNOW_K - 1}], ' ')))
               ELSE [] END AS hs
        FROM t),
    f AS (
        SELECT doc_id, len(hs) AS n_grams,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(hs) - {_WINNOW_W - 1}, 1)),
                   p -> list_min(hs[p:p+{_WINNOW_W - 1}]))) AS fps
        FROM h WHERE len(hs) >= 1),
    e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
    shared AS (SELECT fp FROM e GROUP BY fp HAVING count(*) >= 2),
    per AS (
        SELECT e.doc_id, count(*) AS n_fps, count(s.fp) AS n_shared_fps
        FROM e LEFT JOIN shared s USING (fp) GROUP BY e.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(f.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(CASE WHEN f.doc_id IS NULL THEN 0
                ELSE greatest(f.n_grams - {_WINNOW_W - 1}, 1) END AS BIGINT) AS n_windows,
           CAST(COALESCE(p.n_fps, 0) AS BIGINT) AS n_fps,
           CAST(COALESCE(p.n_shared_fps, 0) AS BIGINT) AS n_shared_fps
    FROM documents d
    LEFT JOIN f ON d.doc_id = f.doc_id
    LEFT JOIN per p ON d.doc_id = p.doc_id
    """,
    doc="winnowing fingerprints (MOSS): window-min over positional 5-gram md5s — guaranteed detection of shared runs >= w+k-1 tokens from a ~2/(w+1)-size index, with per-doc shared-fp contamination counts",
)
def x_winnowing_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Local fingerprint SELECTION — the layer between raw n-grams and
    an affordable contamination index. x_duplicate_ngram_fraction
    indexes EVERY distinct gram; winnowing provably keeps the
    detection guarantee (shared runs of >= w+k-1 tokens always share a
    selected fingerprint, Schleimer et al. §3) while storing ~2/(w+1)
    of them.

    100 TB shape: selection is pure per-document array algebra — zero
    shuffle until the winnowed set (already ~3x smaller than the gram
    set) hits the shared-fp index, which is the same
    gram-count/semi-join/doc-agg pattern as x_duplicate_ngram_fraction
    (one hash shuffle, exchange reuse, AQE skew split on boilerplate
    fingerprints). Guarantee property-tested in tests/test_properties.py
    (shared token run => shared fingerprint, arbitrary corpora)."""
    k, w = _WINNOW_K, _WINNOW_W
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks"))
    # The gram-hash array is bound ONCE as a lambda variable (wrap in a
    # 1-element array, transform, take element 1). Referencing it as a
    # named projection column instead lets CollapseProject inline the
    # md5-transform into EVERY window's slice() — n re-evaluations of an
    # n-element md5 array per document, O(n^2) digests: measured 229 s
    # vs 5.3 s at sf0.1 (42x) for identical output. Lambda variables
    # are evaluated once per row; projection aliases are not a CSE
    # boundary under higher-order functions.
    core = F.expr(
        f"element_at(transform(array("
        f"  CASE WHEN size(toks) >= {k} THEN "
        f"    transform(sequence(1, size(toks) - {k - 1}), "
        f"      i -> md5(concat_ws(' ', slice(toks, i, {k})))) "
        f"  ELSE cast(array() as array<string>) END), "
        f"hs -> named_struct("
        f"  'n_grams', size(hs), "
        f"  'fps', CASE WHEN size(hs) >= 1 THEN "
        f"    array_distinct(transform("
        f"      sequence(1, greatest(size(hs) - {w - 1}, 1)), "
        f"      p -> array_min(slice(hs, p, {w})))) "
        f"  ELSE cast(array() as array<string>) END)), 1)"
    )
    with_fps = (
        staged.select("doc_id", core.alias("c"))
        .select(
            "doc_id",
            F.col("c.n_grams").alias("n_grams"),
            F.col("c.fps").alias("fps"),
        )
        .filter(F.col("n_grams") >= 1)
    )
    # r15 (spark_optimization_guide §2.4 — remove shuffles/passes
    # outright): the former shape consumed `with_fps` THREE times (the
    # shared-fp aggregate, the probe side of its own left join, and a
    # separate n_grams readback join), so the md5+window-min selection —
    # the whole per-doc cost — ran 3x per query (plan: 4 parquet scans
    # of documents, 3 with the winnow expression). Carrying n_grams
    # through the explode (lossless: every surviving doc has >= 1 fp,
    # since n_grams >= 1 forces a non-empty fps array) and computing
    # each fingerprint's corpus count as a count-over-window BY fp
    # instead of aggregate-then-self-join makes the selection run ONCE:
    # scan -> winnow -> explode -> one fp exchange (window count) ->
    # one doc_id exchange (per-doc agg) -> broadcast back to docs.
    # At 100 TB the removed work is two full corpus tokenize+digest
    # passes; the added work is the window's per-partition sort of the
    # (already ~3x-sub-gram-sized) winnowed set, which rides the same
    # exchange the removed aggregate paid anyway.
    e = with_fps.select("doc_id", "n_grams", F.explode("fps").alias("fp"))
    nd = F.count("*").over(Window.partitionBy("fp"))
    per = (
        e.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count("*").alias("n_fps"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_shared_fps"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            # NULL n_grams (no grams) must yield 0 windows — note
            # greatest() SKIPS nulls (greatest(NULL, 1) = 1), so the
            # when-guard, not coalesce-after-greatest, is load-bearing
            F.when(F.col("n_grams").isNull(), F.lit(0))
            .otherwise(F.greatest(F.col("n_grams") - (w - 1), F.lit(1)))
            .cast("long").alias("n_windows"),
            F.coalesce("n_fps", F.lit(0)).cast("long").alias("n_fps"),
            F.coalesce("n_shared_fps", F.lit(0)).cast("long").alias("n_shared_fps"),
        )
    )


# ---------------------------------------------------------------------------
# round-3 corpus-hygiene extensions: rule-based quality gates, pre-tokenizer
# accounting, cross-doc n-gram contamination, BM25 retrieval, Bloom prefilter
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in")


@query(
    "x_gopher_rules",
    # Gopher-style rule gate (Rae et al. 2021 §A1.1, public paper): word
    # count bounds, mean-word-length band, minimum stopword evidence,
    # lexical-diversity floor. Ratios are exact-integer divisions done
    # identically in both engines; every rule is a pure per-row
    # projection, so the op is shuffle-free and scale-trivial.
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    s AS (
        SELECT doc_id,
               len(toks) AS n_words,
               CAST(list_sum(list_transform(toks, x -> strlen(x))) AS BIGINT) AS n_tok_chars,
               len(list_filter(toks, x -> list_contains({list(_GOPHER_STOPWORDS)!r}, x))) AS n_stop,
               len(list_distinct(toks)) AS n_uniq
        FROM t)
    SELECT doc_id, n_words,
           CAST(ROUND(n_tok_chars * 1.0 / n_words, 4) AS DOUBLE) AS mean_word_len,
           CAST(ROUND(n_uniq * 1.0 / n_words, 4) AS DOUBLE) AS frac_unique,
           n_stop >= 2 AS has_stopwords,
           (n_words BETWEEN 20 AND 100000)
               AND (n_tok_chars * 1.0 / n_words BETWEEN 2 AND 10)
               AND n_stop >= 2
               AND (n_uniq * 1.0 / n_words >= 0.05) AS keep
    FROM s
    """,
    doc="Gopher-style rule-based quality gate: word-count band, mean word length, stopword evidence, lexical-diversity floor (corpus pre-filter)",
)
def x_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Rule-based corpus gate — the cheap pass that runs BEFORE any
    model-based scoring in a production pipeline. 100 TB posture:
    narrow per-row array algebra only (no shuffle, no UDF); the kept
    subset then feeds the expensive dedup/scoring stages.
    """
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks"))
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
    s = staged.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.aggregate(
            F.transform(F.col("toks"), lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_tok_chars"),
        F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x))).alias("n_stop"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
    )
    mean_len = F.col("n_tok_chars") * 1.0 / F.col("n_words")
    frac_uniq = F.col("n_uniq") * 1.0 / F.col("n_words")
    return s.select(
        "doc_id",
        "n_words",
        F.round(mean_len, 4).cast("double").alias("mean_word_len"),
        F.round(frac_uniq, 4).cast("double").alias("frac_unique"),
        (F.col("n_stop") >= 2).alias("has_stopwords"),
        (
            F.col("n_words").between(20, 100000)
            & mean_len.between(2, 10)
            & (F.col("n_stop") >= 2)
            & (frac_uniq >= 0.05)
        ).alias("keep"),
    )


# GPT-2-style pre-tokenizer, RE2-safe subset (no lookahead — DuckDB's RE2
# rejects (?!\S)): contractions | space-word | space-number | space-punct
# run | whitespace run. Identical leftmost non-overlapping scan in Spark
# (Java regex) and DuckDB (RE2) for this pattern.
_PRETOK_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+"
_PRETOK_SQL = _PRETOK_RE.replace("'", "''")  # SQL string-literal escaping


@query(
    "x_bpe_pretokenize",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{_PRETOK_SQL}') AS pieces
        FROM documents)
    SELECT doc_id,
           len(pieces) AS n_pieces,
           len(list_filter(pieces, p -> regexp_matches(p, '^ ?[a-z]+$'))) AS n_word_pieces,
           CAST(list_sum(list_transform(pieces, p -> strlen(p))) AS BIGINT) AS n_bytes,
           CAST(ROUND(CAST(list_sum(list_transform(pieces, p -> strlen(p))) AS BIGINT) * 1.0
                      / len(pieces), 4) AS DOUBLE) AS bytes_per_piece
    FROM t
    """,
    doc="BPE pre-tokenizer accounting: GPT-2-style regex split (RE2-safe subset), piece/byte counts and fertility — the token-budget estimator before a real BPE merge pass",
)
def x_bpe_pretokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Pre-tokenizer accounting — the first half of BPE tokenization
    (the regex pre-split that bounds every merge), which is what a
    token-budget / cost estimate over a raw corpus actually needs.
    Scale: pure per-row regex + array algebra, no shuffle; the regex is
    anchored to the RE2-safe subset so engines agree byte-for-byte.
    """
    docs = load_table(spark, sf, "documents")
    staged = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(_PRETOK_RE), 0).alias("pieces"),
    )
    n_bytes = F.aggregate(
        F.transform(F.col("pieces"), lambda p: F.length(p)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return staged.select(
        "doc_id",
        F.size("pieces").alias("n_pieces"),
        F.size(
            F.filter(F.col("pieces"), lambda p: p.rlike(r"^ ?[a-z]+$"))
        ).alias("n_word_pieces"),
        n_bytes.alias("n_bytes"),
        F.round(n_bytes * 1.0 / F.size("pieces"), 4).cast("double").alias("bytes_per_piece"),
    )


@query(
    "x_duplicate_ngram_fraction",
    # cross-doc contamination signal (the n-gram inverted-index analog
    # of Lee et al. 2021 exact-substring dedup, public paper): for every
    # doc, the fraction of its distinct 5-grams that appear in at least
    # one OTHER document.
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    g AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS g
        FROM t CROSS JOIN LATERAL unnest(generate_series(1, len(toks) - 4)) AS u(i)
        WHERE len(toks) >= 5),
    shared AS (
        SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
    per_doc AS (
        SELECT g.doc_id,
               count(*) AS n_grams,
               count(s.g) AS n_shared
        FROM g LEFT JOIN shared s USING (g)
        GROUP BY g.doc_id)
    SELECT d.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.n_shared, 0) AS n_shared,
           CAST(ROUND(COALESCE(p.n_shared * 1.0 / p.n_grams, 0.0), 4) AS DOUBLE) AS dup_frac
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
    doc="cross-doc duplicated 5-gram fraction per doc: inverted-index contamination signal (exact-substring-dedup analog at corpus scale)",
)
def x_duplicate_ngram_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc contamination score via a 5-gram inverted index.

    100 TB shape: explode distinct grams (narrow), ONE hash shuffle on
    the gram to count document frequency (AQE splits skewed grams —
    boilerplate grams are exactly the skewed keys), a semi-join back on
    the same key (exchange reuse), and one doc-keyed agg. This is the
    Spark-first analog of suffix-array exact-substring dedup: same
    signal, linear scans + hash shuffles instead of a global sort.

    The shuffle key is ``xxhash64(gram)``, not the ~40-byte gram
    string: 8-byte keys cut exchange volume severalfold (measured 24%
    wall-clock at sf0.1), which is where this op's cost lives at scale.
    Collision math: E[collisions] ~ n^2/2^65, i.e. ~3e-8 at a million
    distinct grams and ~27 at 10^12 — a sub-ppb perturbation of an
    aggregate *signal* score. tests/test_llm_recall.py pins hashed ==
    exact-string results on the oracle-checked datasets (zero
    collisions there, so the DuckDB oracle, which uses exact grams,
    still hash-matches)."""
    docs = load_table(spark, sf, "documents")
    grams = doc_ngrams(spark, sf, n=5).select("doc_id", F.xxhash64("g").alias("g"))
    # r15 (guide §2.4, the x_winnowing_fingerprint restructure): the
    # former shared-gram aggregate fed a broadcast join back onto its
    # own input, so the corpus tokenize+gram pass ran TWICE (the
    # broadcast build recomputes the subtree — no exchange to reuse).
    # Counting each gram's document frequency as count-over-window BY g
    # evaluates the gram pass once; the per-doc rollup reads the same
    # exploded table. The window's per-partition sort rides the one
    # g-keyed exchange, which at 100 TB replaces BOTH the former
    # distinct-gram exchange and the (then non-broadcastable)
    # shared-gram join shuffle.
    nd = F.count("*").over(Window.partitionBy("g"))
    per_doc = (
        grams.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared") * 1.0 / F.col("n_grams"), F.lit(0.0)), 4
            ).cast("double").alias("dup_frac"),
        )
    )


_BM25_TERMS = ("table", "join", "filter")
_BM25_K1 = 1.2
_BM25_B = 0.75

# ONE copy of the pinned BM25 per-(doc, term) arithmetic, shared by
# x_bm25_score / x_rrf_fusion / x_index_overlay_search on BOTH sides of
# the oracle boundary (r15 review: three verbatim copies of a
# DECIMAL(18,8)-pinned formula must change in lockstep or hash parity
# breaks silently for the un-updated op). The SQL fragment assumes the
# conventional CTE aliases tf/df/dl/stats; the Spark expression assumes
# bound columns tf/df/dl/n/avgdl.
_BM25_TERM_SCORE_SQL = (
    f"CAST(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)"
    f" * tf.tf * ({_BM25_K1} + 1)"
    f" / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))"
    f" AS DECIMAL(18,8))"
)


def _bm25_term_score() -> Column:
    """Classic BM25 (Robertson/Spärck Jones) per-(doc, term)
    contribution over bound columns ``tf``/``df``/``dl``/``n``/
    ``avgdl``, DECIMAL(18,8)-pinned so a 1-3-term sum is exact and
    order-insensitive across engines."""
    return (
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
        * F.col("tf") * (_BM25_K1 + 1)
        / (F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")))
    ).cast("decimal(18,8)")


@query(
    "x_bm25_score",
    # classic BM25 (Robertson/Spärck Jones, public formula) for a fixed
    # query over the corpus; per-term contributions are cast to
    # DECIMAL(18,8) before summing so the 1-3-term sum is exact and
    # order-insensitive in both engines.
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, tok AS term, count(*) AS tf
        FROM t CROSS JOIN LATERAL unnest(toks) AS u(tok)
        WHERE tok IN {_BM25_TERMS!r}
        GROUP BY doc_id, tok),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               {_BM25_TERM_SCORE_SQL} AS term_score
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
    SELECT doc_id, CAST(ROUND(SUM(term_score), 4) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    doc="BM25 retrieval scoring for a fixed query over the corpus, top-20 (k1=1.2, b=0.75; decimal-pinned term sum)",
)
def x_bm25_score(spark: SparkSession, sf: str) -> DataFrame:
    """Sparse retrieval twin of the dense d44/x_ann paths.

    100 TB shape: token explode is narrow and pre-filtered to the query
    terms BEFORE the shuffle (the scan emits |query| rows per doc max);
    corpus stats (N, avgdl) and per-term document frequencies are tiny
    aggregates broadcast back; one doc-keyed agg then a global top-k.
    A real search deployment replaces the fixed term tuple with a
    broadcast query table — same plan.
    """
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks"))
    dl = staged.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        staged.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", _bm25_term_score().alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


_BLOOM_M = 65536  # filter bits
_BLOOM_K = 4  # hash functions (md5 32-bit slices)


@query(
    "x_bloom_prefilter",
    # Bloom-filter membership prefilter for incremental dedup: the
    # historical corpus (even doc_ids) populates a 65536-slot filter via
    # 4 md5-derived positions; each new doc (odd doc_ids) is a
    # maybe-duplicate iff ALL its positions are set. md5 slicing makes
    # the hash family identical across engines.
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, j,
               ('0x' || substr(md5(text), 1 + 8 * j, 8))::BIGINT % {_BLOOM_M} AS p
        FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
    hist AS (SELECT DISTINCT p FROM pos WHERE doc_id % 2 = 0),
    hits AS (
        SELECT pos.doc_id, count(*) AS n_hits
        FROM pos JOIN hist USING (p)
        WHERE pos.doc_id % 2 = 1
        GROUP BY pos.doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_hits, 0) = {_BLOOM_K} AS maybe_dup
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 2 = 1
    """,
    doc="Bloom-prefilter incremental dedup: historical corpus -> 4x md5-position filter; new docs flagged maybe-dup iff all positions set (map-side prefilter before the exact anti-join)",
)
def x_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """The map-side membership prefilter in front of x_incremental_dedup:
    at 100 TB the historical hash ledger is too big to anti-join every
    daily batch wholesale, so the batch probes a Bloom filter first and
    only maybe-duplicates proceed to the exact check.

    Engine shape: the position table here IS the filter (distinct ints,
    bounded by m=65536 regardless of corpus size), broadcast to the
    probe side — exactly how the real bitset would ship. False-positive
    rate is the standard (1 - e^(-kn/m))^k; m scales as a knob.
    """
    docs = load_table(spark, sf, "documents")
    pos_arr = F.expr(
        f"transform(sequence(0, {_BLOOM_K - 1}), "
        f"j -> cast(conv(substring(md5(text), 1 + 8 * j, 8), 16, 10) as bigint) % {_BLOOM_M})"
    )
    pos = docs.select("doc_id", F.explode(pos_arr).alias("p"))
    hist = pos.filter(F.col("doc_id") % 2 == 0).select("p").distinct()
    probes = pos.filter(F.col("doc_id") % 2 == 1)
    hits = (
        probes.join(F.broadcast(hist), "p")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) == _BLOOM_K).alias("maybe_dup"),
        )
    )


# --- production-sized Bloom filter (round 4) --------------------------------
# Sizing from expected items / target FPP (standard formulas):
#   m = ceil(-n ln p / (ln 2)^2)   bits
#   k = round((m / n) ln 2)        hash functions
# Positions via Kirsch-Mitzenmacher double hashing — two independent
# 60-bit values sliced from one md5 (cross-engine reproducible; swap for
# xxhash64(col, seed) at deploy for ~3x hash throughput, one line):
#   pos_j = (h1 + j * h2) mod m, j in [0, k)
import math as _math

_BLOOMP_N = 4096  # expected historical items (covers sf0.1's 2500)
_BLOOMP_FPP = 0.01
_BLOOMP_M = int(_math.ceil(-_BLOOMP_N * _math.log(_BLOOMP_FPP) / (_math.log(2) ** 2)))
_BLOOMP_K = max(1, round((_BLOOMP_M / _BLOOMP_N) * _math.log(2)))


def bloom_positions(col: str, m: int, k: int):
    """Array<bigint> of k Bloom positions for a string column. 15 hex
    chars = 60 bits per half keeps every intermediate inside bigint
    (ANSI-safe: j*h2 <= k*m << 2^63)."""
    return F.expr(
        f"transform(sequence(0, {k - 1}), j -> pmod("
        f"  cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint) % {m}"
        f"  + j * (cast(conv(substring(md5({col}), 17, 15), 16, 10) as bigint) % {m} + 1),"
        f" {m}))"
    )


def bloom_build(items: DataFrame, col: str, m: int = _BLOOMP_M, k: int = _BLOOMP_K) -> DataFrame:
    """items -> the filter as a word table (word_idx bigint, word bigint).

    One shuffle keyed on word_idx; output is bounded by m/64 rows no
    matter the corpus size (m=39,261 bits here -> <=614 longs). Sizing
    note for 100 TB: a 10^9-item filter at 1% FPP is ~1.2 GB of words —
    too big to broadcast. At that scale keep the word table as a
    DataFrame and probe via a shuffle join on word_idx (or build one
    bounded filter per partition/date and prefilter partition-locally);
    broadcasting in bloom_probe is correct only while m/64 longs fit
    the broadcast threshold."""
    return (
        items.select(F.explode(bloom_positions(col, m, k)).alias("p"))
        .select(
            (F.col("p") / 64).cast("bigint").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_probe(probes: DataFrame, key: str, col: str, words: DataFrame,
                m: int = _BLOOMP_M, k: int = _BLOOMP_K) -> DataFrame:
    """(key, col) probes -> (key, bloom_maybe): maybe iff EVERY position's
    bit is set. The word table broadcasts (m/64 longs); the only shuffle
    is the k-row-per-probe AND-reduction on the probe key.

    NULL probe values hash to no positions (md5(NULL) -> NULL array), so
    ``explode_outer`` keeps them as a single NULL-position row scored
    maybe=true — the conservative verdict: an unknown value falls through
    to the exact-confirm stage instead of silently vanishing from the
    output (and instead of diverging from SQL NOT IN NULL-semantics
    oracles, which also yield maybe for NULL)."""
    pos = probes.select(key, F.explode_outer(bloom_positions(col, m, k)).alias("p")).select(
        key,
        (F.col("p") / 64).cast("bigint").alias("word_idx"),
        F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias("bit"),
    )
    hit = pos.join(F.broadcast(words), "word_idx", "left").select(
        key,
        F.when(F.col("word_idx").isNull(), F.lit(True))
        .otherwise(F.col("word").isNotNull() & (F.col("word").bitwiseAND(F.col("bit")) != 0))
        .alias("hit"),
    )
    return hit.groupBy(key).agg(F.min("hit").alias("bloom_maybe"))


@query(
    "x_bloom_prefilter_prod",
    # production Bloom prefilter, fully deterministic across engines:
    # the oracle recomputes the identical double-hash positions, so
    # bloom_maybe (including any false positive) hash-matches — unlike
    # a rows-only sketch check, a wrong bit ANYWHERE in the filter
    # fails the gate.
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               ('0x' || substr(md5(text), 1, 15))::BIGINT % {_BLOOMP_M} AS h1,
               ('0x' || substr(md5(text), 17, 15))::BIGINT % {_BLOOMP_M} + 1 AS h2
        FROM documents),
    pos AS (
        SELECT doc_id, (h1 + j * h2) % {_BLOOMP_M} AS p
        FROM h CROSS JOIN (SELECT unnest(range({_BLOOMP_K})) AS j)),
    hist AS (SELECT DISTINCT p FROM pos WHERE doc_id % 2 = 0),
    miss AS (
        SELECT DISTINCT doc_id FROM pos
        WHERE doc_id % 2 = 1 AND p NOT IN (SELECT p FROM hist)),
    exact AS (SELECT DISTINCT md5(text) AS sig FROM documents WHERE doc_id % 2 = 0)
    SELECT d.doc_id,
           d.doc_id NOT IN (SELECT doc_id FROM miss) AS bloom_maybe,
           d.doc_id NOT IN (SELECT doc_id FROM miss)
             AND COALESCE(md5(d.text) IN (SELECT sig FROM exact), FALSE) AS is_dup
    FROM documents d
    WHERE d.doc_id % 2 = 1
    """,
    doc="production-sized Bloom prefilter (m,k from expected-items/FPP; word-packed bitset via bit_or) + exact confirm: new docs -> (bloom_maybe, is_dup)",
)
def x_bloom_prefilter_prod(spark: SparkSession, sf: str) -> DataFrame:
    """Production twin of x_bloom_prefilter (VERDICT r3 item 8): the
    64 KiB fixture filter becomes a properly SIZED one — m/k derived
    from expected items (_BLOOMP_N=4096) and target FPP (1%) via the
    standard formulas — stored as a word-packed bitset built with one
    ``bit_or`` aggregate, the same layout
    ``DataFrameStatFunctions.bloomFilter`` materializes JVM-side.

    Composition contract: bloom_maybe=false is DEFINITELY new (Bloom
    filters have no false negatives — tested in
    tests/test_llm_recall.py); only the maybe-rows proceed to the exact
    membership check (is_dup), so at 100 TB the daily batch anti-joins
    ~FPP x batch rows against the hash ledger instead of all of them.
    The filter ships as m/64 longs (here <=614) — broadcast-trivial, and
    still only ~1.2 GB for a billion-item ledger at 1% FPP.
    """
    docs = load_table(spark, sf, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    words = bloom_build(hist, "text")
    maybes = bloom_probe(new.select("doc_id", "text"), "doc_id", "text", words)
    exact = hist.select(F.md5("text").alias("sig")).distinct()
    confirmed = (
        new.select("doc_id", F.md5("text").alias("sig"))
        .join(F.broadcast(exact), "sig", "left_semi")
        .select("doc_id", F.lit(True).alias("exact_dup"))
    )
    return (
        new.select("doc_id")
        .join(maybes, "doc_id", "left")
        .join(confirmed, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_maybe",
            (F.col("bloom_maybe") & F.coalesce("exact_dup", F.lit(False))).alias("is_dup"),
        )
    )


@query(
    "x_minhash_containment",
    # asymmetric near-dup: containment C(A,B) = |A∩B| / |A| catches a
    # short doc EMBEDDED in a long one, which symmetric Jaccard misses
    # entirely (|A∩B|/|A∪B| shrinks as B grows). The quote/boilerplate/
    # subset-duplicate detector in a corpus pipeline (Broder's original
    # resemblance-vs-containment split, public literature).
    oracle=f"""
    WITH {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(ROUND(i * 1.0 / sa.n, 4) AS DOUBLE) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    WHERE i * 1.0 / sa.n >= 0.5
    """,
    doc="asymmetric containment near-dup: |A intersect B| / |A| >= 0.5 over 3-gram sets (detects docs embedded in larger docs; directional pairs)",
)
def x_minhash_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Directional pairs (doc_a contained-in doc_b). Same inverted-index
    plan as x_ngram_jaccard — one gram-keyed shuffle, AQE skew-split on
    boilerplate grams, AQE-promoted size join — but the measure divides by
    |A| only, so each ordered pair is scored. At 100 TB the candidate
    step swaps to containment-biased minhash (bottom-k of A's sketch
    probed against B's), same downstream verify."""
    # 8-byte hashed gram key in the self-join (see x_ngram_jaccard)
    ng = doc_ngrams(spark, sf).select("doc_id", F.xxhash64("g").alias("g"))
    sizes = ng.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ng.alias("a")
    b = ng.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    cont = F.col("i") * 1.0 / F.col("sa.n")
    # un-hinted: sizes is corpus-scaled (see x_ngram_jaccard's note)
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .filter(cont >= 0.5)
        .select("doc_a", "doc_b", F.round(cont, 4).cast("double").alias("containment"))
    )


@query(
    "x_semdedup",
    oracle=None,  # rows-only: KMeans centroids are implementation-defined;
    # the semantic-dedup contract (every surviving pair in a cluster is
    # below the cosine threshold; every pruned doc had a closer senior)
    # is pinned in tests/test_llm_recall.py
    doc="semantic dedup (SemDeDup-style): KMeans-cluster embeddings, prune within-cluster pairs above cosine threshold, keep min vec_id per dup group",
)
def x_semdedup(
    spark: SparkSession,
    sf: str,
    k: int | None = None,
    tau: float = 0.97,
    max_fit_rows: int = 100_000,
) -> DataFrame:
    """Cluster-then-prune semantic dedup (SemDeDup, Abbas et al. 2023,
    public paper): embeddings are KMeans-clustered, exact cosine is
    computed only WITHIN a cluster, and of any pair above ``tau`` the
    higher vec_id is dropped (deterministic senior-keeps rule).

    100 TB shape: the KMeans FIT runs on a bounded sample
    (``max_fit_rows`` rows, seeded ``sample``). ``k`` bounds the
    expected cluster size to n/k, so the within-cluster pair product is
    n²/k — a FIXED k makes that quadratic again the moment the corpus
    outgrows it (the r9 docstring prescribed k ~ n/target; r10 makes
    the default DO it): ``k = clamp(n/32, 64, 4096)``, i.e. ~32-row
    clusters, capped so the centroid set stays a bounded broadcast
    (4096 x 64 doubles = 2 MB) and floored so small corpora keep the
    historical k=64 behavior bit-for-bit. Past the cap (n >> 131k per
    partition-of-the-problem) production shards the corpus first or
    goes hierarchical (two-level KMeans) — the cap is the honest
    single-level limit, not a hidden cliff: the sf2 probe (20x data,
    n=40k -> k=1250) measures the adaptive region. Assignment over the
    full corpus is a single narrow ``transform`` (broadcast centroids,
    no shuffle); the pair step is one shuffle on the cluster id with
    AQE skew-splitting. Returns survivors (vec_id, cluster) — the
    training-set the dedup keeps.
    """
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    if k is None:
        k = max(64, min(4096, n // 32))
    k = max(2, min(k, n))
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # r15 (OPTIMIZATION round, guide §2.4): carry the float64 embedding
    # THROUGH the KMeans transform instead of joining assignments back
    # onto the embeddings table — transform only appends the prediction
    # column, so the former emb-join-assigned paid a vec_id shuffle of
    # both sides (per feats consumer) for rows transform already held.
    # Same fit sample, same seed, same model -> identical clusters and
    # survivors (collect-compared byte-equal at all three SFs); A/B at
    # sf0.1: 3.87 s -> 3.17 s median (the residue is the KMeans fit).
    vec = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    fit_df = vec if n <= max_fit_rows else vec.sample(fraction=max_fit_rows / n, seed=42)
    model = KMeans(k=k, seed=42, maxIter=5).fit(fit_df)
    # float64 embeddings BEFORE the pair math: float32 products would
    # disagree at the tau boundary with the float64 cosine the contract
    # test (and every other cosine op via _dot/_norm) computes —
    # round-6 review
    # norms precomputed ONCE PER ROW before the pair join (r9, measured
    # 1.6x end-to-end at sf0.1: per-pair _norm re-walked both 64-dim
    # arrays for every candidate pair — 2/3 of the pair math was
    # redundant). float64 stays intact, so the tau boundary is
    # unchanged and the output is identical.
    feats = model.transform(vec).select(
        "vec_id",
        F.col("prediction").alias("cluster"),
        "embedding",
    ).withColumn("nrm", _norm(F.col("embedding")))
    a = feats.alias("a")
    b = feats.alias("b")
    dot = _dot(F.col("a.embedding"), F.col("b.embedding"))
    dupped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
        )
        .filter((dot / (F.col("a.nrm") * F.col("b.nrm"))) >= tau)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        feats.select("vec_id", "cluster")
        .join(dupped, "vec_id", "left_anti")
        .select("vec_id", "cluster")
    )


@query(
    "x_segment_dedup_scrub",
    # Sub-document dedup with RECONSTRUCTION (Lee et al. 2022 "Deduplicating
    # Training Data Makes Language Models Better", RefinedWeb's line-wise
    # scrub): the unit of dedup is an 8-word segment, and the output is the
    # rewritten corpus, not just a metric. Every occurrence of a segment
    # after its first global occurrence (min (doc_id, seg) across the whole
    # corpus) is removed, then each doc's survivors are re-joined in order.
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    segs AS (
      SELECT doc_id, CAST(t.i AS BIGINT) AS seg,
             array_to_string(ws[(t.i*8+1):(t.i*8+8)], ' ') AS seg_text
      FROM docs, LATERAL unnest(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS t(i)),
    f AS (SELECT seg_text, min(ROW(doc_id, seg)) AS first_rc
          FROM segs GROUP BY seg_text)
    SELECT s.doc_id,
           coalesce(string_agg(CASE WHEN ROW(s.doc_id, s.seg) = f.first_rc
                                    THEN s.seg_text END, ' ' ORDER BY s.seg),
                    '') AS scrubbed_text,
           CAST(count(*) FILTER (WHERE ROW(s.doc_id, s.seg) = f.first_rc) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE ROW(s.doc_id, s.seg) <> f.first_rc) AS BIGINT) AS n_removed
    FROM segs s JOIN f ON s.seg_text = f.seg_text
    GROUP BY s.doc_id
    """,
    doc="sub-document dedup with reconstruction: scrub every 8-word segment after its first global occurrence, rebuild doc text (Lee et al. exact-substring removal at segment granularity)",
)
def x_segment_dedup_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus rewrite, not just a metric: the output text has cross- and
    intra-doc duplicated segments removed, keeping the single first
    occurrence (min doc_id, then min segment index) so both engines pick
    the same survivor.

    Scale shape (100 TB): two shuffles total — one on the segment text
    whose window computes each segment's global first occurrence in
    place (r15: formerly a groupBy + join-back whose broadcast build
    re-ran the segment explode), one on doc_id to reassemble. The
    window partitions by seg_text — each partition is one duplicate
    group, bounded by a segment's repetition count, never corpus-sized.
    No collect. At production scale the window key becomes
    xxhash64(seg_text) (8-byte shuffle rows instead of ~50-byte strings;
    the repo's x_duplicate_ngram_fraction measured -24% from the same
    swap) — kept as full text here so the oracle equality is exact rather
    than modulo hash collisions.

    Ref parity: the reference dedups whole URL-addressed blobs via a Redis
    SET (internal/core/resource.go:54-108); this is the same idempotent
    keep-first contract pushed inside the document.
    """
    return segment_scrub(load_table(spark, sf, "documents"))


def doc_segments(docs: DataFrame, seg_words: int = 8) -> DataFrame:
    """Explode (doc_id, text) into fixed-width word segments
    ``(doc_id, seg, seg_text)`` — the shared unit of x_segment_dedup_scrub
    (keep-first dedup) and x_boilerplate_scrub (document-frequency
    scrub)."""
    docs = docs.withColumn("__ws", F.split("text", " "))
    ws = F.col("__ws")  # materialized once; see x_lm_surprisal_score note
    nseg = F.ceil(F.size(ws) / F.lit(float(seg_words))).cast("int")
    return docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.array_join(F.slice(ws, i * seg_words + 1, F.lit(seg_words)), " "),
            )
        ).alias("seg", "seg_text"),
    ).select("doc_id", F.col("seg").cast("long").alias("seg"), "seg_text")


def segment_scrub(docs: DataFrame, seg_words: int = 8) -> DataFrame:
    """Core of x_segment_dedup_scrub over any (doc_id, text) DataFrame —
    factored out so property tests can drive it with adversarial
    synthetic corpora (tests/test_properties.py)."""
    segs = doc_segments(docs, seg_words)
    # lexicographic struct min, not doc_id*K+seg: an integer encoding
    # caps the per-doc segment count at K and silently mis-attributes
    # the survivor beyond it (round-6 review finding) — struct
    # comparison has no such bound on either engine
    key = F.struct("doc_id", "seg")
    # r15 (guide §2.4): the former groupBy(seg_text) + join-back shape
    # evaluated the corpus segment explode TWICE — the firsts table's
    # broadcast build recomputes its subtree from the scan. min-struct
    # over a seg_text-partitioned window runs the explode ONCE; its
    # per-partition sort rides the same seg_text exchange the removed
    # aggregate paid, and every row still flows to the doc_id rollup
    # (no selective pre-shuffle filter here, so the x_dup_span_scrub
    # counter-case does not apply). Identical survivor per segment.
    joined = segs.withColumn(
        "first_rc", F.min(key).over(Window.partitionBy("seg_text"))
    )
    kept = (key == F.col("first_rc")).cast("int")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(kept == 1, F.struct("seg", "seg_text"))
                            )
                        ),
                        lambda s: s["seg_text"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("scrubbed_text"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum(1 - kept).cast("long").alias("n_removed"),
        )
    )


@query(
    "x_mixture_temperature",
    # Temperature-scaled mixture weights (UniMax / multilingual-T5 style):
    # per-language sampling weight proportional to (token count)^(1/T)
    # with T=2. Cross-engine determinism: sqrt over a DOUBLE is
    # correctly-rounded per IEEE 754 (identical bits on both engines, no
    # libm variance, unlike pow/log), floor() pins it to an exact BIGINT,
    # and the final weight is integer floor division (the TWAP trick) —
    # no decimal quotient or double accumulation anywhere.
    oracle="""
    WITH tok AS (SELECT lang,
                        CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY lang),
    sc AS (SELECT lang, n_tokens,
                  CAST(floor(sqrt(n_tokens * 1000000)) AS BIGINT) AS score
           FROM tok),
    tot AS (SELECT CAST(SUM(score) AS BIGINT) AS total FROM sc)
    SELECT lang, n_tokens, score,
           CAST((score * 1000000) // total AS BIGINT) AS weight_ppm
    FROM sc, tot
    """,
    doc="temperature-scaled mixture weights (UniMax, T=2): per-lang sampling weight ~ sqrt(token count), pinned via floor(sqrt)->BIGINT + integer floor-division ppm",
)
def x_mixture_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Upstream of x_mixture_sample: WHERE the per-language rates come
    from. T=2 temperature flattening (weight ~ count^(1/2)) upsamples
    low-resource languages relative to proportional sampling.

    Scale shape: one groupBy(lang) aggregation with map-side partial sums
    (cardinality = #languages, tiny), then a 1-row global total
    crossJoin-broadcast back — the repo's scalar-broadcast pattern, no
    single-partition window. The token count is the exact word count,
    summed as BIGINT.
    """
    docs = load_table(spark, sf, "documents")
    return mixture_weights(docs).select("lang", "n_tokens", "score", "weight_ppm")


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Shared T=2 weight pipeline (lang, n_tokens, n_docs, score,
    weight_ppm) — the single definition behind x_mixture_temperature
    (publishes it) and x_mixture_resample (applies it), so the two
    halves of the mixture loop cannot drift (round-6 review finding).

    `div` is Spark's exact integer division on BIGINT — matching
    DuckDB's `//`; a double `/` + floor() could double-round across an
    integer boundary."""
    tok = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        F.count("*").alias("n_docs"),
    )
    sc = tok.withColumn(
        "score", F.floor(F.sqrt(F.col("n_tokens") * 1000000)).cast("long")
    )
    total = sc.agg(F.sum("score").cast("long").alias("total"))
    return sc.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_tokens",
        "n_docs",
        "score",
        F.expr("(score * 1000000L) div total").cast("long").alias("weight_ppm"),
    )


@query(
    "x_lm_surprisal_score",
    # CCNet-style language-model quality signal (Wenzek et al. 2020 score
    # docs by LM perplexity; here the LM is a bigram model trained on the
    # corpus itself) made EXACTLY cross-engine: per-bigram surprisal is
    # quantized to whole bits as floor(log2(T/c)) computed with pure
    # integer ops — length(bin(T div c)) - 1 — so no libm log is ever
    # evaluated (floor(log2(floor(x))) == floor(log2(x)) for x >= 1,
    # hence the integer division loses nothing). The only division is
    # exact-int -> double (IEEE-deterministic) feeding ROUND.
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
    bg AS (SELECT doc_id, ws[CAST(t.i AS INT)] || ' ' || ws[CAST(t.i+1 AS INT)] AS b
           FROM docs, LATERAL unnest(range(1, len(ws))) AS t(i)),
    cnt AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS T FROM bg)
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(length(bin(T // c)) - 1) AS BIGINT) AS sum_bits,
           CAST(ROUND(SUM(length(bin(T // c)) - 1) * 1.0 / count(*), 4) AS DOUBLE)
               AS avg_surprisal
    FROM bg JOIN cnt USING (b), tot
    GROUP BY bg.doc_id
    """,
    doc="bigram-LM surprisal quality score (CCNet-style): per-doc mean of floor(log2(T/count)) bits, exact integer log2 via bin-length — high = improbable text",
)
def x_lm_surprisal_score(spark: SparkSession, sf: str) -> DataFrame:
    """The perplexity-filter signal a CCNet-style pipeline ranks docs by
    (keep head/middle of the distribution, drop the gibberish tail),
    with the LM trained on the corpus being scored — one extra pass, no
    external model artifact.

    Scale shape (100 TB): ONE bigram fan-out (narrow map), then exactly
    two shuffles — the b-keyed exchange whose window computes each
    bigram's corpus frequency in place, and the groupBy(doc_id) for the
    score — plus a 1-row total broadcast whose branch never explodes
    (T comes from per-doc word counts). Quantizing surprisal to whole
    bits is what buys exactness; the un-quantized double-log variant is
    the same plan with F.log2 and a rows-only check.
    """
    docs = load_table(spark, sf, "documents")
    # materialize the split ONCE: referencing F.split(...) inside the
    # transform lambda re-evaluates the split per element (O(words^2)
    # string work per doc — measured 7x slower at sf0.1)
    docs = docs.withColumn("__ws", F.split("text", " "))
    ws = F.col("__ws")
    n = F.size(ws)
    grams = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                grams,
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                ),
            )
        ).alias("b"),
    )
    # r15 (guide §2.4, the x_duplicate_ngram_fraction restructure): the
    # former count-then-join-back shape evaluated the corpus bigram
    # explode THREE times — the count aggregate's broadcast build, the
    # global-total branch, and the join probe each recomputed it from
    # the scan. Per-bigram frequency as count-over-window BY b runs the
    # explode ONCE (the window's sort rides the b-keyed exchange that
    # the former aggregate paid anyway), and the global total T — a
    # pure function of per-doc word counts — is computed from the split
    # WITHOUT the explode (size(ws) - 1 per doc, map-side partial sum),
    # so the light branch never fans out. Same T, same c per row, same
    # integer-bits arithmetic: hash-identical on the DuckDB oracle.
    c = F.count("*").over(Window.partitionBy("b"))
    tot = docs.agg(
        F.sum(F.when(n >= 2, n - 1).otherwise(0)).cast("long").alias("T")
    )
    bits = F.length(F.bin(F.expr("T div c"))) - 1
    return (
        bg.withColumn("c", c)
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(bits).cast("long").alias("sum_bits"),
            F.round(F.sum(bits) * 1.0 / F.count("*"), 4)
            .cast("double")
            .alias("avg_surprisal"),
        )
    )


@query(
    "x_mixture_resample",
    # The step after x_mixture_temperature: APPLY the T=2 weights as
    # per-language keep rates and materialize the resampled corpus
    # stats. rate_l ~ weight_l / n_docs_l, scaled so the most
    # up-weighted language keeps 100% — every step is integer floor
    # division on BIGINT (exact on both engines), and the keep decision
    # is the repo's deterministic md5-bucket coin (x_mixture_sample).
    oracle="""
    WITH tok AS (SELECT lang,
                        CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens,
                        CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY lang),
    sc AS (SELECT lang, n_tokens, n_docs,
                  CAST(floor(sqrt(n_tokens * 1000000)) AS BIGINT) AS score
           FROM tok),
    tot AS (SELECT CAST(SUM(score) AS BIGINT) AS total FROM sc),
    w AS (SELECT lang, n_docs,
                 CAST((score * 1000000) // total AS BIGINT) AS weight_ppm
          FROM sc, tot),
    r AS (SELECT lang, n_docs,
                 CAST((weight_ppm * 1000000) // n_docs AS BIGINT) AS r_raw
          FROM w),
    m AS (SELECT CAST(max(r_raw) AS BIGINT) AS m FROM r),
    rates AS (SELECT lang, n_docs,
                     CAST((r_raw * 1000000) // m AS BIGINT) AS rate_ppm
              FROM r, m)
    SELECT d.lang, any_value(rates.n_docs) AS n_docs,
           any_value(rates.rate_ppm) AS rate_ppm,
           CAST(count(*) FILTER (
               WHERE ('0x' || substr(md5(d.text),1,8))::BIGINT % 1000000
                     < rates.rate_ppm) AS BIGINT) AS n_kept
    FROM documents d JOIN rates ON d.lang = rates.lang
    GROUP BY d.lang
    """,
    doc="apply UniMax T=2 mixture weights as per-lang keep rates (max-up-weighted lang keeps 100%); deterministic md5-bucket sampling, all-integer rate math",
)
def x_mixture_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Closes the mixture loop: x_mixture_temperature designs the
    target distribution, this op rewrites the corpus toward it. Keep
    probability is rate_ppm/1e6 with the doc's md5 bucket as the coin —
    rerunnable, shard-order-independent, and exactly reproducible (the
    property the reference's idempotent SET semantics give whole blobs,
    internal/core/resource.go:54-108, applied to sampling).

    Scale shape: the rate table is #languages rows built from two tiny
    aggregations (plus 1-row total and max scalars broadcast via
    crossJoin); it joins back to the corpus broadcast (a true dimension
    — cardinality fixed by the language set, not the data size), so the
    corpus is touched in one narrow filtered pass plus one
    groupBy(lang) rollup.
    """
    docs = load_table(spark, sf, "documents")
    w = mixture_weights(docs).select("lang", "n_docs", "weight_ppm")
    r = w.select(
        "lang", "n_docs", F.expr("(weight_ppm * 1000000L) div n_docs").alias("r_raw")
    )
    m = r.agg(F.max("r_raw").alias("m"))
    rates = r.crossJoin(F.broadcast(m)).select(
        "lang", "n_docs", F.expr("(r_raw * 1000000L) div m").alias("rate_ppm")
    )
    bucket = md5_bucket("text", 1000000)
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.any_value("n_docs").alias("n_docs"),
            F.any_value("rate_ppm").alias("rate_ppm"),
            F.sum((bucket < F.col("rate_ppm")).cast("long")).alias("n_kept"),
        )
    )


@query(
    "x_pmi_collocations",
    # Collocation extraction (phrase mining for vocab/tokenizer design,
    # Church & Hanks 1990 PMI): adjacent word pairs whose co-occurrence
    # beats independence, ranked by pointwise mutual information.
    # Same exactness technique as x_lm_surprisal_score: PMI is
    # quantized to whole bits with PURE integer math —
    #   PMI = log2( (cxy/Tb) / ((cx/Tu)(cy/Tu)) )
    #       = log2( p / q ),  p = cxy*Tu*Tu,  q = Tb*cx*cy
    # and for the kept (positive-PMI, p >= q) pairs
    #   floor(log2(p/q)) = length(bin(p div q)) - 1
    # so no libm log touches the hash path. min-count 5 and the p >= q
    # keep-filter are the standard collocation gates.
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
    uni AS (SELECT unnest(ws) AS w FROM docs),
    ucnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w),
    ut AS (SELECT CAST(count(*) AS BIGINT) AS tu FROM uni),
    bg AS (SELECT ws[CAST(t.i AS INT)] AS wa, ws[CAST(t.i+1 AS INT)] AS wb
           FROM docs, LATERAL unnest(range(1, len(ws))) AS t(i)),
    bcnt AS (SELECT wa, wb, CAST(count(*) AS BIGINT) AS cxy
             FROM bg GROUP BY wa, wb HAVING count(*) >= 5),
    bt AS (SELECT CAST(count(*) AS BIGINT) AS tb FROM bg)
    SELECT wa, wb, cxy,
           CAST(length(bin((cxy * tu * tu) // (tb * ca.c * cb.c))) - 1 AS BIGINT)
               AS pmi_bits
    FROM bcnt JOIN ucnt ca ON ca.w = bcnt.wa JOIN ucnt cb ON cb.w = bcnt.wb, ut, bt
    WHERE cxy * tu * tu >= tb * ca.c * cb.c
    ORDER BY pmi_bits DESC, cxy DESC, wa, wb LIMIT 100
    """,
    doc="PMI collocation mining: top-100 positive-PMI adjacent word pairs (min-count 5), PMI quantized to exact integer bits via bin-length — phrase mining for vocab design",
)
def x_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Scale shape: two count shuffles (unigrams, bigrams) over hashed
    word keys — the same inverted-index pattern as the n-gram family —
    then the pair table joins its two unigram counts (un-hinted; AQE
    broadcasts the vocab at small SF, keeps a shuffle join when the
    vocabulary is corpus-sized), the two 1-row totals broadcast via
    crossJoin, and the top-100 is TakeOrderedAndProject with a full
    deterministic tiebreak (pmi_bits, cxy, wa, wb). The min-count
    HAVING prunes the pair table before any join touches it.

    Overflow note: p = cxy*Tu^2 stays in int64 up to ~3B-word corpora;
    beyond that both engines promote the expression to DECIMAL(38,0)
    (documented, not yet exercised at the checked scales).
    """
    docs = load_table(spark, sf, "documents")
    # split materialized once — see x_lm_surprisal_score's note on the
    # per-element re-evaluation trap inside transform lambdas
    docs = docs.withColumn("__ws", F.split("text", " "))
    ws = F.col("__ws")
    n = F.size(ws)
    uni = docs.select(F.explode(ws).alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    ut = uni.agg(F.count("*").alias("tu"))
    grams = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bg = docs.select(
        F.explode(
            F.transform(
                grams,
                lambda i: F.struct(
                    F.element_at(ws, i).alias("wa"),
                    F.element_at(ws, i + 1).alias("wb"),
                ),
            )
        ).alias("p")
    ).select("p.wa", "p.wb")
    bcnt = bg.groupBy("wa", "wb").agg(F.count("*").alias("cxy")).filter(F.col("cxy") >= 5)
    bt = bg.agg(F.count("*").alias("tb"))
    ca = ucnt.select(F.col("w").alias("wa"), F.col("c").alias("ca"))
    cb = ucnt.select(F.col("w").alias("wb"), F.col("c").alias("cb"))
    p = F.col("cxy") * F.col("tu") * F.col("tu")
    q = F.col("tb") * F.col("ca") * F.col("cb")
    return (
        bcnt.join(ca, "wa")
        .join(cb, "wb")
        .crossJoin(F.broadcast(ut))
        .crossJoin(F.broadcast(bt))
        .filter(p >= q)
        .select(
            "wa",
            "wb",
            "cxy",
            (F.length(F.bin(F.expr(
                "(cxy * tu * tu) div (tb * ca * cb)"
            ))) - 1).cast("long").alias("pmi_bits"),
        )
        .orderBy(F.desc("pmi_bits"), F.desc("cxy"), "wa", "wb")
        .limit(100)
    )


@query(
    "x_boilerplate_scrub",
    # C4/CCNet-style boilerplate removal: a span that recurs across MANY
    # DISTINCT documents (headers, footers, cookie banners, license
    # blurbs) is boilerplate — remove EVERY occurrence (unlike
    # x_segment_dedup_scrub, which keeps the first) and rebuild the doc.
    # Unit of removal: the same 8-word segment as the scrub; threshold:
    # document frequency >= 3.
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    segs AS (
      SELECT doc_id, CAST(t.i AS BIGINT) AS seg,
             array_to_string(ws[(t.i*8+1):(t.i*8+8)], ' ') AS seg_text
      FROM docs, LATERAL unnest(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS t(i)),
    dfreq AS (SELECT seg_text, count(DISTINCT doc_id) AS df
              FROM segs GROUP BY seg_text)
    SELECT s.doc_id,
           coalesce(string_agg(CASE WHEN d.df < 3 THEN s.seg_text END,
                               ' ' ORDER BY s.seg), '') AS clean_text,
           CAST(count(*) FILTER (WHERE d.df >= 3) AS BIGINT) AS n_boiler,
           CAST(count(*) AS BIGINT) AS n_segs
    FROM segs s JOIN dfreq d USING (seg_text)
    GROUP BY s.doc_id
    """,
    doc="boilerplate removal (C4-style): drop every 8-word segment whose document frequency >= 3 (headers/footers/banners), rebuild doc text; reports boilerplate segment counts per doc",
)
def x_boilerplate_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """The document-frequency twin of x_segment_dedup_scrub: dedup asks
    "has this exact span appeared anywhere before?" (keep first);
    boilerplate asks "does this span appear across enough distinct
    documents to be template text?" (keep none). Production corpus prep
    runs BOTH — dedup against copies, this against templates.

    100 TB shape: identical to the scrub — one shuffle on seg_text
    whose window computes each segment's document frequency in place
    (r15: formerly a countDistinct aggregate joined back, whose
    broadcast build re-ran the segment explode) and one on doc_id to
    reassemble. At production scale the seg_text window key becomes
    xxhash64 (same note as the scrub)."""
    return boilerplate_scrub(load_table(spark, sf, "documents"))


def boilerplate_scrub(
    docs: DataFrame, seg_words: int = 8, min_df: int = 3
) -> DataFrame:
    """Core of x_boilerplate_scrub over any (doc_id, text) DataFrame —
    factored out (like segment_scrub) so property tests can drive it
    with adversarial synthetic corpora."""
    segs = doc_segments(docs, seg_words)
    # r15 (guide §2.4, the segment_scrub restructure): the former
    # countDistinct aggregate fed a join back onto its own input, so
    # the corpus segment explode ran twice (broadcast build recomputes
    # its subtree). size(collect_set(doc_id)) over a seg_text window is
    # the same document frequency computed in place on ONE explode —
    # the unbounded frame evaluates the set once per partition, and a
    # partition is one segment's occurrence list (bounded by template
    # spread, never corpus-sized). Every row still flows to the doc_id
    # rollup, so no selective pre-shuffle filter is lost.
    joined = segs.withColumn(
        "df", F.size(F.collect_set("doc_id").over(Window.partitionBy("seg_text")))
    )
    keep = (F.col("df") < min_df).cast("int")
    return joined.groupBy("doc_id").agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep == 1, F.struct("seg", "seg_text"))
                        )
                    ),
                    lambda s: s["seg_text"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
        F.sum(1 - keep).cast("long").alias("n_boiler"),
        F.count("*").cast("long").alias("n_segs"),
    )


# Count-min sketch geometry: 4 independent md5-keyed hash rows x 256
# buckets. Depth drives the error PROBABILITY (P[est > true + eps*N] <=
# (1/2)^depth-ish), width drives the error MAGNITUDE (eps = e/width);
# at corpus scale widen width with the token-stream mass, not the
# vocabulary.
_CMS_DEPTH = 4
_CMS_WIDTH = 256


@query(
    "x_countmin_sketch",
    # Build the sketch AND audit it in one query: cells are exact
    # integer sums, the estimate for a probe token is min over rows of
    # its cell — the CMS one-sided guarantee (est >= true) makes the
    # overcount column provably non-negative, which the pytest contract
    # pins. Hash rows use the md5-prefix integer (the repo's ONE
    # deterministic hash coin) so DuckDB replays the exact geometry.
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
    tc AS (SELECT t, CAST(count(*) AS BIGINT) AS n
           FROM tok WHERE t <> '' GROUP BY t),
    cells AS (
        SELECT dd.d,
               ('0x' || substr(md5(CAST(dd.d AS VARCHAR) || ':' || t), 1, 8))::BIGINT
                 % {_CMS_WIDTH} AS b,
               CAST(SUM(n) AS BIGINT) AS cell
        FROM tc, LATERAL unnest(range(0, {_CMS_DEPTH})) AS dd(d)
        GROUP BY 1, 2),
    probes AS (SELECT t, n FROM tc ORDER BY n DESC, t LIMIT 10),
    pb AS (
        SELECT p.t, p.n, dd.d,
               ('0x' || substr(md5(CAST(dd.d AS VARCHAR) || ':' || p.t), 1, 8))::BIGINT
                 % {_CMS_WIDTH} AS b
        FROM probes p, LATERAL unnest(range(0, {_CMS_DEPTH})) AS dd(d))
    SELECT pb.t AS token, pb.n AS true_n,
           CAST(min(c.cell) AS BIGINT) AS est_n,
           CAST(min(c.cell) - pb.n AS BIGINT) AS overcount
    FROM pb JOIN cells c ON c.d = pb.d AND c.b = pb.b
    GROUP BY pb.t, pb.n
    """,
    doc="count-min sketch: 4x256 md5-row token-count sketch built as exact integer cell sums, audited by probing the 10 heaviest tokens (est = min over rows; overcount >= 0 by construction)",
)
def x_countmin_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """The mergeable heavy-hitter sketch for streams the exact groupBy
    cannot hold: cells are (depth x width) integers regardless of
    vocabulary size, and two sketches merge by cell-wise addition —
    i.e. the partial-aggregate property Spark's map-side combine
    needs, demonstrated here by building the cells AS a groupBy.

    100 TB shape: one shuffle of (d, bucket) keyed partial sums —
    cardinality depth*width (1024), bounded regardless of corpus; the
    probe lookup joins a 40-row broadcast against the 1024-row cell
    table. The estimate bias (overcount) on the fixture's heavy
    tokens is exactly what the pinned pytest contract brackets."""
    docs = load_table(spark, sf, "documents")
    tc = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("n"))
    )

    def bucket(d: int, col):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{d}:"), col)), 1, 8), 16, 10
            ).cast("bigint")
            % _CMS_WIDTH
        )

    rows = F.explode(
        F.array(*[
            F.struct(F.lit(d).cast("long").alias("d"), bucket(d, F.col("t")).alias("b"))
            for d in range(_CMS_DEPTH)
        ])
    )
    cells = (
        tc.select("n", rows.alias("db"))
        .groupBy(F.col("db.d").alias("d"), F.col("db.b").alias("b"))
        .agg(F.sum("n").cast("long").alias("cell"))
    )
    probes = tc.orderBy(F.desc("n"), "t").limit(10)
    pb = probes.select(
        F.col("t"), F.col("n"), rows.alias("db")
    ).select("t", "n", F.col("db.d").alias("d"), F.col("db.b").alias("b"))
    return (
        pb.join(cells, ["d", "b"])
        .groupBy(F.col("t").alias("token"), F.col("n").alias("true_n"))
        .agg(F.min("cell").cast("long").alias("est_n"))
        .select(
            "token",
            "true_n",
            "est_n",
            (F.col("est_n") - F.col("true_n")).cast("long").alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# round-6 continuation: stratified split / DSIR selection
# ---------------------------------------------------------------------------


@query(
    "x_stratified_split",
    # Stratified train/val/test split with EXACT per-stratum quotas:
    # x_deterministic_split's independent md5-coin gives each stratum
    # only ~80/10/10 in expectation (a small source can land 100/0/0);
    # curriculum and eval design need the split ratio to hold WITHIN
    # every stratum. Assignment = rank the stratum by (md5(text),
    # doc_id) and cut at floor(0.8n)/floor(0.9n) — the cut compare is
    # pure integer (rn*10 <= n*8), no float ratio anywhere.
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id)
                 AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents)
    SELECT source,
           CASE WHEN rn * 10 <= n * 8 THEN 'train'
                WHEN rn * 10 <= n * 9 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc,
           CAST(min(rn) AS BIGINT) AS rank_lo,
           CAST(max(rn) AS BIGINT) AS rank_hi
    FROM r GROUP BY source, split
    """,
    doc="exact stratified 80/10/10 split per source: two-level prefix-sum rank (256-way salt) instead of one window partition per stratum; integer cut compare",
)
def x_stratified_split(spark: SparkSession, sf: str) -> DataFrame:
    """Exact within-stratum ranking WITHOUT a per-stratum global sort.

    The oracle's single `row_number() OVER (PARTITION BY source)` puts
    an entire stratum in ONE task — a billion-document source at 100 TB
    is a straggler-and-spill wall. The distributed form salts each
    stratum 256 ways on the first md5 byte and reassembles the exact
    global rank as a two-level prefix sum (the x_compaction_plan
    pattern):

      1. rank within (source, hex-byte bucket) — 256 parallel windows
         per stratum, each 1/256th of the data;
      2. per-(source, bucket) counts -> exclusive running offset over
         buckets in hex order (aggregate-sized: n_sources x 256 rows,
         driver-trivial regardless of corpus size);
      3. global rank = bucket offset + within-bucket rank. Because the
         bucket key is a PREFIX of the sort key, concatenating buckets
         in key order reproduces the unsalted total order exactly.

    The offset/total tables are aggregate outputs bounded by the key
    domain (sources x 256), never by corpus size — the broadcasts here
    stay broadcast-sized at any SF, unlike the customer-derived build
    sides the r5 verdict demoted."""
    docs = load_table(spark, sf, "documents").select(
        "source", "doc_id", F.md5("text").alias("h")
    )
    docs = docs.withColumn("bkt", F.substring("h", 1, 2))
    bc = docs.groupBy("source", "bkt").agg(F.count("*").alias("c"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = bc.select(
        "source",
        "bkt",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).cast("long").alias("off"),
    )
    tot = bc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    w_in = Window.partitionBy("source", "bkt").orderBy("h", "doc_id")
    ranked = (
        docs.withColumn("r_in", F.row_number().over(w_in))
        .join(F.broadcast(off), ["source", "bkt"])
        .join(F.broadcast(tot), "source")
        .withColumn("rn", (F.col("off") + F.col("r_in")).cast("long"))
    )
    split = (
        F.when(F.col("rn") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rn") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
    )
    return ranked.groupBy("source", split.alias("split")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.min("rn").alias("rank_lo"),
        F.max("rn").alias("rank_hi"),
    )


@query(
    "x_dsir_resample",
    # DSIR data selection (Xie et al. 2023, "Data Selection for Language
    # Models via Importance Resampling"): score every candidate document
    # by how target-like its hashed n-gram feature distribution is, then
    # keep the top of the raw pool. Features = unigrams hashed into 4096
    # buckets (md5 coin); target = the 'en' slice; per-bucket importance
    # is quantized to exact integer bits with the x_pmi_collocations
    # shift trick:
    #   wgt_b = floor(log2((t_b+1)/(r_b+1) * 2^20))
    #         = length(bin(((t_b+1) << 20) // (r_b+1))) - 1   in [0, 20]
    # (add-one smoothing; t <= r so the shifted ratio is <= 2^20, and
    # bin(0) has length 1 so ratios below 2^-20 clamp to 0). The offset
    # +20 per gram is shared by every bucket, so per-token normalization
    # (score*1e6 div n_grams, floor division on NON-NEGATIVE ints —
    # Spark `div` truncation == DuckDB `//` floor only holds for >= 0,
    # which the offset guarantees) preserves the DSIR ranking.
    oracle="""
    WITH tk AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                FROM documents),
    toks AS (SELECT doc_id, lang,
                    ('0x' || substr(md5(w), 1, 8))::BIGINT % 4096 AS b
             FROM tk),
    bc AS (SELECT b, CAST(count(*) AS BIGINT) AS r,
                  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t
           FROM toks GROUP BY b),
    wt AS (SELECT b,
                  CAST(length(bin((t + 1) * 1048576 // (r + 1))) - 1 AS BIGINT)
                      AS wgt
           FROM bc),
    sc AS (SELECT toks.doc_id, any_value(toks.lang) AS lang,
                  CAST(count(*) AS BIGINT) AS n_grams,
                  CAST(sum(wgt) AS BIGINT) AS score_bits
           FROM toks JOIN wt USING (b)
           WHERE toks.lang <> 'en'
           GROUP BY toks.doc_id)
    SELECT doc_id, lang, n_grams, score_bits,
           CAST((score_bits * 1000000) // n_grams AS BIGINT) AS score_npm
    FROM sc
    ORDER BY score_npm DESC, doc_id
    LIMIT 100
    """,
    doc="DSIR importance selection: hashed-unigram bucket weights log2((t+1)/(r+1)) as exact integer bits, top-100 non-target docs by per-token score",
)
def x_dsir_resample(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: ONE shuffle builds the bucket table (groupBy on the
    4096-way hash with map-side partials computing raw count and
    target-filtered count together — not two passes), the weight table
    is FIXED SIZE (4096 rows, independent of corpus size — a broadcast
    that never grows, unlike a vocabulary join), the per-gram weight
    lookup is therefore a map-side broadcast-hash probe, and the doc
    score is one more groupBy(doc_id). Top-100 is
    TakeOrderedAndProject. Overflow: (t+1) << 20 stays in int64 below
    ~8.8e12 target tokens per bucket; past that Spark's int64 multiply
    does NOT auto-promote (ANSI mode throws ARITHMETIC_OVERFLOW) — at
    that corpus size cast t/r to decimal(38,0) explicitly on both
    engines before the shift, as x_anomaly_zscore does."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).select("doc_id", "lang", md5_bucket("w", 4096).alias("b"))
    bc = toks.groupBy("b").agg(
        F.count("*").cast("long").alias("r"),
        F.sum((F.col("lang") == "en").cast("long")).cast("long").alias("t"),
    )
    wt = bc.select(
        "b",
        (F.length(F.bin(F.expr("((t + 1L) * 1048576L) div (r + 1L)"))) - 1)
        .cast("long")
        .alias("wgt"),
    )
    return (
        toks.filter(F.col("lang") != "en")
        .join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").cast("long").alias("n_grams"),
            F.sum("wgt").cast("long").alias("score_bits"),
        )
        .select(
            "doc_id",
            "lang",
            "n_grams",
            "score_bits",
            F.expr("(score_bits * 1000000L) div n_grams").cast("long").alias("score_npm"),
        )
        .orderBy(F.desc("score_npm"), "doc_id")
        .limit(100)
    )


@query(
    "x_record_linkage",
    # Blocked record linkage: find plausibly-duplicate customer records
    # as same-nation name pairs within edit distance 2. The classic
    # entity-resolution shape — a BLOCKING key turns the O(n^2)
    # all-pairs compare into per-block candidate sets (the same move
    # MinHash banding makes for documents), and the pair compare is the
    # JVM levenshtein with an early-exit threshold. Pair order is
    # canonicalized a_key < b_key so each pair appears once.
    oracle="""
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           CAST(a.c_nationkey AS BIGINT) AS nationkey,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    doc="blocked entity resolution: same-nation customer-name pairs at levenshtein <= 2, threshold-capped JVM edit distance",
)
def x_record_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """Scale shape (r10 rewrite): DELETION-NEIGHBORHOOD blocking
    (FastSS, Bocek et al. 2007, public). If levenshtein(a, b) <= 2,
    every edit op touches at most one character of each string, so
    deleting the touched positions from each side yields EQUAL strings
    — a and b must share a "delete <= 2 characters" variant. Each name
    therefore explodes into its 1 + L + C(L,2) deletion variants
    (L=18 -> 172), hashed to a 64-bit key, and the candidate set is an
    EQUI-join on (nationkey, xxhash64(variant)). The key is lossless
    (hash collisions only ADD candidates; every candidate is verified
    by the JVM early-exit levenshtein(a, b, 2), which bails at distance
    3 instead of filling the DP matrix — hence the BETWEEN). Variant
    generation is a double explode over integer sequences with pure
    substring/concat projection — whole-stage codegen, no higher-order
    lambdas (see negative result below).

    Why not block on (nationkey, length), the r7 design: lengths are
    near-constant for generator-style names, so blocks were whole
    nations and pair work grew as sum_block |b|^2 — quadratic in corpus
    size with a FIXED block count (the r9 scale-killer finding). The
    deletion key's entropy comes from the name CONTENT (a variant
    retains all but 2 characters), so block sizes track true near-dup
    density, not corpus size: generated rows are 172n (linear) and
    join output is ~(true pairs x shared-variant multiplicity, <= ~18
    for dist-1 pairs, a few for dist-2).

    Shuffle discipline: the variant join carries ONLY (nationkey, vh,
    key) — 24 bytes/row; names are re-joined AFTER the pair distinct,
    which is output-bound. Carrying names through the variant shuffle
    measured 3x slower (19.2s vs 6.5s, sf0.1). The variant self-join is
    HINTED to sort-merge: Catalyst's size estimate does not see the
    172x explode fan-out, so it happily broadcasts a side that is tiny
    pre-explode and gigabytes post- — at 50x (750k names -> 129M
    variant rows) the broadcast collect blew spark.driver.maxResultSize
    and killed the job (r10 probe). With the SMJ pin: sf0.1 3.0s,
    sf1 9.2s (ratio 3.0 on 10x data), sf50 124s end-to-end — and the
    broadcast plan was SLOWER even where it survived (8.6s at sf0.1;
    the 60 MB broadcast rebuild per executor dwarfs the shuffle).
    shuffle_hash measured ~7% faster at sf0.1 but OOMs its per-task
    build map at 50x — SMJ is the strategy that holds at every scale.
    vs the r7 length-blocked form: sf0.1 3.0s vs 8.7s; sf1 9.2s vs
    158s — time ratio 3.0x on 10x data (sublinear) vs 18x (quadratic).

    Negative result (r9, measured, still binding): the bag-of-chars
    count filter (L1 over per-digit counts <= 2*dist, Gravano et al.
    2001) pruned correctly but ran 3x SLOWER end-to-end — Spark
    evaluates higher-order array lambdas (transform/zip_with/aggregate)
    interpreted per element. The deletion variants deliberately use
    explode + substring/concat instead of a transform() lambda for the
    same reason. Cited behavior: the reference dedups records by exact
    groupBy only (internal/core/catalog.go); near-duplicate linkage is
    the documents-pipeline generalization of that to fuzzy keys."""
    cust = load_table(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    # (i, j) encode the deletion set: (0,0) = none; (i,i) = delete i;
    # (i,j), i<j = delete both (1-based positions).
    var_expr = (
        "CASE WHEN i = 0 THEN c_name "
        "WHEN j = i THEN concat(substring(c_name, 1, i-1),"
        " substring(c_name, i+1, 1000000)) "
        "ELSE concat(substring(c_name, 1, i-1),"
        " substring(c_name, i+1, j-i-1), substring(c_name, j+1, 1000000)) END"
    )
    v = (
        cust.select(
            "c_custkey", "c_nationkey", "c_name",
            F.explode(F.expr("sequence(0, length(c_name))")).alias("i"),
        )
        .select(
            "c_custkey", "c_nationkey", "c_name", "i",
            F.explode(
                F.expr("CASE WHEN i = 0 THEN array(0) ELSE sequence(i, length(c_name)) END")
            ).alias("j"),
        )
        .select(
            "c_custkey", "c_nationkey", F.expr(f"xxhash64({var_expr})").alias("vh")
        )
    )
    a = v.select(
        F.col("c_custkey").alias("a_key"), F.col("c_nationkey").alias("nationkey"), "vh"
    )
    b = v.select(
        F.col("c_custkey").alias("b_key"), F.col("c_nationkey").alias("nationkey"), "vh"
    ).hint("merge")  # never broadcast the exploded side (see docstring)
    pairs = (
        a.join(b, ["nationkey", "vh"])
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "nationkey")
        .distinct()
    )
    na = cust.select(F.col("c_custkey").alias("a_key"), F.col("c_name").alias("a_name"))
    nb = cust.select(F.col("c_custkey").alias("b_key"), F.col("c_name").alias("b_name"))
    return (
        pairs.join(na, "a_key")
        .join(nb, "b_key")
        .withColumn("dist", F.levenshtein("a_name", "b_name", 2))
        .filter(F.col("dist").between(0, 2))
        .select(
            "a_key", "b_key",
            F.col("nationkey").cast("long").alias("nationkey"),
            F.col("dist").cast("long").alias("dist"),
        )
    )


@query(
    "x_inverted_index",
    # Positional inverted index — the core retrieval structure (and the
    # precursor of x_tfidf / x_bm25_score, which consume term stats
    # without materializing postings): term -> (doc_id, tf, sorted
    # position list). Positions are 1-based token ordinals so phrase
    # queries can check adjacency. Output stays scalar/array-typed
    # (no structs) because the cross-engine hash canonicalizes lists
    # identically but renders Spark Rows and DuckDB structs differently.
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents)
    SELECT w AS term, doc_id,
           CAST(count(*) AS BIGINT) AS tf,
           array_to_string(list_sort(list(CAST(pos AS BIGINT))), '|')
               AS positions
    FROM tk GROUP BY w, doc_id
    """,
    doc="positional inverted index: term -> (doc, tf, sorted 1-based position list) via posexplode + sorted collect",
)
def x_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """One shuffle on (term, doc_id) builds every posting in parallel —
    postings for a term are SHARDED across reducers by doc, which is
    how a 100 TB index build avoids the single-reducer-per-hot-term
    wall (the downstream consumer merges doc-sharded postings, or
    re-shuffles by term range for the final segment write; a stopword
    like 'the' never has to fit one task here). collect_list within a
    (term, doc) group is bounded by document length, not corpus size.
    posexplode gives 0-based ordinals; +1 matches the oracle's
    generate_subscripts."""
    docs = load_table(spark, sf, "documents")
    return _postings(docs).select("term", "doc_id", "tf", "positions")


def _postings(docs: DataFrame) -> DataFrame:
    """Positional postings ``(doc_id, term, tf, positions)`` over any
    ``(doc_id, text)`` DataFrame — the shared tokenize-and-group of
    x_inverted_index and x_incremental_index's add path (r15 review:
    one build, not two copies that must change in lockstep; the
    replay-contract test keeps its own independent copy on purpose).
    One shuffle on (term, doc_id); positions are sorted 1-based token
    ordinals joined with '|'."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    )
    return toks.groupBy("doc_id", F.col("w").alias("term")).agg(
        F.count("*").cast("long").alias("tf"),
        F.array_join(
            F.sort_array(F.collect_list((F.col("pos0") + 1).cast("long"))),
            "|",
        ).alias("positions"),
    )


@query(
    "x_incremental_index",
    # Incremental inverted-index maintenance — the gate of the
    # text-index family (the lifecycle sibling of x_incremental_dedup /
    # x_incremental_ann / x_incremental_neardup, closing the family
    # symmetry for x_inverted_index / x_tfidf / x_bm25_score /
    # x_phrase_search, which until now only had a from-scratch build).
    # Fixture: docs < 250 are already indexed (the history segment);
    # a maintenance delivery arrives carrying docs >= 240 (at-least-once
    # redelivery overlaps 10 already-indexed docs, which the doc-ledger
    # gate must drop) plus a takedown feed tombstoning indexed docs with
    # doc_id % 25 == 3 (the deterministic-takedown convention the
    # compactor family uses, so the oracle can replay it). The op emits
    # the DELTA a segment writer applies: 'add' rows at postings grain
    # for gated batch docs, 'delete' rows at DOC grain for takedowns —
    # doc-grain deletes are the Lucene tombstone model: recording a
    # takedown costs O(1), with the doc->postings lookup deferred to
    # segment compaction (x_index_compaction).
    oracle="""
    WITH indexed AS (SELECT doc_id FROM documents WHERE doc_id < 250),
    gated AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id >= 240
        AND doc_id NOT IN (SELECT doc_id FROM indexed)),
    tk AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM gated),
    adds AS (
      SELECT 'add' AS action, doc_id, w AS term,
             CAST(count(*) AS BIGINT) AS tf,
             array_to_string(list_sort(list(CAST(pos AS BIGINT))), '|')
                 AS positions
      FROM tk GROUP BY doc_id, w),
    dels AS (
      SELECT 'delete' AS action, doc_id,
             CAST(NULL AS VARCHAR) AS term,
             CAST(NULL AS BIGINT) AS tf,
             CAST(NULL AS VARCHAR) AS positions
      FROM indexed WHERE doc_id % 25 = 3)
    SELECT * FROM adds UNION ALL SELECT * FROM dels
    """,
    doc="incremental inverted-index gate: postings-grain 'add' delta for ledger-gated new docs + doc-grain 'delete' tombstones for takedowns (Lucene delete model: O(1) tombstone record, physical removal deferred to compaction)",
)
def x_incremental_index(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan, three bounded pieces. (1) The doc-ledger gate is a
    left_anti join of the delivery against ONE narrow column (distinct
    indexed doc_id) — columnar pruning reads nothing else off the
    history segment, and the join co-partitions both sides on doc_id
    (AQE broadcasts the smaller at fixture scale). This is the
    reference's Redis-SET membership test (ref
    internal/core/resource.go:54-108) applied to index membership.
    (2) The add path is x_inverted_index's one (term, doc_id) shuffle
    restricted to the GATED BATCH — bounded by delivery size, never
    corpus size, and doc-sharded so a stopword never has to fit one
    task. (3) The delete path never touches the index at all: a
    takedown is recorded as a doc-grain tombstone in O(1) — the Lucene
    insight that makes deletes affordable at 100 TB, where the
    doc->postings lookup would be a full index scan; x_index_compaction
    pays that cost once, physically, at segment-merge time."""
    docs = load_table(spark, sf, "documents")
    indexed = docs.filter(F.col("doc_id") < 250).select("doc_id")
    gated = docs.filter(F.col("doc_id") >= 240).join(indexed, "doc_id", "left_anti")
    adds = _postings(gated).select(
        F.lit("add").alias("action"), "doc_id", "term", "tf", "positions"
    )
    dels = indexed.filter(F.col("doc_id") % 25 == 3).select(
        F.lit("delete").alias("action"),
        "doc_id",
        F.lit(None).cast("string").alias("term"),
        F.lit(None).cast("long").alias("tf"),
        F.lit(None).cast("string").alias("positions"),
    )
    return adds.unionByName(dels)


@query(
    "x_index_compaction",
    # Segment compaction — the GC half of the text-index lifecycle
    # (gate = x_incremental_index). Segments are doc_id ranges of 100
    # (the doc-partitioned segment layout the gate's doc-sharded builds
    # produce); the accumulated tombstone ledger is doc_id % 25 == 3
    # (same deterministic-takedown convention as the gate and
    # x_neardup_compaction, replayable by the oracle). A tiered merge
    # folds segment pairs (merged = doc_id div 200) and PHYSICALLY
    # drops tombstoned docs' postings — the deferred cost the gate's
    # O(1) doc-grain tombstones postponed. Output is the merge
    # MANIFEST a compactor reports, segment-grain: surviving
    # docs/terms/postings/tf, dropped docs/postings, doc range.
    oracle="""
    WITH post AS (
      SELECT doc_id, w, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
      GROUP BY doc_id, w),
    tagged AS (
      SELECT doc_id, w, tf,
             CAST(FLOOR(doc_id / 200) AS BIGINT) AS segment,
             CAST(FLOOR(doc_id / 100) AS BIGINT) AS src_seg,
             (doc_id % 25 = 3) AS tomb
      FROM post)
    SELECT segment,
      CAST(count(DISTINCT src_seg) AS BIGINT) AS n_src_segments,
      CAST(count(DISTINCT CASE WHEN NOT tomb THEN doc_id END) AS BIGINT)
          AS n_docs,
      CAST(count(DISTINCT CASE WHEN NOT tomb THEN w END) AS BIGINT)
          AS n_terms,
      CAST(count(CASE WHEN NOT tomb THEN 1 END) AS BIGINT) AS n_postings,
      CAST(sum(CASE WHEN NOT tomb THEN tf ELSE 0 END) AS BIGINT)
          AS total_tf,
      CAST(count(DISTINCT CASE WHEN tomb THEN doc_id END) AS BIGINT)
          AS dropped_docs,
      CAST(count(CASE WHEN tomb THEN 1 END) AS BIGINT)
          AS dropped_postings,
      CAST(min(CASE WHEN NOT tomb THEN doc_id END) AS BIGINT) AS min_doc,
      CAST(max(CASE WHEN NOT tomb THEN doc_id END) AS BIGINT) AS max_doc
    FROM tagged GROUP BY segment
    """,
    doc="inverted-index segment compaction: tiered pairwise merge of doc-range segments with physical tombstone GC; emits the segment-grain merge manifest (surviving docs/terms/postings/tf, dropped docs/postings, doc range)",
)
def x_index_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: ONE shuffle builds postings at (doc_id, term)
    grain — doc-sharded, so hot terms spread across reducers — and the
    manifest aggregation reduces to segment grain, whose cardinality is
    bounded by the doc-id key space div 200, not by corpus size
    (map-side combine collapses almost everything before the exchange).
    The tombstone set here is a replayable modulus filter (zero cost);
    at a real corpus it is a doc-grain ledger applied as a broadcast
    anti-join or a roaring bitmap per segment — either way doc-keyed,
    never a postings scan, which is exactly the cost model the gate's
    O(1) delete records rely on. Compaction is where df/idf statistics
    become exact again after deletes: the manifest's n_docs/n_postings
    are the post-GC truth that x_tfidf / x_bm25_score would refresh
    from. Degenerate edge: a merged segment whose docs are ALL
    tombstoned keeps its row (n_docs 0, NULL doc range) so the
    manifest conserves the source-segment census."""
    docs = load_table(spark, sf, "documents")
    post = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .withColumn("segment", F.floor(F.col("doc_id") / 200).cast("long"))
        .withColumn("src_seg", F.floor(F.col("doc_id") / 100).cast("long"))
        .withColumn("tomb", F.col("doc_id") % 25 == 3)
    )
    return _index_merge_manifest(post)


def _index_merge_manifest(post: DataFrame) -> DataFrame:
    """Segment-grain merge manifest over a tagged postings DataFrame
    ``(doc_id, w, tf, segment, src_seg, tomb)`` — the core of
    x_index_compaction, factored so contract tests can pin topologies
    the fixture's modulus tombstones never produce (an all-tombstoned
    merged segment must KEEP its manifest row with n_docs 0 and a NULL
    doc range, conserving the source-segment census)."""
    tomb = F.col("tomb")
    surv = ~tomb
    return post.groupBy("segment").agg(
        F.countDistinct("src_seg").cast("long").alias("n_src_segments"),
        F.countDistinct(F.when(surv, F.col("doc_id"))).cast("long").alias("n_docs"),
        F.countDistinct(F.when(surv, F.col("w"))).cast("long").alias("n_terms"),
        F.count(F.when(surv, F.lit(1))).cast("long").alias("n_postings"),
        F.sum(F.when(surv, F.col("tf")).otherwise(F.lit(0))).cast("long").alias("total_tf"),
        F.countDistinct(F.when(tomb, F.col("doc_id"))).cast("long").alias("dropped_docs"),
        F.count(F.when(tomb, F.lit(1))).cast("long").alias("dropped_postings"),
        F.min(F.when(surv, F.col("doc_id"))).cast("long").alias("min_doc"),
        F.max(F.when(surv, F.col("doc_id"))).cast("long").alias("max_doc"),
    )


@query(
    "x_index_overlay_search",
    # The READ path of the text-index lifecycle (gate =
    # x_incremental_index, GC = x_index_compaction): serve BM25 top-20
    # THROUGH the base+delta overlay — base postings minus the doc-grain
    # tombstone ledger, union the gate's admitted adds — without
    # re-indexing and without waiting for compaction. Same fixture
    # conventions as the gate (history < 250, admitted batch >= 250,
    # tombstones doc_id % 25 == 3) and the same unlowered tokenization
    # as x_inverted_index (the index being served). The oracle is the
    # from-scratch BM25 (x_bm25_score's decimal-pinned arithmetic) over
    # the SURVIVING corpus: overlay serving must equal reindexing.
    oracle=f"""
    WITH surv AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id >= 250 OR doc_id % 25 <> 3),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM surv),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, tok AS term, count(*) AS tf
        FROM t CROSS JOIN LATERAL unnest(toks) AS u(tok)
        WHERE tok IN {_BM25_TERMS!r}
        GROUP BY doc_id, tok),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               {_BM25_TERM_SCORE_SQL} AS term_score
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
    SELECT doc_id, CAST(ROUND(SUM(term_score), 4) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    doc="BM25 top-20 served through the base+delta index overlay (base postings - doc tombstones + gate adds), pinned equal to from-scratch BM25 over the surviving corpus — search stays correct between compactions",
)
def x_index_overlay_search(spark: SparkSession, sf: str) -> DataFrame:
    """Why this op exists: the gate's O(1) doc-grain deletes and
    postings-grain adds are only a win if search can USE them before
    the compactor runs. This is segment-overlay serving (the Lucene
    read model): base postings are read with the tombstone ledger
    applied as a doc-keyed anti-join, the delta's admitted adds are
    unioned on top, and BM25's df/dl/avgdl statistics are computed
    over the overlay — so scores equal a from-scratch reindex of the
    surviving corpus (the oracle pins exactly that).

    100 TB shape: both postings reads are filtered to the query's
    terms BEFORE any shuffle (term pruning at the scan — a term-
    partitioned segment layout makes that a partition prune), so
    everything downstream is |query|-bounded per doc. The tombstone
    anti-join is doc-keyed against the doc-grain ledger (tiny,
    broadcast); df/avgdl are small aggregates broadcast back; one
    doc-keyed agg then a global top-k (TakeOrderedAndProject). The
    base/delta split adds ONE unionByName over the same-shaped
    postings — no term ever pays more than its posting lists."""
    docs = load_table(spark, sf, "documents")
    hist_docs = docs.filter(F.col("doc_id") < 250)
    batch_docs = docs.filter(F.col("doc_id") >= 250)
    tombs = hist_docs.filter(F.col("doc_id") % 25 == 3).select("doc_id")
    base = _postings(hist_docs).filter(F.col("term").isin(*_BM25_TERMS))
    delta = _postings(batch_docs).filter(F.col("term").isin(*_BM25_TERMS))
    tf = (
        base.join(tombs, "doc_id", "left_anti")
        .unionByName(delta)
        .select("doc_id", "term", "tf")
    )
    surviving = hist_docs.join(tombs, "doc_id", "left_anti").unionByName(batch_docs)
    dl = surviving.select(
        "doc_id", F.size(F.split("text", " ")).alias("dl")
    )
    stats = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", _bm25_term_score().alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@query(
    "x_dup_span_scrub",
    # ExactSubstr-style duplicated-span accounting (Lee et al. 2021,
    # "Deduplicating Training Data Makes Language Models Better",
    # arXiv:2107.06499, public): a token position is "covered" when any
    # 5-gram starting at-or-before it occurs >= 2 times in the corpus
    # (cross-doc or self-repetition alike); the op reports per doc how
    # many tokens survive span removal. The oracle rebuilds positional
    # 5-grams with the _NG_SQL positional self-join (duckdb 1.0 cannot
    # lateral generate_series over a column) and the same interval
    # union.
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        FROM documents),
    pg AS (
        SELECT a.doc_id, a.pos - 1 AS pos,
               a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok
                 || ' ' || e.tok AS g
        FROM tok a
        JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        JOIN tok d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
        JOIN tok e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
    dup AS (SELECT g FROM pg GROUP BY g HAVING count(*) >= 2),
    dpos AS (SELECT doc_id, pos FROM pg WHERE g IN (SELECT g FROM dup)),
    cov AS (
        SELECT doc_id, pos,
               lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM dpos),
    agg AS (
        SELECT doc_id, count(*) AS n_dup_grams,
               SUM(LEAST(5, COALESCE(nxt - pos, 5))) AS covered
        FROM cov GROUP BY doc_id),
    base AS (
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tokens
        FROM documents)
    SELECT base.doc_id,
           n_tokens,
           CAST(COALESCE(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(COALESCE(covered, 0) AS BIGINT) AS covered_tokens,
           CAST(ROUND((n_tokens - COALESCE(covered, 0))
                      / CAST(n_tokens AS DOUBLE), 4) AS DOUBLE) AS keep_ratio
    FROM base LEFT JOIN agg USING (doc_id)
    ORDER BY base.doc_id
    """,
    doc="duplicated-substring span scrub (ExactSubstr approximation at 5-gram granularity): per-doc surviving-token accounting after removing every maximal run of corpus-duplicated 5-grams — interval union as a lead() window, no arrays, no all-pairs",
)
def x_dup_span_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: three bounded stages. (1) positional 5-grams are
    hashed to 8-byte xxhash64 keys in the explode itself (the gram
    string never materializes; same collision trade as
    x_duplicate_ngram_fraction, pinned by this op's exact-string
    oracle). Collision bound, explicit (ADVICE r6): a false dup needs
    two DISTINCT gram strings sharing a 64-bit hash; by birthday bound
    that is ~G^2 / 2^65 expected collisions over G distinct grams —
    ~5e-8 at the sf0.1 fixture (G ~= 10^6), still < 3% expected
    collisions at G = 10^9. At a real 100 TB corpus (G ~= 10^12),
    switch the key to the 128-bit hash pair
    (xxhash64(g), xxhash64(g, 1)) or post-hoc string-confirm flagged
    grams; a collision here inflates dup counts silently and would
    surface only as an opaque oracle-hash failure. The ONE fact-sized
    shuffle is the gram-hash groupBy, which
    map-side-combines hard because duplicated grams are exactly the
    common ones. (2) The >=2 gram set — bounded by duplicated grams,
    not corpus size — semi-joins back un-hinted, so AQE broadcasts it
    at fixture scale and shuffle-joins at 100 TB. (3) Covered tokens
    are the union length of [pos, pos+4] intervals, computed exactly by
    one lead() window over ONLY the duplicated positions (sum of
    min(5, gap)) — O(dup positions) state, never a per-token array.
    Docs shorter than 5 tokens produce zero grams and survive whole."""
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )
    ats = ", ".join(f"element_at(toks, cast(i + {j + 1} as int))" for j in range(5))
    grams = F.expr(
        "CASE WHEN size(toks) >= 5 THEN "
        f"transform(sequence(0, size(toks) - 5), i -> xxhash64({ats})) "
        "ELSE cast(array() as array<bigint>) END"
    )
    pg = staged.select("doc_id", F.posexplode(grams).alias("pos", "gh"))
    dup = pg.groupBy("gh").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
    dpos = pg.join(dup.select("gh"), "gh", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = (
        dpos.withColumn("nxt", F.lead("pos").over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_grams"),
            F.sum(
                F.least(F.lit(5), F.coalesce(F.col("nxt") - F.col("pos"), F.lit(5)))
            ).alias("covered"),
        )
    )
    return (
        staged.select("doc_id", "n_tokens")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("covered", F.lit(0)).cast("long").alias("covered_tokens"),
            F.round(
                (F.col("n_tokens") - F.coalesce("covered", F.lit(0)))
                / F.col("n_tokens"),
                4,
            ).cast("double").alias("keep_ratio"),
        )
        .orderBy("doc_id")
    )


_PHRASES = ["table hash", "slow hash batch"]


@query(
    "x_phrase_search",
    # Multi-term phrase query over the positional index: a phrase of L
    # terms matches at anchor a when term i sits at position a+i for
    # every i — the anchor-alignment join, which generalizes the
    # classic adjacent-postings merge to any phrase length with ONE
    # aggregation (ref parity: the positional postings x_inverted_index
    # builds are exactly what this consumes).
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        FROM documents),
    ph AS (
        SELECT phrase, idx - 1 AS idx, term
        FROM (VALUES ('table hash'), ('slow hash batch')) p(phrase),
             LATERAL (SELECT unnest(string_split(p.phrase, ' ')) AS term,
                             generate_subscripts(string_split(p.phrase, ' '), 1) AS idx) t),
    plen AS (SELECT phrase, count(*) AS L FROM ph GROUP BY phrase),
    hits AS (
        SELECT ph.phrase, tok.doc_id, tok.pos - ph.idx AS anchor,
               count(DISTINCT ph.idx) AS n_aligned
        FROM tok JOIN ph ON ph.term = tok.tok
        GROUP BY ph.phrase, tok.doc_id, anchor),
    m AS (
        SELECT h.phrase, h.doc_id, count(*) AS n_matches
        FROM hits h JOIN plen USING (phrase)
        WHERE h.n_aligned = plen.L
        GROUP BY h.phrase, h.doc_id)
    SELECT phrase, doc_id, n_matches FROM m
    ORDER BY phrase, doc_id
    """,
    doc="positional phrase search (anchor-alignment join): L-term phrases match where term i appears at anchor+i for all i — one (phrase, doc, anchor) aggregation, any phrase length, consumes x_inverted_index postings",
)
def x_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the phrase-term table (a handful of rows) broadcasts
    into the postings stream, and — the load-bearing part — the join
    FILTERS the postings to the phrases' terms before anything
    shuffles, so the one real shuffle (groupBy (phrase, doc, anchor))
    carries only matching-term postings, a vanishing fraction of the
    corpus. Alignment needs no per-position self-join chain (L-1 joins
    for length L, the naive plan): count(distinct idx) == L per anchor
    is a single aggregation whatever L is. Duplicate terms inside a
    phrase are handled by the distinct-idx count, not position
    arithmetic."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("pos0", "term")
    )
    spark_phrases = spark.createDataFrame(
        [
            (p, i, t)
            for p in _PHRASES
            for i, t in enumerate(p.split(" "))
        ],
        "phrase string, idx int, term string",
    )
    plen = {p: len(p.split(" ")) for p in _PHRASES}
    lens = spark.createDataFrame(list(plen.items()), "phrase string, L long")
    hits = (
        toks.join(F.broadcast(spark_phrases), "term")
        .groupBy("phrase", "doc_id", (F.col("pos0") - F.col("idx")).alias("anchor"))
        .agg(F.count_distinct("idx").alias("n_aligned"))
    )
    return (
        hits.join(F.broadcast(lens), "phrase")
        .filter(F.col("n_aligned") == F.col("L"))
        .groupBy("phrase", "doc_id")
        .agg(F.count("*").alias("n_matches"))
        .orderBy("phrase", "doc_id")
    )


@query(
    "x_ppjoin_setsim",
    # Exact set-similarity self-join at Jaccard >= 0.95 with PPJoin
    # prefix filtering (Xiao et al., WWW'08, public): order every
    # doc's token set by one GLOBAL frequency order (rarest first) and
    # keep only the first |s| - ceil(t*|s|) + 1 tokens as the prefix —
    # two sets with J >= t provably share a prefix token, so candidate
    # generation is an equi-join on prefix tokens, never all-pairs,
    # and verification runs exact Jaccard on candidates only. The
    # oracle is the unfiltered all-pairs join: prefix filtering is
    # LOSSLESS, so the outputs must match exactly.
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(string_split(lower(text), ' ')) AS tok
        FROM documents),
    s AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS DOUBLE) AS jaccard
    FROM i
    JOIN s sa ON sa.doc_id = doc_a
    JOIN s sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.95
    ORDER BY doc_a, doc_b
    """,
    doc="PPJoin exact set-similarity self-join (J >= 0.95): global rarest-first token order, |s|-ceil(t|s|)+1 prefixes, candidate equi-join on prefix tokens, exact verify — lossless, oracle-proven equal to all-pairs",
)
def x_ppjoin_setsim(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the all-pairs form shuffles |corpus|^2 through hot
    tokens; PPJoin's candidate join carries only PREFIX postings —
    rarest-first ordering puts the lowest-frequency tokens in the
    prefixes, so the hottest tokens never generate candidates.

    The r6 verdict flagged the global token rank here (a vocab-wide
    ``Window.orderBy`` row_number — a 10^8-10^9-row single task on a
    web corpus, plus a vocab-sized broadcast). The r7 fix removes the
    global rank ENTIRELY rather than two-leveling it: prefix filtering
    is lossless for ANY consistent total order on tokens, and the rank
    was only ever consumed inside the per-doc window that sorts each
    doc's tokens rarest-first. Ordering that window by ``(df, tok)``
    directly is the identical total order (df asc, token tiebreak)
    with no global integer rank materialized — so the df table joins
    to the fact un-hinted (one fact-sized tok shuffle; AQE broadcasts
    it at small SF, shuffles at 100 TB) and no single-partition stage
    exists anywhere in the plan. Prefix selection stays one per-doc
    window. Prefix length is exact integer arithmetic:
    ceil(19n/20) = (19n + 19) div 20 — no float thresholds anywhere
    until the final reported Jaccard (one identical division + round
    on both engines, the x_ngram_jaccard pattern).

    r8: the candidate join applies PPJoin's OTHER two lossless prunes
    from the same paper, and verification is array-based — together
    they cut this fixture's adversarial 31-token vocabulary (every
    token hot, prefix filter alone nearly powerless) from 9.7M to
    1.9M candidates and 172 s to ~35 s at sf0.1 (the r12 census
    measured 40.6 s median; an earlier docstring's "~4 s" claim was
    stale — r13 correction):
      * LENGTH filter: J >= t forces t*max(na,nb) <= min(na,nb)
        (integer form: t_num*greatest <= t_den*least) — a size-skewed
        pair can never qualify, prune it before it exists;
      * POSITIONAL filter: a prefix match at positions (pa, pb) bounds
        the overlap by 1 + min(na-pa, nb-pb); J >= t needs overlap
        alpha = ceil(t*(na+nb)/(1+t)) (integer div form below), so a
        match deep in both prefixes with too little tail is pruned —
        on near-equal sizes only the SINGLE rarest token of each doc
        can seed a candidate (9.7M -> 1.9M candidates here);
      * verification joins the per-doc sorted token ARRAY (bounded by
        doc length) and computes ONE array_intersect per candidate —
        not the |cand| x n exploded-posting join, which at 100 TB is
        the difference between a candidate-sized shuffle and a
        corpus-squared one.

    r13: DEDUP-FIRST (Vernica et al., SIGMOD'10 sec. 3.1, public —
    the standard first stage of distributed set-similarity joins):
    documents with IDENTICAL token sets are grouped before the join
    (the group key is ``concat_ws(" ", sorted_distinct_tokens)`` —
    exactly injective because tokens are space-split and can never
    contain the separator), PPJoin runs on the DISTINCT sets only
    (group representative = min doc_id), and the answer is
    reassembled as (a) all intra-group pairs, J = 1.0 by definition,
    an output-sized equi-self-join on the group key with no arrays
    attached, plus (b) qualifying representative pairs expanded
    through both member lists, again output-sized integer joins.
    Lossless: J(A, B) depends only on the SETS, so every member pair
    of a qualifying rep pair qualifies at the same J and no other
    pair can. Why it matters: near-duplicate-heavy corpora (the
    entire reason a J >= 0.95 join is run) concentrate docs into hot
    identical-set groups, and those groups' prefix postings collapse
    to ONE entry each — candidate generation and the array-verify
    shrink by the SQUARE of the duplication factor while the expand
    stages track |output|, which no algorithm can beat.

    Measured at sf0.1 (5000 docs, 3935 distinct sets, 190,925 output
    pairs): dedup-first cut the verified-candidate set 1.9M -> 960k
    and the size-bucketed probe key (see the candidate-join comment)
    cut raw prefix pairs 7.15M -> 2.44M; together 21.6 s -> 6.4 s
    warm (~3.4x; the r12 census median was 40.6 s), and the r13
    review's mem-only persist took it to 4.5 s (~4.8x). Scale probes
    (scaleup replicas carry a per-copy copyseq token, so replica
    sets differ by 1-2 tokens — the operator is measured, not
    mandatory output blowup): 10x data 12.6 s warm (time ratio 2.0,
    output 2.59M rows, near-linear), 20x data 23.7 s warm (ratio
    3.7) — the curve bends DOWN because per-copy set structure
    repeats while fixed overhead amortizes."""
    t_num, t_den = 19, 20  # t = 0.95 as an exact rational
    docs = load_table(spark, sf, "documents")
    doc_sets = docs.select(
        "doc_id", F.array_sort(F.array_distinct(_tokens())).alias("hs")
    )
    # persist mem ONLY (r13 review + A/B measurement): mem feeds FOUR
    # joins (both expansion sides + the intra-group self-join pair) and
    # is narrow (doc_id, key string) — caching it saves three corpus
    # re-tokenizations, measured 9.4 -> 7.5 s warm. Persisting `sets`
    # as well was MEASURED SLOWER (14.1 s): its array<string> column
    # deserializes from the columnar cache on every downstream scan and
    # the InMemoryRelation stats push AQE off the broadcast plan —
    # re-running the codegen'd tokenize is cheaper than caching arrays.
    # ContextCleaner-bounded, the d43 sets.persist precedent.
    mem = doc_sets.select("doc_id", F.concat_ws(" ", "hs").alias("key")).persist()
    # one distinct set per group; rep id = min member (any total order
    # works for PPJoin's pairing, this one is deterministic). max(hs)
    # is exact — every hs in a group is identical by construction.
    sets = (
        doc_sets.withColumn("key", F.concat_ws(" ", "hs"))
        .groupBy("key")
        .agg(F.min("doc_id").alias("doc_id"), F.max("hs").alias("hs"))
        .withColumn("n", F.size("hs"))
    )
    tok = sets.select("doc_id", "n", F.explode("hs").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = tok.join(freq, "tok").withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "tok")),
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr(f"({t_num} * n + {t_num}) div {t_den}") + 1
    ).select("doc_id", "tok", "n", "pos")
    # r13: SIZE-BUCKETED probe key (the length-bucketed prefix index of
    # the PPJoin literature): the probe side explodes each prefix row
    # into its admissible PARTNER sizes nb in [n, (t_den*n) div t_num]
    # (19*nb <= 20*na exactly — the length filter, now enforced AT THE
    # JOIN KEY instead of post-hoc on generated pairs), and the global
    # pairing order becomes (n, doc_id) so every pair is generated from
    # its smaller side exactly once. Two wins, both vocab-independent:
    # size-incompatible pairs never materialize (7.15M raw prefix pairs
    # -> size-compatible only), and the join key (tok, size) has
    # |vocab| x |sizes| values, not |vocab| — on an adversarial tiny
    # vocabulary the hash join's parallelism is no longer bound by 31
    # hot tokens. The round-robin repartition spreads probe rows so
    # pair GENERATION (the quadratic part) runs on every core even when
    # AQE broadcasts the tiny build side; at scale the join's own
    # exchange pays the same prefix-table-sized shuffle anyway.
    probes = prefix.withColumn(
        "nb", F.explode(F.expr(f"sequence(n, ({t_den} * n) div {t_num})"))
    )
    pa = probes.repartition(spark.sparkContext.defaultParallelism).alias("pa")
    pb = prefix.alias("pb")
    # minimal qualifying overlap alpha = ceil(t*(na+nb)/(1+t)), exact
    # integer: (t_num*(na+nb) + t_num+t_den - 1) div (t_num+t_den)
    alpha = F.expr(
        f"({t_num} * (pa.n + pb.n) + {t_num + t_den} - 1) div {t_num + t_den}"
    )
    cand = (
        pa.join(
            pb,
            (F.col("pa.tok") == F.col("pb.tok"))
            & (F.col("pa.nb") == F.col("pb.n"))
            # (n, doc_id) total order: equal sizes tie-break on id
            & (
                (F.col("pa.n") < F.col("pb.n"))
                | (
                    (F.col("pa.n") == F.col("pb.n"))
                    & (F.col("pa.doc_id") < F.col("pb.doc_id"))
                )
            )
            # positional filter
            & (
                F.lit(1)
                + F.least(
                    F.col("pa.n") - F.col("pa.pos"), F.col("pb.n") - F.col("pb.pos")
                )
                >= alpha
            ),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"),
        F.col("n").alias("na"), F.col("key").alias("key_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"),
        F.col("n").alias("nb"), F.col("key").alias("key_b"),
    )
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    verified = cand.join(sa, "doc_a").join(sb, "doc_b").withColumn("i", inter)
    jac = F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
    rep_pairs = verified.filter(jac >= 0.95).select(
        "key_a", "key_b", F.round(jac, 4).cast("double").alias("jaccard")
    )
    # expand qualifying rep pairs through both member lists — the two
    # sets differ (J = 1 iff equal sets, and equal sets share a group),
    # so member ids never collide and least/greatest restores the
    # doc_a < doc_b output convention; J is a set function, so every
    # member pair inherits the rep pair's jaccard unchanged
    ma = mem.select(F.col("key").alias("key_a"), F.col("doc_id").alias("da"))
    mb = mem.select(F.col("key").alias("key_b"), F.col("doc_id").alias("db"))
    inter_pairs = rep_pairs.join(ma, "key_a").join(mb, "key_b").select(
        F.least("da", "db").alias("doc_a"),
        F.greatest("da", "db").alias("doc_b"),
        "jaccard",
    )
    # intra-group pairs: identical sets, J = 1.0 by definition — an
    # output-sized integer self-join, no arrays, no verify
    m1 = mem.select("key", F.col("doc_id").alias("doc_a"))
    m2 = mem.select("key", F.col("doc_id").alias("doc_b"))
    intra_pairs = (
        m1.join(m2, "key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(1.0).alias("jaccard"))
    )
    return intra_pairs.unionByName(inter_pairs).orderBy("doc_a", "doc_b")


@query(
    "x_sorted_neighborhood",
    # Sorted-neighborhood entity resolution (Hernandez & Stolfo 1995,
    # public): sort records by a key, compare only records within a
    # sliding window of w rank positions — the complementary blocking
    # strategy to x_record_linkage's equality blocks (SN catches
    # near-misses that straddle block boundaries; real pipelines union
    # both passes). Window pairing is an equi-join on (rank + offset),
    # never a windowed self-scan.
    oracle="""
    WITH r AS (
        SELECT c_custkey, c_name,
               row_number() OVER (ORDER BY c_name, c_custkey) AS rnk
        FROM customer)
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           CAST(b.rnk - a.rnk AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM r a JOIN r b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 3
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    ORDER BY a_key, b_key
    """,
    doc="sorted-neighborhood linkage: global name rank via the two-level distributed sort, neighbor pairs as an offset-explode equi-join on rank (w=3), levenshtein <= 2 verify",
)
def x_sorted_neighborhood(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the global rank comes from the d19_sort two-level
    pattern (order-preserving key-range groups rank locally; the
    group-count table takes the tiny prefix window and broadcasts
    back) — no single-partition sort. Neighbor candidate generation is
    then each row EXPLODED into its w=3 (rank + offset) probes and
    EQUI-joined back on the rank — the shuffle carries w*n bounded
    pairs, and no window function ever sees the full sorted table in
    one task. The threshold levenshtein(a, b, 2) band-limits the DP.
    The sort key embeds the entity ordering, so c_custkey div 256 is
    an order-preserving group (names are zero-padded key renderings:
    verified in the fixture; a production key needs its own
    order-preserving bucketization)."""
    cust = load_table(spark, sf, "customer")
    base = cust.select(
        "c_custkey", "c_name", (F.col("c_custkey") / 256).cast("long").alias("grp")
    )
    wl = Window.partitionBy("grp").orderBy("c_name", "c_custkey")
    local = base.withColumn("lrank", F.row_number().over(wl))
    counts = base.groupBy("grp").agg(F.count("*").alias("c"))
    wg = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "grp", F.coalesce(F.sum("c").over(wg), F.lit(0)).alias("off")
    )
    ranked = local.join(F.broadcast(offsets), "grp").select(
        "c_custkey", "c_name", (F.col("off") + F.col("lrank")).alias("rnk")
    )
    probes = ranked.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("rnk").alias("a_rnk"),
        F.explode(F.expr("sequence(rnk + 1, rnk + 3)")).alias("rnk"),
    )
    dist = F.levenshtein(F.col("a_name"), F.col("c_name"), 2)
    return (
        probes.join(ranked, "rnk")
        .select(
            "a_key",
            F.col("c_custkey").alias("b_key"),
            (F.col("rnk") - F.col("a_rnk")).cast("bigint").alias("rank_gap"),
            dist.alias("dist0"),
        )
        .filter((F.col("dist0") >= 0) & (F.col("dist0") <= 2))
        .select("a_key", "b_key", "rank_gap", F.col("dist0").cast("bigint").alias("dist"))
        .orderBy("a_key", "b_key")
    )


# ---------------------------------------------------------------------------
# round-7 additions: weighted sampling, drift, entropy, dedup ROI
# ---------------------------------------------------------------------------


@query(
    "x_priority_sample",
    # Priority sampling (Duffield, Lund & Thorup, JACM 2007 — public):
    # weighted sampling WITHOUT replacement with strong estimation
    # guarantees. Each item gets priority q = w / u with u uniform in
    # (0, 1]; the sample is the top-k by q. Here u is the md5-uniform
    # coin (the repo's single deterministic sampling primitive) and q
    # is EXACT integer arithmetic — (w << 31) div (h + 1) with h the
    # 31-bit md5 integer — so both engines rank identically with no
    # float pow/log anywhere (the naive A-ES u^(1/w) key would diverge
    # at half-ulp boundaries).
    oracle="""
    WITH w AS (
        SELECT doc_id,
               CAST(len(string_split(lower(text), ' ')) + 1 AS BIGINT) AS weight,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 2147483648 AS h
        FROM documents)
    SELECT doc_id, weight,
           CAST((weight * 2147483648) // (h + 1) AS BIGINT) AS priority
    FROM w
    ORDER BY priority DESC, doc_id
    LIMIT 64
    """,
    doc="weighted sample via priority sampling (Duffield-Lund-Thorup): q = (w << 31) div (md5_31(doc_id) + 1), top-64 by q — integer-exact, TakeOrderedAndProject",
)
def x_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: one narrow map computes (weight, hash, priority)
    per row, and the top-k compiles to TakeOrderedAndProject —
    per-partition top-64 then a 64-row driver merge, no global sort,
    no shuffle. This is the sampling shape a training-mixture builder
    uses to draw a token-weighted document sample in one pass; the
    threshold (the (k+1)-th priority) makes the standard
    Horvitz-Thompson estimator available downstream. Weight = token
    count + 1 (never zero); (w * 2^31) stays far inside int64 for any
    real document."""
    docs = load_table(spark, sf, "documents")
    w = docs.select(
        "doc_id",
        (F.size(_tokens()) + 1).cast("long").alias("weight"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 2147483648
        ).alias("h"),
    )
    return (
        w.select(
            "doc_id",
            "weight",
            F.expr("(weight * 2147483648L) div (h + 1)").cast("long").alias("priority"),
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(64)
    )


@query(
    "x_token_drift",
    # Corpus drift detection: which tokens shifted most between two
    # subcorpora (here English vs non-English — the split a recurring
    # ingest would make between yesterday's and today's snapshot)?
    # Per-token smoothed frequencies in integer parts-per-billion,
    # their ratio deviation in integer ppm, mass-weighted — every step
    # exact integer floor division on both engines, no libm log (the
    # whole-bit log2 quantization the surprisal ops use is too coarse
    # here: same-generator subcorpora never reach ratio 2).
    oracle="""
    WITH tok AS (
        SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS side,
               unnest(string_split(lower(text), ' ')) AS tok
        FROM documents),
    c AS (
        SELECT tok,
               CAST(1 + SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(1 + SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
        FROM tok GROUP BY tok),
    t AS (SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb FROM c),
    s AS (
        SELECT tok, a, b,
               (a * 1000000000) // ta AS fa,
               (b * 1000000000) // tb AS fb
        FROM c, t)
    SELECT tok, a AS n_en, b AS n_other,
           CAST(CASE WHEN fa >= fb THEN 1 ELSE -1 END AS BIGINT) AS direction,
           CAST((greatest(fa, fb) * 1000000) // least(fa, fb) - 1000000
                AS BIGINT) AS drift_ppm,
           CAST((a + b) * (((greatest(fa, fb) * 1000000) // least(fa, fb)
                - 1000000) // 1000) AS BIGINT) AS drift_score
    FROM s
    ORDER BY drift_score DESC, tok
    LIMIT 40
    """,
    doc="token-distribution drift between subcorpora (en vs rest): smoothed ppb frequencies, ratio deviation in exact integer ppm, mass-weighted top-40 movers",
)
def x_token_drift(spark: SparkSession, sf: str) -> DataFrame:
    """The drift monitor a recurring ingest pipeline runs between
    corpus snapshots. 100 TB plan: ONE token shuffle builds both
    sides' counts simultaneously (conditional sums — not a per-side
    scan + join), the totals are a 1-row broadcast, and top-40 is
    TakeOrderedAndProject. Arithmetic bounds: ppb frequencies need
    ta, tb < ~9e9 tokens for the a * 1e9 product to stay in int64 —
    past that (a real 100 TB corpus) widen the two frequency products
    to decimal(38,0) on both engines, same plan. Add-one smoothing
    keeps least(fa, fb) >= 1, so the ppm ratio is total; the per-mille
    truncation in drift_score keeps the mass product far inside
    int64."""
    docs = load_table(spark, sf, "documents")
    tok = docs.select(
        F.when(F.col("lang") == "en", 0).otherwise(1).alias("side"),
        F.explode(_tokens()).alias("tok"),
    )
    c = tok.groupBy("tok").agg(
        (1 + F.sum(F.when(F.col("side") == 0, 1).otherwise(0))).cast("long").alias("a"),
        (1 + F.sum(F.when(F.col("side") == 1, 1).otherwise(0))).cast("long").alias("b"),
    )
    t = c.agg(
        F.sum("a").cast("long").alias("ta"), F.sum("b").cast("long").alias("tb")
    )
    s = c.crossJoin(F.broadcast(t)).select(
        "tok",
        "a",
        "b",
        F.expr("(a * 1000000000L) div ta").alias("fa"),
        F.expr("(b * 1000000000L) div tb").alias("fb"),
    )
    return s.select(
        "tok",
        F.col("a").alias("n_en"),
        F.col("b").alias("n_other"),
        F.when(F.col("fa") >= F.col("fb"), 1).otherwise(-1).cast("long").alias("direction"),
        F.expr("(greatest(fa, fb) * 1000000L) div least(fa, fb) - 1000000L")
        .cast("long")
        .alias("drift_ppm"),
        F.expr(
            "(a + b) * (((greatest(fa, fb) * 1000000L) div least(fa, fb)"
            " - 1000000L) div 1000L)"
        )
        .cast("long")
        .alias("drift_score"),
    ).orderBy(F.desc("drift_score"), "tok").limit(40)


@query(
    "x_entropy_score",
    # Per-document token entropy in whole bits — the vocabulary-
    # diversity quality signal (gibberish and boilerplate sit at the
    # two extremes; CCNet/Gopher-style pipelines cut on both tails).
    # Quantized surprisal floor(log2(L / c)) per token keeps it exact
    # cross-engine: same bin-length integer log2 as x_lm_surprisal,
    # but over IN-DOC counts (unigram self-entropy), not a corpus LM.
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents),
    c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
          FROM tok GROUP BY doc_id, tok),
    l AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS L FROM c GROUP BY doc_id)
    SELECT c.doc_id,
           L AS n_tokens,
           CAST(SUM(c * (length(bin(L // c)) - 1)) AS BIGINT) AS sum_bits,
           CAST(ROUND(SUM(c * (length(bin(L // c)) - 1)) * 1.0 / L, 4) AS DOUBLE)
               AS avg_bits
    FROM c JOIN l USING (doc_id)
    GROUP BY c.doc_id, L
    """,
    doc="per-doc unigram entropy (whole-bit quantized): sum over tokens of c * floor(log2(L/c)) / L — vocabulary-diversity quality signal",
)
def x_entropy_score(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: two shuffles — (doc_id, tok) counts with map-side
    combine, then the doc_id rollup — both keyed on doc-local state
    (no corpus-global table anywhere, unlike x_lm_surprisal's bigram
    LM). L div c >= 1 always (c <= L), so the integer log2 is total.
    The only division is exact-int -> double feeding ROUND, identical
    on both engines. Complements x_compression_ratio (byte-level,
    Arrow UDF) with a pure-JVM token-level diversity signal."""
    docs = load_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    c = tok.groupBy("doc_id", "tok").agg(F.count("*").cast("long").alias("c"))
    bits = F.length(F.bin(F.expr("L div c"))) - 1
    return (
        c.withColumn("L", F.sum("c").over(Window.partitionBy("doc_id")))
        .groupBy("doc_id", "L")
        .agg(
            F.sum(F.col("c") * bits).cast("long").alias("sum_bits"),
            F.round(F.sum(F.col("c") * bits) * 1.0 / F.col("L"), 4)
            .cast("double")
            .alias("avg_bits"),
        )
        .select(
            "doc_id", F.col("L").alias("n_tokens"), "sum_bits", "avg_bits"
        )
    )


@query(
    "x_dedup_report",
    # Dedup ROI accounting — the report a pipeline owner reads after a
    # near-dup pass: how many clusters of each size, how many docs
    # removal drops, and how many characters that saves. Builds on
    # x_dedup_clusters' labels (Jaccard >= 0.8 connected components,
    # survivor = min doc_id) joined to per-doc n_chars.
    oracle=f"""
    WITH RECURSIVE {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(doc, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc),
    labels AS (
        SELECT doc AS doc_id, min(label) AS cluster_id FROM reach GROUP BY doc),
    clusters AS (
        SELECT cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               CAST(SUM(CASE WHEN doc_id <> cluster_id THEN n_chars ELSE 0 END)
                    AS BIGINT) AS removable_chars
        FROM labels JOIN documents USING (doc_id)
        GROUP BY cluster_id)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(count(*) * (cluster_size - 1) AS BIGINT) AS n_removable_docs,
           CAST(SUM(removable_chars) AS BIGINT) AS saved_chars
    FROM clusters
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
    doc="dedup ROI report: cluster-size histogram over Jaccard>=0.8 components with removable-doc and saved-character accounting (survivor = min doc_id)",
)
def x_dedup_report(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: cluster labels are READ from the trio's shared
    ledger (x_dedup_clusters -> _ensure_cluster_base — candidate pairs
    + min-label CC paid once per session, VERDICT r13 #1; previously
    this query re-ran the whole path, measured 20.2x time on 20x
    data), then two aggregate-sized shuffles: cluster rollup keyed on
    cluster_id, then the histogram keyed on cluster_size (rows bounded
    by the largest cluster, not the corpus). n_chars rides the label
    join — no second scan of the documents table."""
    docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    labels = x_dedup_clusters(spark, sf).select("doc_id", "cluster_id")
    clusters = (
        labels.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.sum(
                F.when(F.col("doc_id") != F.col("cluster_id"), F.col("n_chars")).otherwise(0)
            )
            .cast("long")
            .alias("removable_chars"),
        )
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            (F.count("*") * (F.first("cluster_size") - 1))
            .cast("long")
            .alias("n_removable_docs"),
            F.sum("removable_chars").cast("long").alias("saved_chars"),
        )
        .orderBy("cluster_size")
    )


@query(
    "x_corpus_filter_pipeline",
    # The end-to-end keep/drop decision a production training-data
    # pipeline makes per document — the LLM-data flagship composing the
    # registry's individual signals into one pass with an auditable
    # reason code: exact-duplicate removal (md5 content key, keep min doc_id) >
    # Gopher rule gate (Rae et al. 2021 §A1.1) > language-ID gate
    # (marker argmax; 'unknown' drops). Precedence means a document
    # gets ONE deterministic reason, so drop accounting adds up.
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, string_split(lower(text), ' ') AS toks
        FROM documents),
    dup AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        FROM t),
    s AS (
        SELECT doc_id,
               len(toks) AS n_words,
               CAST(list_sum(list_transform(toks, x -> strlen(x))) AS BIGINT) AS n_tok_chars,
               len(list_filter(toks, x -> list_contains({list(_GOPHER_STOPWORDS)!r}, x))) AS n_stop,
               len(list_distinct(toks)) AS n_uniq,
               len(list_filter(toks, x -> x IN ('the','a','of','is')))   AS s_en,
               len(list_filter(toks, x -> x IN ('der','und','die','nicht'))) AS s_de,
               len(list_filter(toks, x -> x IN ('el','la','los','que')))  AS s_es,
               len(list_filter(toks, x -> x IN ('le','et','les','des')))  AS s_fr
        FROM t),
    g AS (
        SELECT s.*,
               (n_words BETWEEN 20 AND 100000)
                   AND (n_tok_chars * 1.0 / n_words BETWEEN 2 AND 10)
                   AND n_stop >= 2
                   AND (n_uniq * 1.0 / n_words >= 0.05) AS gopher_keep,
               CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'unknown'
                    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                    WHEN s_es >= s_fr THEN 'es'
                    ELSE 'fr' END AS predicted_lang
        FROM s)
    SELECT g.doc_id, n_words, predicted_lang, gopher_keep,
           dup.doc_id <> dup.keeper AS is_dup,
           CASE WHEN dup.doc_id <> dup.keeper THEN 'drop:duplicate'
                WHEN NOT gopher_keep THEN 'drop:quality'
                WHEN predicted_lang = 'unknown' THEN 'drop:language'
                ELSE 'keep' END AS decision
    FROM g JOIN dup ON dup.doc_id = g.doc_id
    ORDER BY g.doc_id
    """,
    doc="corpus filter pipeline flagship: exact-dup > Gopher rules > langid, one deterministic reason code per document — the composed keep/drop pass a training-data pipeline ships",
)
def x_corpus_filter_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: ONE token pass computes every per-row signal
    (narrow array algebra, no UDF), and the only shuffle is the
    duplicate grouping — min(doc_id) over a window keyed on the
    md5(text) content hash, computed in place on the signal pass (r15:
    formerly an aggregate joined back on the hash, whose broadcast
    build re-scanned the corpus for a second digest pass). Precedence
    order mirrors cost order: dedup kills the most bytes first, the
    rule gate is free, language-ID is free — exactly the CCNet-style
    staging where expensive model scoring (x_lm_surprisal_score)
    runs only on the survivors of this pass."""
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", F.md5("text").alias("h"), _tokens().alias("toks"))
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])

    def marker(words: tuple) -> "Column":
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(F.col("toks"), lambda x: F.array_contains(arr, x)))

    s = staged.select(
        "doc_id",
        "h",
        F.size("toks").alias("n_words"),
        F.aggregate(
            F.transform(F.col("toks"), lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_tok_chars"),
        F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x))).alias("n_stop"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        marker(("the", "a", "of", "is")).alias("s_en"),
        marker(("der", "und", "die", "nicht")).alias("s_de"),
        marker(("el", "la", "los", "que")).alias("s_es"),
        marker(("le", "et", "les", "des")).alias("s_fr"),
    )
    mean_len = F.col("n_tok_chars") * 1.0 / F.col("n_words")
    gopher_keep = (
        F.col("n_words").between(20, 100000)
        & mean_len.between(2, 10)
        & (F.col("n_stop") >= 2)
        & (F.col("n_uniq") * 1.0 / F.col("n_words") >= 0.05)
    )
    predicted = (
        F.when(
            (F.col("s_en") == 0) & (F.col("s_de") == 0) & (F.col("s_es") == 0) & (F.col("s_fr") == 0),
            "unknown",
        )
        .when(
            (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    # r15 (guide §2.4): the survivor table was a groupBy(h) + join-back;
    # its broadcast build re-scanned documents and recomputed md5 for
    # every row (column pruning spares the token algebra, not the
    # digest). min(doc_id) over an h-partitioned window computes the
    # keeper in place on the one signal pass — each partition is one
    # exact-dup cluster, bounded by copy count, never corpus-sized.
    scored = s.withColumn(
        "keeper", F.min("doc_id").over(Window.partitionBy("h"))
    ).select(
        "doc_id",
        "n_words",
        predicted.alias("predicted_lang"),
        gopher_keep.alias("gopher_keep"),
        (F.col("doc_id") != F.col("keeper")).alias("is_dup"),
    )
    return scored.select(
        "doc_id",
        "n_words",
        "predicted_lang",
        "gopher_keep",
        "is_dup",
        F.when(F.col("is_dup"), "drop:duplicate")
        .when(~F.col("gopher_keep"), "drop:quality")
        .when(F.col("predicted_lang") == "unknown", "drop:language")
        .otherwise("keep")
        .alias("decision"),
    ).orderBy("doc_id")


@query(
    "x_dataset_card",
    # The "dataset card" summary block a corpus release ships: per-
    # language (plus TOTAL via ROLLUP) document/token/char counts,
    # exact-duplicate counts, and duplicate rate in integer ppm —
    # the numbers every data statement / datasheet template asks for.
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, n_chars,
               len(string_split(lower(text), ' ')) AS n_tok,
               md5(text) AS h
        FROM documents),
    dup AS (
        SELECT doc_id,
               CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY h)
                    THEN 1 ELSE 0 END AS is_dup
        FROM t)
    SELECT COALESCE(t.lang, 'TOTAL') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
           CAST((SUM(is_dup) * 1000000) // count(*) AS BIGINT) AS dup_ppm
    FROM t JOIN dup USING (doc_id)
    GROUP BY ROLLUP(t.lang)
    ORDER BY lang
    """,
    doc="dataset-card summary: per-language + TOTAL rollup of docs/tokens/chars, exact-dup counts and ppm rate — the datasheet numbers for a corpus release",
)
def x_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the dup flag costs one md5-key shuffle (window over
    the content hash — each hash group is a dup cluster, tiny);
    the rollup is one grouping-sets aggregate with map-side combine
    over at most |langs|+1 output rows. Integer ppm keeps the rate
    exact; TOTAL comes from ROLLUP, not a second scan."""
    docs = load_table(spark, sf, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(_tokens()).alias("n_tok"),
        F.md5("text").alias("h"),
    )
    w = Window.partitionBy("h")
    flagged = t.withColumn(
        "is_dup", (F.col("doc_id") != F.min("doc_id").over(w)).cast("int")
    )
    return (
        flagged.rollup("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("is_dup").cast("long").alias("n_dup_docs"),
            F.expr("(sum(is_dup) * 1000000L) div count(*)").cast("long").alias("dup_ppm"),
        )
        .select(
            F.coalesce("lang", F.lit("TOTAL")).alias("lang"),
            "n_docs",
            "n_tokens",
            "total_chars",
            "n_dup_docs",
            "dup_ppm",
        )
        .orderBy("lang")
    )


@query(
    "x_ccnet_buckets",
    # CCNet's head/middle/tail split (Wenzek et al. 2020, public): rank
    # every document by LM perplexity WITHIN its language and cut into
    # terciles; training keeps head+middle and drops the gibberish
    # tail. The LM score is x_lm_surprisal_score's whole-bit bigram
    # surprisal (already exact cross-engine); the tercile is NTILE(3)
    # with a doc_id tiebreak, reproduced on the Spark side by the
    # closed-form bucket arithmetic the decile op pinned by hypothesis.
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
    bg AS (SELECT doc_id, ws[CAST(t.i AS INT)] || ' ' || ws[CAST(t.i+1 AS INT)] AS b
           FROM docs, LATERAL unnest(range(1, len(ws))) AS t(i)),
    cnt AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS T FROM bg),
    score AS (
        SELECT bg.doc_id,
               CAST(SUM(length(bin(T // c)) - 1) AS BIGINT) AS sum_bits,
               CAST(count(*) AS BIGINT) AS n_bigrams
        FROM bg JOIN cnt USING (b), tot
        GROUP BY bg.doc_id),
    ranked AS (
        SELECT d.lang, s.doc_id, s.sum_bits, s.n_bigrams,
               CAST(ntile(3) OVER (
                   PARTITION BY d.lang
                   ORDER BY s.sum_bits * 10000 // s.n_bigrams, s.doc_id
               ) AS BIGINT) AS bucket
        FROM score s JOIN documents d USING (doc_id))
    SELECT doc_id, lang,
           CAST(sum_bits * 10000 // n_bigrams AS BIGINT) AS surprisal_e4,
           bucket,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
               AS segment,
           bucket <= 2 AS keep
    FROM ranked
    ORDER BY doc_id
    """,
    doc="CCNet head/middle/tail perplexity buckets: per-language NTILE(3) over the exact bigram surprisal (integer 1e4-scaled mean bits, doc_id tiebreak); keep = head+middle",
)
def x_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: the surprisal score costs its two corpus shuffles
    (the b-keyed window + doc rollup, see x_lm_surprisal_score — one
    bigram explode since r15, was three); the tercile
    is then one lang-keyed window over the per-doc score table — a
    KEYED partition (|langs| tasks over doc-count rows), never a
    global window; the surprisal mean is integer 1e4-scaled floor
    division so the ranking key is exact on both engines. Docs with
    fewer than two tokens have no bigrams and are excluded on both
    sides by construction."""
    docs = load_table(spark, sf, "documents").withColumn("__ws", F.split("text", " "))
    ws = F.col("__ws")
    n = F.size(ws)
    grams = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                grams,
                lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
            )
        ).alias("b"),
    )
    # r15 (guide §2.4, same restructure as x_lm_surprisal_score): the
    # count-then-join-back shape ran the bigram explode three times;
    # count-over-window BY b runs it once, and the total T comes from
    # per-doc word counts without the explode. Hash-identical.
    c = F.count("*").over(Window.partitionBy("b"))
    tot = docs.agg(
        F.sum(F.when(n >= 2, n - 1).otherwise(0)).cast("long").alias("T")
    )
    bits = F.length(F.bin(F.expr("T div c"))) - 1
    score = (
        bg.withColumn("c", c)
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(bits).cast("long").alias("sum_bits"),
            F.count("*").cast("long").alias("n_bigrams"),
        )
    )
    lang = load_table(spark, sf, "documents").select("doc_id", "lang")
    ranked = score.join(lang, "doc_id").withColumn(
        "surprisal_e4", F.expr("(sum_bits * 10000L) div n_bigrams").cast("long")
    )
    w = Window.partitionBy("lang").orderBy("surprisal_e4", "doc_id")
    return (
        ranked.withColumn("bucket", F.ntile(3).over(w).cast("long"))
        .select(
            "doc_id",
            "lang",
            "surprisal_e4",
            "bucket",
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
            .alias("segment"),
            (F.col("bucket") <= 2).alias("keep"),
        )
        .orderBy("doc_id")
    )


_RRF_K = 60  # Cormack/Clarke/Buettcher 2009 standard constant
_RRF_TOPN = 50  # per-system candidate list length


@query(
    "x_rrf_fusion",
    # Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    # of two retrieval systems over the same fixed query: BM25 and
    # length-normalized TF-IDF. RRF is THE standard hybrid-retrieval
    # merge (sparse + dense in production RAG); rank contributions are
    # computed in exact integer parts-per-billion (1e9 // (k + rank)) so
    # no float quotient ever crosses an engine boundary.
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, tok AS term, count(*) AS tf
        FROM t CROSS JOIN LATERAL unnest(toks) AS u(tok)
        WHERE tok IN {_BM25_TERMS!r}
        GROUP BY doc_id, tok),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    joined AS (
        SELECT tf.doc_id,
               {_BM25_TERM_SCORE_SQL} AS sa_term,
               CAST(CAST(tf.tf AS DOUBLE) / dl.dl * ln(CAST(stats.n AS DOUBLE) / df.df)
                    AS DECIMAL(18,8)) AS sb_term
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
    scored AS (
        SELECT doc_id,
               CAST(ROUND(SUM(sa_term), 4) AS DOUBLE) AS sa,
               CAST(ROUND(SUM(sb_term), 4) AS DOUBLE) AS sb
        FROM joined GROUP BY doc_id),
    ta AS (SELECT doc_id, sa FROM scored ORDER BY sa DESC, doc_id LIMIT {_RRF_TOPN}),
    tb AS (SELECT doc_id, sb FROM scored ORDER BY sb DESC, doc_id LIMIT {_RRF_TOPN}),
    ra AS (SELECT doc_id, row_number() OVER (ORDER BY sa DESC, doc_id) AS r FROM ta),
    rb AS (SELECT doc_id, row_number() OVER (ORDER BY sb DESC, doc_id) AS r FROM tb)
    SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
           CAST(ra.r AS BIGINT) AS rank_bm25,
           CAST(rb.r AS BIGINT) AS rank_tfidf,
           CAST(COALESCE(1000000000 // ({_RRF_K} + ra.r), 0)
                + COALESCE(1000000000 // ({_RRF_K} + rb.r), 0) AS BIGINT) AS rrf_ppb
    FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    ORDER BY rrf_ppb DESC, doc_id LIMIT 20
    """,
    doc="Reciprocal Rank Fusion (RRF, k=60) of BM25 and TF-IDF top-50 lists for a fixed query — the hybrid-retrieval merge, integer-ppb rank contributions",
)
def x_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: ONE token pass feeds both scorers (shared tf/df/dl
    aggregates — the second system is a few extra columns, not a second
    scan); each system's candidate list is a TakeOrdered top-50 (no
    global sort), and the rank windows + fusion join run over <=50 rows
    — aggregate-sized, single-partition by construction and by intent.
    In production the two lists come from heterogeneous systems (BM25
    index + ANN index); RRF needs only the ranks, which is why it
    tolerates incomparable score scales (the reason it won out over
    score interpolation — Cormack et al. 2009)."""
    docs = load_table(spark, sf, "documents")
    staged = docs.select("doc_id", _tokens().alias("toks"))
    dl = staged.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    tf = (
        staged.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    sa_term = _bm25_term_score()
    sb_term = (
        F.col("tf").cast("double") / F.col("dl")
        * F.log(F.col("n").cast("double") / F.col("df"))
    ).cast("decimal(18,8)")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", sa_term.alias("sa_term"), sb_term.alias("sb_term"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("sa_term"), 4).cast("double").alias("sa"),
            F.round(F.sum("sb_term"), 4).cast("double").alias("sb"),
        )
    )
    ta = scored.select("doc_id", "sa").orderBy(F.desc("sa"), "doc_id").limit(_RRF_TOPN)
    tb = scored.select("doc_id", "sb").orderBy(F.desc("sb"), "doc_id").limit(_RRF_TOPN)
    # rank windows run over the <=50-row TakeOrdered lists only
    ra = ta.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("sa"), "doc_id")).alias("rank_bm25"),
    )
    rb = tb.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("sb"), "doc_id")).alias("rank_tfidf"),
    )
    fused = ra.join(rb, "doc_id", "full_outer")
    rrf = F.coalesce(F.expr(f"1000000000 div ({_RRF_K} + rank_bm25)"), F.lit(0)) + F.coalesce(
        F.expr(f"1000000000 div ({_RRF_K} + rank_tfidf)"), F.lit(0)
    )
    return (
        fused.select(
            "doc_id",
            F.col("rank_bm25").cast("long").alias("rank_bm25"),
            F.col("rank_tfidf").cast("long").alias("rank_tfidf"),
            rrf.cast("long").alias("rrf_ppb"),
        )
        .orderBy(F.desc("rrf_ppb"), "doc_id")
        .limit(20)
    )


@query(
    "x_hard_negatives",
    # Hard-negative mining for contrastive training (the standard
    # retrieval-training data op, e.g. DPR, Karpukhin et al. 2020): for
    # each query vector, the top-k most-similar vectors with a
    # DIFFERENT label — maximally-confusing negatives, the pairs that
    # actually move a contrastive loss. Same brute-force cosine shape
    # as d44 plus the label exclusion.
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
               FROM embeddings WHERE vec_id < 10),
    pairs AS (
        SELECT q.qid, e.vec_id, e.label,
               list_sum(list_transform(list_zip(q.qe, e.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cosine
        FROM q JOIN embeddings e ON e.vec_id <> q.qid AND e.label <> q.ql)
    SELECT qid, vec_id, label, CAST(ROUND(cosine, 4) AS DOUBLE) AS cosine
    FROM pairs
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY ROUND(cosine, 4) DESC, vec_id) <= 3
    """,
    doc="hard-negative mining: per-query top-3 nearest vectors with a different label (contrastive-training negatives); broadcast query set, one corpus pass",
)
def x_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: identical to d44_cosine_topk — query set broadcast,
    ONE corpus pass, per-query top-k via a window over the scored
    candidates; the label exclusion rides the join condition so
    same-label vectors never reach scoring. At production scale the
    corpus pass is replaced by the ANN candidate paths
    (x_ann_lsh_topk / x_ann_ivf_topk) with the label filter applied to
    their candidates — the scoring and top-k stages are unchanged."""
    emb = load_table(spark, sf, "embeddings")
    corpus = emb.select(
        "vec_id", "embedding", "label", _norm(F.col("embedding")).alias("nrm")
    )
    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("ql"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = corpus.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("qid")) & (F.col("label") != F.col("ql")),
    )
    cos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    scored = pairs.select(
        "qid", "vec_id", "label", F.round(cos, 4).cast("double").alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).drop("rn")


@query(
    "x_cross_source_leakage",
    # Cross-source n-gram leakage audit: for every ordered source pair,
    # how many distinct 3-grams they share — the contamination matrix a
    # corpus release publishes (did crawl A leak into curated set B?),
    # and the source-level generalization of x_decontaminate's
    # train-vs-eval check. Output is |sources|^2-bounded.
    oracle=f"""
    WITH {_NG_SQL.replace("doc_id", "doc_id").replace("FROM documents", "FROM documents")},
    sg AS (
        SELECT DISTINCT d.source, n.g
        FROM ng n JOIN documents d USING (doc_id)),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_grams
        FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2),
    tot AS (SELECT source, count(*) AS n_grams FROM sg GROUP BY source)
    SELECT p.source_a, p.source_b,
           CAST(p.shared_grams AS BIGINT) AS shared_grams,
           CAST(p.shared_grams * 1000000 // least(ta.n_grams, tb.n_grams) AS BIGINT)
               AS containment_ppm
    FROM pairs p
    JOIN tot ta ON ta.source = p.source_a
    JOIN tot tb ON tb.source = p.source_b
    ORDER BY source_a, source_b
    """,
    doc="cross-source 3-gram leakage matrix: shared distinct grams per source pair + containment ppm vs the smaller side — corpus contamination audit",
)
def x_cross_source_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: the (source, gram) table is the only fact-sized
    artifact (distinct-collapsed before any join — one gram shuffle);
    the pair join keys on the gram hash, so shared grams co-locate, and
    the output aggregate is |sources|^2 rows. Hot grams (boilerplate
    shared by every source) fan out only |sources| ways — bounded by
    the source count, not the corpus. Containment denominators use the
    SMALLER side (the x_minhash_containment convention): a tiny curated
    set fully swallowed by a crawl reads 1e6 ppm, not a diluted
    fraction."""
    grams = doc_ngrams(spark, sf, n=3)  # _NG_SQL oracle CTE is the trigram form
    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    # r15 (OPTIMIZATION round, guide §2.4): the former shape evaluated
    # the fact-sized (source, g) subtree THREE times — both sides of
    # the gram self-join plus the per-source totals branch, each a full
    # corpus tokenize+explode pass. One per-gram collect_set(source)
    # (bounded by |sources|, the docstring's own fan-out argument)
    # replaces all three: the sorted set explodes into its a<b source
    # pairs AND per-source singletons (sb NULL) in one generator, and
    # ONE aggregation keyed (sa, sb) yields shared_grams and n_grams
    # together. Per-gram sets are |sources|-bounded so the HOF lambdas
    # touch a handful of elements (the r9 lambda caveat doesn't bite).
    # Corpus passes: 3 -> 1; shuffles: the g aggregate (same as the old
    # distinct) + an output-bounded (sa, sb) agg whose map-side partial
    # collapses to <= |sources|^2 rows per task. Same-session A/B at
    # sf0.1 (3-pass medians): 4.08 s -> 1.37 s (3.0x); hash-identical
    # at sf0.001 and sf0.01.
    per_gram = (
        grams.join(docs, "doc_id")
        .groupBy("g")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
    )
    combos = F.expr(
        "flatten(transform(ss, (a, i) -> concat("
        "array(named_struct('sa', a, 'sb', CAST(NULL AS STRING))), "
        "transform(slice(ss, i + 2, size(ss)), "
        "b -> named_struct('sa', a, 'sb', b)))))"
    )
    # bounded: <= |sources|^2 + |sources| rows, read three times (pairs
    # once, totals twice as na/nb). r16 (VERDICT r15 #4): an eager
    # localCheckpoint instead of a bare persist — same
    # evaluate-once-within-the-query behavior, but the blocks are
    # released by the ContextCleaner when the frame is dropped instead
    # of leaking until session exit (the x_pagerank consistency fix).
    counts = (
        per_gram.select(F.explode(combos).alias("c"))
        .groupBy(F.col("c.sa").alias("sa"), F.col("c.sb").alias("sb"))
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    pairs = counts.filter(F.col("sb").isNotNull()).select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        F.col("n").alias("shared_grams"),
    )
    tot = counts.filter(F.col("sb").isNull()).select(
        F.col("sa").alias("source"), F.col("n").alias("n_grams")
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n_grams").alias("na"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n_grams").alias("nb"))
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("shared_grams").cast("long").alias("shared_grams"),
            F.expr("shared_grams * 1000000 div least(na, nb)").cast("long").alias(
                "containment_ppm"
            ),
        )
        .orderBy("source_a", "source_b")
    )


_MRL_DIMS = (8, 16, 32)


@query(
    "x_matryoshka_eval",
    # Matryoshka-truncation retrieval audit (Kusupati et al. 2022, MRL):
    # how much of the full-dimension top-3 neighbor set survives when
    # embeddings are truncated to a prefix of 8/16/32 dims — the exact
    # measurement that decides how small a production index can go.
    # Overlap counts are integers; both rankings are decimal-rounded
    # cosines with doc_id tiebreaks, so the whole audit is hash-exact.
    oracle=f"""
    WITH dims AS (SELECT unnest({list(_MRL_DIMS)!r}) AS dim),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    full_pairs AS (
        SELECT q.qid, e.vec_id,
               list_sum(list_transform(list_zip(q.qe, e.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cosine
        FROM q JOIN embeddings e ON e.vec_id <> q.qid),
    full_top AS (
        SELECT qid, vec_id FROM full_pairs
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY ROUND(cosine, 4) DESC, vec_id) <= 3),
    trunc_pairs AS (
        SELECT d.dim, q.qid, e.vec_id,
               list_sum(list_transform(list_zip(q.qe[1:d.dim], e.embedding[1:d.dim]),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe[1:d.dim], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding[1:d.dim], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               AS cosine
        FROM q JOIN embeddings e ON e.vec_id <> q.qid CROSS JOIN dims d),
    trunc_top AS (
        SELECT dim, qid, vec_id FROM trunc_pairs
        QUALIFY row_number() OVER (PARTITION BY dim, qid ORDER BY ROUND(cosine, 4) DESC, vec_id) <= 3)
    SELECT t.dim AS dim, t.qid AS qid,
           CAST(count(f.vec_id) AS BIGINT) AS n_kept
    FROM trunc_top t
    LEFT JOIN full_top f ON f.qid = t.qid AND f.vec_id = t.vec_id
    GROUP BY t.dim, t.qid
    ORDER BY t.dim, t.qid
    """,
    doc="Matryoshka truncation audit: per-query overlap of truncated-dim (8/16/32) top-3 vs full-dim top-3 — the dim-vs-recall curve for index sizing",
)
def x_matryoshka_eval(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: one corpus pass scores ALL truncation dims at once
    (the dims table is a 3-row broadcast riding the same pair join as
    d44 — slicing is free relative to the pair fan-out); per-(dim, qid)
    top-3 via bounded rank windows; the overlap join touches 3*k rows
    per query. The production use: pick the smallest dim whose n_kept
    histogram clears the recall bar, then build the ANN index at THAT
    dim — 8x memory saved if dim 8 holds."""
    emb = load_table(spark, sf, "embeddings")
    dims = spark.createDataFrame([(d,) for d in _MRL_DIMS], "dim int")
    corpus = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    full_pairs = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    fcos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    wq = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    full_top = (
        full_pairs.select("qid", "vec_id", F.round(fcos, 4).cast("double").alias("cosine"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 3)
        .select("qid", F.col("vec_id").alias("f_vec"))
    )
    tq = F.slice(F.col("qe"), 1, F.col("dim"))
    te = F.slice(F.col("embedding"), 1, F.col("dim"))
    tcos = _dot(tq, te) / (_norm(tq) * _norm(te))
    wdq = Window.partitionBy("dim", "qid").orderBy(F.desc("cosine"), "vec_id")
    trunc_top = (
        full_pairs.crossJoin(F.broadcast(dims))
        .select("dim", "qid", "vec_id", F.round(tcos, 4).cast("double").alias("cosine"))
        .withColumn("rn", F.row_number().over(wdq))
        .filter(F.col("rn") <= 3)
        .select("dim", "qid", "vec_id")
    )
    return (
        trunc_top.join(
            full_top,
            (trunc_top.qid == full_top.qid) & (trunc_top.vec_id == full_top.f_vec),
            "left",
        )
        .groupBy(trunc_top.dim, trunc_top.qid)
        .agg(F.count(full_top.f_vec).cast("long").alias("n_kept"))
        .orderBy("dim", "qid")
    )


_SWEEP_TAUS = (50, 70, 80, 90, 95)  # Jaccard thresholds in percent


@query(
    "x_dedup_threshold_sweep",
    # Threshold-sensitivity report for near-dup removal: qualifying
    # pair counts at five Jaccard cutoffs from ONE inverted-index pass
    # — the curve a pipeline owner reads before picking tau (too low:
    # false merges; too high: missed dups). Comparisons are exact
    # integer cross-products i*100 >= tau*(union), never float
    # thresholds.
    oracle=f"""
    WITH {_NG_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT i, sa.n + sb.n - i AS u
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b),
    taus AS (SELECT unnest({list(_SWEEP_TAUS)!r}) AS tau_pct)
    SELECT tau_pct,
           CAST(count(*) FILTER (WHERE i * 100 >= tau_pct * u) AS BIGINT)
               AS n_pairs
    FROM pairs CROSS JOIN taus
    GROUP BY tau_pct ORDER BY tau_pct
    """,
    doc="dedup threshold sweep: near-dup pair counts at Jaccard 0.5/0.7/0.8/0.9/0.95 from one inverted-index pass — the tau-selection curve, exact integer comparisons",
)
def x_dedup_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: identical cost to ONE x_ngram_jaccard run — the
    pair intersection table is computed once and the five thresholds
    are conditional counts over it (a 5-row broadcast cross join), not
    five passes. The same sweep at production scale runs over MinHash
    estimates instead of exact grams; the report shape is unchanged."""
    ng = doc_ngrams(spark, sf).select("doc_id", F.xxhash64("g").alias("g"))
    sizes = ng.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ng.alias("a")
    b = ng.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    pairs = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("i", (F.col("sa.n") + F.col("sb.n") - F.col("i")).alias("u"))
    )
    taus = spark.createDataFrame([(t,) for t in _SWEEP_TAUS], "tau_pct int")
    return (
        pairs.crossJoin(F.broadcast(taus))
        .groupBy("tau_pct")
        .agg(
            F.count(F.when(F.col("i") * 100 >= F.col("tau_pct") * F.col("u"), 1))
            .cast("long")
            .alias("n_pairs")
        )
        .orderBy("tau_pct")
    )


@query(
    "x_ngram_novelty_curve",
    # Corpus novelty curve: scanning documents in doc_id order, what
    # fraction of each decile's distinct 3-grams is NEW (first seen in
    # that decile)? The curve that says when a crawl stops adding
    # information — flat tail = stop collecting, pure dedup ROI ahead.
    oracle=f"""
    WITH {_NG_SQL},
    mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
    firsts AS (SELECT g, min(doc_id) AS first_doc FROM ng GROUP BY g),
    per_doc AS (
        SELECT n.doc_id, count(*) AS n_grams,
               count(*) FILTER (WHERE f.first_doc = n.doc_id) AS n_first
        FROM ng n JOIN firsts f ON f.g = n.g
        GROUP BY n.doc_id)
    SELECT CAST(p.doc_id * 10 // mx.m AS BIGINT) AS decile,
           CAST(SUM(p.n_grams) AS BIGINT) AS n_grams,
           CAST(SUM(p.n_first) AS BIGINT) AS n_novel,
           CAST(SUM(p.n_first) * 1000000 // SUM(p.n_grams) AS BIGINT) AS novelty_ppm
    FROM per_doc p CROSS JOIN mx
    GROUP BY 1 ORDER BY decile
    """,
    doc="corpus novelty curve: per doc_id-decile share of 3-grams first seen there (integer ppm) — the marginal-information audit for crawl sizing",
)
def x_ngram_novelty_curve(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: one gram shuffle whose window computes each
    gram's first-occurrence owner in place (r15: formerly an aggregate
    joined back, re-running the gram explode), then the per-doc
    rollup; the decile rollup is 10 rows. 'First seen'
    is defined by the stable doc_id order, so the curve is deterministic
    and incremental refreshes (new docs get higher ids) only APPEND
    deciles — no historical bucket ever changes."""
    ng = doc_ngrams(spark, sf)  # distinct (doc_id, g), 3-grams
    docs = load_table(spark, sf, "documents")
    mx = docs.agg((F.max("doc_id") + 1).alias("m"))
    # r15 (guide §2.4): the first-occurrence table was an aggregate
    # joined back onto its own input — the gram explode ran twice (the
    # broadcast build recomputes its subtree). min(doc_id) over a
    # g-keyed window computes the owner in place on ONE gram pass,
    # riding the same exchange the aggregate paid; every row still
    # flows to the per-doc rollup. Hash-identical.
    per_doc = (
        ng.withColumn("first_doc", F.min("doc_id").over(Window.partitionBy("g")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias("n_first"),
        )
    )
    return (
        per_doc.crossJoin(F.broadcast(mx))
        .groupBy(F.expr("doc_id * 10 div m").cast("long").alias("decile"))
        .agg(
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_first").cast("long").alias("n_novel"),
        )
        .select(
            "decile", "n_grams", "n_novel",
            F.expr("n_novel * 1000000 div n_grams").cast("long").alias("novelty_ppm"),
        )
        .orderBy("decile")
    )


@query(
    "x_keyness_tokens",
    # Label-discriminative vocabulary (keyness): for each token, the
    # difference between its document frequency RATE inside the target
    # label (lang='en') and outside it, in ppm; top 20 by keyness with
    # the token as the unique tie-breaker. Document-distinct tokens
    # (each doc votes once per token) so a single repetitive document
    # cannot dominate — the same discipline as the containment ops. A
    # minimum pooled document frequency of 5 drops the long noise tail
    # before ranking. Both ppm divisions run over non-negative integers
    # (DuckDB // floors, Spark div truncates — they agree only above
    # zero), and the subtraction happens after both divisions.
    oracle="""
    WITH tok AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
               UNNEST(list_distinct(list_filter(
                   string_split(lower(text), ' '), t -> length(t) >= 3))) AS token
        FROM documents),
    tot AS (
        SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
               SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n_rest
        FROM documents),
    c AS (
        SELECT token, SUM(is_en)::BIGINT AS df_en,
               SUM(1 - is_en)::BIGINT AS df_rest
        FROM tok GROUP BY token
        HAVING SUM(is_en) + SUM(1 - is_en) >= 5)
    SELECT token, df_en, df_rest,
           CAST(df_en * 1000000 // tot.n_en
                - df_rest * 1000000 // tot.n_rest AS BIGINT) AS keyness_ppm
    FROM c CROSS JOIN tot
    ORDER BY keyness_ppm DESC, token LIMIT 20
    """,
    doc="top-20 label-discriminative tokens by doc-frequency-rate difference (keyness, ppm, doc-distinct votes, min pooled df 5) — the feature-selection pass a quality/label classifier starts from",
)
def x_keyness_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: one token explode into a map-side-combined groupBy
    (vocabulary-sized output, corpus-sized input read once), the two
    label totals broadcast as a 1-row frame, and a TakeOrdered(20) —
    no window over the corpus, no join bigger than the vocabulary.
    Keyness via rate difference stays in exact integers; a chi-squared
    variant would need N*(ad-bc)^2 products that overflow bigint at
    corpus scale (int128 territory) for the same ranking on this data."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).cast("long").alias("is_en"),
        F.explode(
            F.expr("array_distinct(filter(split(lower(text), ' '), t -> length(t) >= 3))")
        ).alias("token"),
    )
    totals = docs.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("n_en"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).cast("long").alias("n_rest"),
    )
    counts = (
        toks.groupBy("token")
        .agg(
            F.sum("is_en").cast("long").alias("df_en"),
            F.sum(F.lit(1) - F.col("is_en")).cast("long").alias("df_rest"),
        )
        .filter(F.col("df_en") + F.col("df_rest") >= 5)
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token", "df_en", "df_rest",
            F.expr("df_en * 1000000 div n_en - df_rest * 1000000 div n_rest")
            .cast("long")
            .alias("keyness_ppm"),
        )
        .orderBy(F.desc("keyness_ppm"), "token")
        .limit(20)
    )
