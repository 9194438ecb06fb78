"""Training-data assembly operators: sequence packing and the
Arrow/numpy vectorized similarity path.

These extend the LLM family (ops/llm.py) with the two steps a
pretraining pipeline runs after dedup/filter/mix:

  * ``x_sequence_pack`` — assign documents to fixed-token-budget
    training sequences (concat-and-chunk), deterministically and in
    parallel across hash groups;
  * ``x_cosine_topk_np`` — the same brute-force cosine top-k as
    d44_cosine_topk, but computed as a blocked numpy matmul inside
    ``mapInPandas``: the Arrow fast path for embedding math, where a
    BLAS dgemm on a few thousand rows per batch beats per-element JVM
    higher-order functions by an order of magnitude at corpus scale.

Scale notes are in each docstring; neither operator collects corpus
data to the driver (the cosine op broadcasts only the bounded query
set, the packing op is pure window algebra).
"""

from __future__ import annotations

import zlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from chyme_spark.registry import query
from chyme_spark.session import load_table


@F.pandas_udf(DoubleType())
def _zlib_ratio(text: pd.Series) -> pd.Series:
    # vectorized over Arrow batches; zlib level 6 output length is
    # stable for a given input across runs and platforms
    def one(s: str) -> float:
        b = s.encode("utf-8")
        return round(len(zlib.compress(b, 6)) / len(b), 4) if b else 1.0

    return text.map(one)

_PACK_BUDGET = 2048  # tokens per training sequence
_PACK_GROUPS = 16  # parallel packing streams


@query(
    "x_sequence_pack",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {_PACK_GROUPS} AS grp
        FROM documents),
    o AS (
        SELECT doc_id, grp, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT)
               - n_tokens AS off
        FROM t)
    SELECT doc_id, grp, n_tokens, off,
           CAST(FLOOR(off / {_PACK_BUDGET}.0) AS BIGINT) AS pack_seq
    FROM o
    """,
    doc="sequence packing: concat-and-chunk docs into fixed-token-budget training sequences, parallel across hash groups",
)
def x_sequence_pack(
    spark: SparkSession, sf: str, budget: int = _PACK_BUDGET, n_groups: int = _PACK_GROUPS
) -> DataFrame:
    """Concat-and-chunk sample packing: every doc gets a byte-stable
    (group, offset) position and the training sequence id
    ``pack_seq = floor(offset / budget)`` — the standard pretraining
    packing scheme (docs straddling a boundary are split by the
    tokenizer downstream).

    Scale shape: ONE window cumsum per hash group — no global ordering,
    no single-partition window. ``n_groups`` is the parallelism knob:
    each group is an independent packing stream, so set it to ~the
    cluster's core count at 100 TB (the 16 default matches the sf0.1
    fixture). Group assignment hashes doc_id (md5 prefix, engine-stable,
    no RNG) so re-runs and engine swaps produce the identical pack
    layout — the same determinism contract as x_deterministic_split.
    """
    from chyme_spark.ops.llm import md5_bucket

    docs = load_table(spark, sf, "documents")
    # the ONE hash-coin definition (llm.md5_bucket) — round-6 review:
    # an inlined copy here would silently diverge from split/mixture/
    # resample if the coin ever changes
    grp = md5_bucket(F.col("doc_id").cast("string"), n_groups)
    t = docs.select(
        "doc_id",
        grp.alias("grp"),
        F.size(F.split(F.lower("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off")
    return t.select("doc_id", "grp", "n_tokens", off).withColumn(
        "pack_seq", F.floor(F.col("off") / float(budget)).cast("bigint")
    )


@query(
    "x_compression_ratio",
    oracle=None,  # rows-only: zlib byte counts are library/level specific;
    # the ordering contract (repetitive text compresses further) is
    # pinned in tests/test_training_ops.py
    doc="compression-ratio quality signal: zlib deflate ratio per doc via Arrow-batched pandas_udf (gibberish/boilerplate detector)",
)
def x_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Low-entropy detector: heavily repetitive/boilerplate text
    compresses far below ~0.4, random gibberish sits near 1.0, natural
    prose in between — a one-pass quality feature production corpus
    filters cut on (complementing x_repetition_filter's exact
    dup-n-gram rule).

    Python is unavoidable (no JVM-side deflate expression), so it runs
    as a vectorized pandas_udf over Arrow batches — per-batch C calls
    into zlib, no per-row serde.
    """
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        _zlib_ratio("text").alias("compression_ratio"),
    )


@query(
    "x_cosine_topk_np",
    # identical result contract to d44_cosine_topk — same oracle
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
    doc="vectorized cosine top-k: Arrow-batched numpy matmul (BLAS) over corpus partitions, broadcast query matrix — the SIMD fast path twin of d44",
)
def x_cosine_topk_np(spark: SparkSession, sf: str, topk: int = 3) -> DataFrame:
    """Blocked-matmul brute-force cosine top-k.

    Same semantics as d44_cosine_topk; different physical strategy:
    the corpus streams through ``mapInPandas`` in Arrow batches, each
    batch is one ``(batch x dim) @ (dim x nq)`` float64 dgemm, and each
    batch emits only its local top-k per query — so the shuffle after
    the scan carries ``n_batches * nq * k`` candidate rows, not the
    full |corpus| x |queries| score matrix. A final per-query window
    picks the global top-k from the candidates. Per-batch selection
    uses the same (rounded cosine DESC, vec_id ASC) order as the final
    ranking, so the union of batch top-ks provably contains the global
    top-k.

    The ONLY driver materialization is the query set itself —
    bounded (vec_id < 10 here; a few thousand rows in production) and
    broadcast once as a numpy matrix, which is exactly the broadcast
    d44 does JVM-side. The corpus never leaves the executors.

    At 100 TB this shape is bandwidth-bound on the parquet scan with
    the matmul hiding entirely inside it; the JVM higher-order-function
    twin (d44) spends ~10x more CPU per row on per-element lambda
    evaluation. Keep d44 as the pure-SQL oracle twin; route real
    embedding workloads here or through the ANN paths.
    """
    import numpy as np
    import pandas as pd

    from chyme_spark.ops.llm import _np_round4

    emb = load_table(spark, sf, "embeddings")
    q_rows = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding").collect()
    if not q_rows:
        # degrade like the JVM twin d44: empty query set -> empty result
        # (np.linalg.norm on a 0-d array would raise at the driver —
        # round-6 review)
        return spark.createDataFrame(
            [], "qid long, vec_id long, cosine double"
        )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, Qn))

    def score(batches):
        b_qids, b_qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            raw = mn @ b_qn.T  # (batch x nq)
            # HALF_UP away from zero, matching Spark F.round / DuckDB
            # ROUND — np.round is half-to-even, which would flip a
            # .00005 tie in the 4th decimal vs the oracle (ADVICE r2);
            # ONE definition shared with the llm.py gemm kernels so the
            # oracle-parity rounding rule cannot drift (round-11 review)
            sims = _np_round4(raw)
            out_qid, out_vid, out_cos = [], [], []
            for j in range(len(b_qids)):
                col = sims[:, j]
                mask = vids != b_qids[j]
                cand_v, cand_c = vids[mask], col[mask]
                # order by (cosine DESC, vec_id ASC) — identical to the
                # final window, so batch-local top-k is lossless
                order = np.lexsort((cand_v, -cand_c))[: int(topk)]
                out_qid.extend([b_qids[j]] * len(order))
                out_vid.extend(cand_v[order])
                out_cos.extend(cand_c[order])
            yield pd.DataFrame({"qid": out_qid, "vec_id": out_vid, "cosine": out_cos})

    cand = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="qid long, vec_id long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= topk).drop("rn")


@query(
    "x_embedding_centroids",
    # per-label centroids of the embedding column — the statistic behind
    # IVF coarse quantizers, semantic-dedup cluster summaries, and
    # class-prototype models. Output is (label, pos, centroid component)
    # rows, decimal-pinned; DuckDB's generate_subscripts is 1-based,
    # Spark's posexplode 0-based, aligned via pos + 1.
    # determinism note: the mean is CAST(exact decimal sum AS DOUBLE)
    # / count — both engines divide the IDENTICAL double by the same
    # integer, so the IEEE quotient matches bit-for-bit before ROUND.
    # (A decimal quotient would round to each engine's own result scale
    # — the un-pinnable case the TWAP note documents; floor-division
    # pinning is unusable here because components can be NEGATIVE and
    # Spark `div` truncates toward zero while DuckDB `//` floors.)
    oracle="""
    SELECT label,
           pos,
           CAST(ROUND(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE) / count(*), 4)
                AS DOUBLE) AS centroid
    FROM (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               unnest(embedding) AS v
        FROM embeddings)
    GROUP BY label, pos
    """,
    doc="per-label embedding centroids: posexplode + decimal mean per (label, dimension) — the IVF coarse-quantizer / class-prototype statistic",
)
def x_embedding_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB plan: posexplode widens each row to dim rows BEFORE the
    shuffle, but hash aggregation runs map-side first, so the exchange
    carries at most n_labels x dim partial sums PER TASK (a few KB),
    not n_rows x dim — the same partial-agg shape that makes d14 scale.
    The decimal sum makes the mean order-insensitive (float addition
    is not associative; a double sum would hash-diverge between
    engines and between partitionings)."""
    emb = load_table(spark, sf, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(18,8)")).cast("double") / F.count("*"),
                4,
            ).cast("double").alias("centroid")
        )
    )


@query(
    "x_doc_chunk_windows",
    # Overlapping context-window chunking: the retrieval/training step
    # that splits each document into fixed-width character windows with
    # stride overlap (window 200, stride 150 -> 50-char overlap between
    # consecutive chunks), the standard pre-embedding chunker for RAG
    # indexes and long-doc training shards.
    oracle="""
    SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_id,
           substr(text, CAST(t.i*150+1 AS INT), 200) AS chunk_text
    FROM documents, LATERAL unnest(range(0,
      CASE WHEN len(text) <= 200 THEN 1
           ELSE 1 + CAST(ceil((len(text)-200)/150.0) AS BIGINT) END)) AS t(i)
    """,
    doc="overlapping char-window chunking (window 200, stride 150): 1 doc -> N chunks for RAG/long-doc training; deterministic substrings",
)
def x_doc_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """1 -> N fan-out with zero shuffle: the chunk grid is computed
    per-row from the document length (sequence + posexplode + substr),
    entirely inside whole-stage codegen — a narrow map, so at 100 TB it
    streams through executors at scan speed and the output partitioning
    inherits the input's. The chunk count formula guarantees full
    coverage: the last window starts at the largest stride multiple that
    still leaves <= 200 chars, and short docs yield exactly one chunk.

    Ref parity: the same 1-resource -> N-tasks fan-out contract as the
    reference's task templating (internal/tasker/template.go:7-35),
    applied inside a document instead of across blobs.
    """
    return chunk_windows(load_table(spark, sf, "documents"))


def chunk_windows(docs: DataFrame, window: int = 200, stride: int = 150) -> DataFrame:
    """Core of x_doc_chunk_windows over any (doc_id, text) DataFrame —
    factored out so property tests can drive it with adversarial
    window/stride geometry (tests/test_properties.py)."""
    n = F.length("text")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        (F.lit(1) + F.ceil((n - window) / F.lit(float(stride)))).cast("int")
    )
    return docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.col("text").substr(i * stride + 1, F.lit(window)),
            )
        ).alias("chunk_id", "chunk_text"),
    ).select("doc_id", F.col("chunk_id").cast("long").alias("chunk_id"), "chunk_text")


_BPE_MERGES = 12  # rounds of the trainer (bounded; each is one job)


def _merge_pair(sym, a_col, b_col):
    """Replace every adjacent (a, b) in the symbol array with a||b —
    a single JVM fold, no Python in the loop. The accumulator carries
    (out array, pending flag): pending=1 means the previous symbol was
    `a` and is NOT yet emitted; seeing `b` now emits the merged token."""
    from pyspark.sql import functions as F

    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(0).alias("pend")
    )

    def step(acc, s):
        emit_merged = (acc["pend"] == 1) & (s == b_col)
        start_pend = s == a_col
        new_out = (
            F.when(emit_merged, F.concat(acc["out"], F.array(F.concat(a_col, b_col))))
            # flush the pending `a` that did not pair, then maybe re-pend
            .when(
                (acc["pend"] == 1) & start_pend, F.concat(acc["out"], F.array(a_col))
            )
            .when(
                acc["pend"] == 1, F.concat(acc["out"], F.array(a_col, s))
            )
            .when(start_pend, acc["out"])
            .otherwise(F.concat(acc["out"], F.array(s)))
        )
        new_pend = (
            F.when(emit_merged, F.lit(0))
            .when(start_pend, F.lit(1))
            .otherwise(F.lit(0))
        )
        return F.struct(new_out.alias("out"), new_pend.alias("pend"))

    folded = F.aggregate(sym, init, step)
    return F.when(
        folded["pend"] == 1, F.concat(folded["out"], F.array(a_col))
    ).otherwise(folded["out"])


@query(
    "x_bpe_train",
    oracle=None,  # iterative trainer — no single SQL equivalent; exact
    # contract pinned against a pure-Python BPE in tests/test_round6_ops.py
    doc="distributed BPE merge training (Sennrich 2016): N merge rounds over the word-frequency table; deterministic (max count, lexicographic pair) tie-break; rows-only",
)
def x_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train the first 12 BPE merges on the corpus, Spark-first.
    (Thin wrapper over :func:`_train_merges`; x_bpe_apply reuses the
    same merge table to encode.)

    The trainer never touches the corpus after ONE groupBy(word) pass:
    like the reference Sennrich implementation it operates on the
    word-frequency table, whose size is the distinct vocabulary — at
    100 TB still millions of rows, not trillions. Each round is one
    weighted pair-count aggregation over that table (map-side combine),
    an argmax collected as a 1-row scalar (bounded driver traffic), and
    a JVM-side fold rewriting the symbol arrays — no Python, no corpus
    re-scan. Lineage is truncated every few rounds (localCheckpoint)
    exactly like the repo's connected-components loop.

    Determinism: the winning pair is (max weighted count, then
    lexicographically smallest (a, b)), so every engine and run picks
    the same merge sequence.
    """
    merges, _ = _train_merges(spark, sf)
    return spark.createDataFrame(
        merges, "rank int, a string, b string, merged string, pair_count long"
    )


_BPE_DRIVER_VOCAB_CAP = 1 << 17  # <= 131072 distinct words collect to the driver


def _train_merges(spark: SparkSession, sf: str):
    """Run the trainer; return (merge table, final symbolized
    word-frequency DataFrame). The words table after the last round IS
    the BPE-encoded vocabulary — x_bpe_apply reads token statistics
    straight off it with no re-encoding pass.

    ADAPTIVE strategy (r13, the census playbook): the corpus-sized
    work is the ONE distributed groupBy(word) pass; the merge loop
    itself only ever touches the word-frequency table. When that
    table is driver-small (<= _BPE_DRIVER_VOCAB_CAP rows — ~131k
    words, a few MB; the r12 census measured the 12-round distributed
    loop at 7.4-9.5 s of pure job dispatch over a vocabulary-sized
    table; the collected loop measures 1.2-1.5 s warm at sf0.1) the
    loop runs collected, in plain Python, with the IDENTICAL (max
    count, lexicographic pair) tie-break and greedy left-to-right
    application — tests/test_round13_ops.py pins the two paths
    merge-for-merge equal. Above the cap the distributed
    per-round loop below is the scale path, exactly as before: at
    100 TB a web vocabulary can exceed the cap, and each round stays
    one weighted pair-count aggregation with map-side combine. This
    is the compactor's sample rule applied to BPE: loop cost tracks
    min(|vocab|, cap) on the driver or |vocab| distributed — never
    |corpus|."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn("sym", F.split("w", ""))
        # persist: the cap gate's count() would otherwise re-run the
        # corpus explode+groupBy that the collect (driver path) or
        # every loop round's lineage prefix (distributed path) runs
        # again — one corpus pass, not two (r13 review). Vocab-sized,
        # ContextCleaner-bounded (the d43 sets.persist precedent).
        .persist()
    )
    n_vocab = words.count()  # bounded driver action: one scalar
    if n_vocab <= _BPE_DRIVER_VOCAB_CAP:
        return _train_merges_driver(spark, words)
    merges = []
    for rank in range(_BPE_MERGES):
        pairs = words.select(
            "freq",
            F.explode(
                F.when(
                    F.size("sym") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("sym") - 1),
                        lambda i: F.struct(
                            F.element_at("sym", i).alias("a"),
                            F.element_at("sym", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((rank, a, b, a + b, n))
        words = words.withColumn("sym", _merge_pair(F.col("sym"), F.lit(a), F.lit(b)))
        if rank % 4 == 3:
            words = words.localCheckpoint(eager=True)
    return merges, words


def _train_merges_driver(spark: SparkSession, words_df: DataFrame):
    """Driver-side merge loop over a collected word-frequency table
    (the under-cap branch of :func:`_train_merges`). Same algorithm,
    same tie-breaks, same outputs as the distributed loop — pinned
    equal in tests/test_round13_ops.py — just without 12 rounds of
    job dispatch for a table that fits in one pandas frame."""
    from collections import Counter

    rows = words_df.select("w", "freq").collect()
    freqs = {r["w"]: r["freq"] for r in rows}
    words = {w: list(w) for w in freqs}
    merges = []
    for rank in range(_BPE_MERGES):
        counts: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rank, a, b, a + b, int(n)))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    final = spark.createDataFrame(
        [(w, int(freqs[w]), words[w]) for w in sorted(freqs)],
        "w string, freq long, sym array<string>",
    )
    return merges, final


@query(
    "x_embedding_quantize",
    # int8 scalar quantization (the SQ step of FAISS-style SQ8 / PQ
    # pipelines): per-dimension affine codes
    #   code = floor((v - min_d) * 255 / (max_d - min_d))
    # Cross-engine exactness: min/max are order-independent aggregates,
    # and -,*,/ on doubles are IEEE correctly-rounded single ops — the
    # only nondeterminism classes (libm, reduction order) never appear,
    # so the codes hash-match bit-for-bit.
    oracle="""
    WITH e AS (
      SELECT vec_id,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
    rng AS (
      SELECT dim, CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi
      FROM e GROUP BY dim)
    SELECT e.vec_id, CAST(e.dim AS INT) AS dim,
           CAST(CASE WHEN rng.hi = rng.lo THEN 0
                     ELSE floor((CAST(e.v AS DOUBLE) - rng.lo) * 255.0
                                / (rng.hi - rng.lo))
                END AS INT) AS code
    FROM e JOIN rng USING (dim)
    """,
    doc="int8 scalar quantization of embeddings: per-dim affine codes floor((v-min)*255/(max-min)) — the 4x storage/bandwidth compressor in front of ANN at corpus scale",
)
def x_embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """The compression step a 100 TB embedding store runs before ANN:
    4 bytes -> 1 byte per dimension cuts scan bandwidth and candidate
    memory 4x, with the recall cost bounded (pinned in
    tests/test_round6_ops.py: int8-reconstructed cosine top-10 keeps
    >= 80% recall vs exact on this corpus).

    Scale shape: one posexplode pass; the per-dimension min/max table
    has #dims rows (a true broadcast dim); codes are a narrow
    whole-stage-codegen projection. The explode is for the oracle's
    benefit — a production writer would keep codes packed as
    array<tinyint> in one row per vector (same arithmetic, no shuffle
    at all).
    """
    emb = load_table(spark, sf, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v")
    ).select("vec_id", (F.col("pos0") + 1).cast("int").alias("dim"), "v")
    rng = e.groupBy("dim").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    return e.join(F.broadcast(rng), "dim").select(
        "vec_id",
        "dim",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.floor((F.col("v") - F.col("lo")) * 255.0 / (F.col("hi") - F.col("lo")))
        )
        .cast("int")
        .alias("code"),
    )


@query(
    "x_bpe_apply",
    oracle=None,  # depends on the trained merge table — no single SQL
    # equivalent; exact contract pinned against a sequential
    # Python encode in tests/test_round6_ops.py
    doc="apply the trained BPE merge table to encode the corpus: per-token frequency of the resulting subword vocabulary, top 30 (freq desc, token) — rows-only, exact encode contract in pytest",
)
def x_bpe_apply(spark: SparkSession, sf: str, topn: int = 30) -> DataFrame:
    """Tokenizer APPLICATION — the companion of x_bpe_train closing the
    train->encode loop a data pipeline actually ships.

    Spark-first: encoding costs nothing beyond training here, because
    the trainer's final word-frequency table already carries each
    word's merged symbol array (greedy left-to-right application of
    every merge in rank order, all JVM `aggregate` folds — no Python
    per word). Token statistics are then one explode + one
    groupBy(token) with map-side combine. At 100 TB the same shape
    holds: encode rides the word-frequency table (vocabulary-sized,
    not corpus-sized); only the final per-DOC token id materialization
    — not needed for corpus statistics — would rescan the corpus with
    the merge table broadcast.
    """
    from pyspark.sql import functions as F

    _, words = _train_merges(spark, sf)
    return (
        words.select(F.explode("sym").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(topn)
    )


@query(
    "x_embedding_pq",
    oracle=None,  # codebooks are trainer-specific geometry; recall
    # bracket + shortlist contract pinned in tests/test_round6_ops.py
    doc="product quantization ANN: M=16 subspace codebooks (seed-pinned numpy Lloyd on a hash-bounded sample), 16-byte codes, ADC shortlist via one Arrow encode+score pass with per-batch partial top-k, exact JVM re-rank of the shortlist to top-10 — rows-only, recall contract in pytest",
)
def x_embedding_pq(
    spark: SparkSession,
    sf: str,
    m_sub: int = 16,
    k: int = 16,
    shortlist: int = 50,
    topk: int = 10,
) -> DataFrame:
    """Product quantization — the third ANN scale path next to LSH and
    IVF (llm.py): 64 float dims -> M=16 codebook indices (16 bytes, a
    16x compression) with asymmetric-distance (ADC) scoring, then the
    production two-stage shape: ADC shortlists ``shortlist``
    candidates per query from codes alone, and only those candidates'
    full vectors are touched for the exact re-rank to ``topk``.

    100 TB shape: codebooks are fit per subspace on a SAMPLE (k x
    sub_dim floats — driver-tiny, like IVF's centroids) and broadcast;
    encoding is one corpus pass of M vectorized assignments. A query
    builds a (M x k) lookup table of partial squared distances — the
    ADC trick: approx dist is a SUM of M table lookups, never a
    float-vector scan of the corpus. The re-rank join touches
    |queries| x shortlist full vectors — the 4-byte-per-dim corpus
    scan PQ exists to avoid never happens.

    r13 rewrite (the census playbook): the r6 form paid 16 SEQUENTIAL
    Spark-ML KMeans fits plus 16 chained vector-conversion transforms
    — per-job dispatch overhead, not data work (15.6 s at sf0.1 in the
    r12 census, nearly SF-independent). Now (a) training follows the
    IVF compactor's sample rule (llm.py x_ivf_compaction): a
    deterministic hash-sample ``pmod(xxhash64(vec_id), ceil(n/65536))
    == 0`` caps the collected training set at ~65536 vectors no matter
    the corpus size, and all 16 subspace codebooks are Lloyd-iterated
    in numpy on the driver in milliseconds (seed-pinned deterministic
    init, argmin lowest-index tie-break, empty cells keep their old
    centroid — exactly FAISS's train-on-sample practice); (b) encode +
    ADC-score is ONE mapInPandas pass: per Arrow batch a (n, M, sub)
    reshape, M broadcasted-subtraction argmins for the codes (NOT the
    gemm identity |x|^2-2x@c.T+|c|^2 — that form can perturb near-tie
    argmins by ~1 ULP and break the determinism contract; the temporary
    is n_batch x k x sub doubles per subspace, bounded at defaults and
    linear in k if retuned — ADVICE r13), then the LUT sum for all
    queries at once, keeping only each batch's per-query top-
    ``shortlist`` (top-k is distributive, ties broken (adc, vec_id) —
    the same order the global window uses), so the shuffle into the
    final window carries <= partitions x |queries| x shortlist rows,
    never |corpus| x M exploded code rows. Measured 15.6 s (r12
    census) -> 3.3 s warm at sf0.1 (~4.7x); the exact JVM re-rank and
    the output contract are byte-identical in shape to r6
    (tests/test_round6_ops.py).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from chyme_spark.ops.llm import _np_round4

    emb = load_table(spark, sf, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    sub = dim // m_sub
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).persist()

    # --- train: numpy Lloyd per subspace on a hash-bounded sample ----
    n_corpus = vecs.count()  # bounded driver action: one scalar
    mod = max(1, math.ceil(n_corpus / 65536))
    sample = (
        vecs.filter(F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0)
        .orderBy("vec_id")  # collect order must not depend on partitioning
        .collect()
    )
    smat = np.array([r["e"] for r in sample], dtype=np.float64)
    # fail fast on a degenerate sample (ADVICE r13): pmod==0 hits are
    # probabilistic, so an empty (or sub-k) draw would otherwise surface
    # as an opaque rng.choice ValueError / silently train < k centroids
    if len(smat) < k:
        # mod == 1 means the "sample" was already the whole corpus, so
        # the only lever is k; otherwise the sampling mod is too coarse
        lever = (
            f"corpus has only {n_corpus} vectors — lower k"
            if mod == 1
            else f"lower the sampling mod (pmod(xxhash64(vec_id), {mod}) == 0 "
            f"matched {len(smat)} of {n_corpus})"
        )
        raise ValueError(
            f"PQ training sample ({len(smat)} vectors) is smaller than k={k}: "
            f"codebooks would silently shrink — {lever}"
        )
    rng = np.random.RandomState(42)
    centroids = []  # m -> (k, sub) ndarray
    for m in range(m_sub):
        x = smat[:, m * sub : (m + 1) * sub]
        init = rng.choice(len(x), size=k, replace=False)  # len(x) >= k guarded above
        c = x[np.sort(init)].copy()
        for _ in range(10):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # lowest index wins ties
            for j in range(len(c)):
                pts = x[assign == j]
                if len(pts):  # empty cell keeps its old centroid
                    c[j] = pts.mean(axis=0)
        centroids.append(c)

    # bounded query set (same convention as every ANN op: vec_id < 10)
    queries = (
        vecs.filter(F.col("vec_id") < 10).select("vec_id", "e").orderBy("vec_id").collect()
    )
    qids = np.array([q["vec_id"] for q in queries], dtype=np.int64)
    # LUT[q, m, code] = |q_sub - centroid|^2 — |queries| x M x k floats,
    # metadata-sized, shipped in the closure (broadcast)
    qmat = np.array([q["e"] for q in queries], dtype=np.float64)
    lut = np.stack(
        [
            ((qmat[:, m * sub : (m + 1) * sub][:, None, :] - centroids[m][None, :, :]) ** 2).sum(axis=2)
            for m in range(m_sub)
        ],
        axis=1,
    )  # (|queries|, M, k)

    def encode_score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["e"].to_numpy()).astype(np.float64)  # (n, dim)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            parts = []
            for m in range(m_sub):
                xs = v[:, m * sub : (m + 1) * sub]
                d2 = ((xs[:, None, :] - centroids[m][None, :, :]) ** 2).sum(axis=2)
                codes = d2.argmin(axis=1)  # (n,)
                parts.append(lut[:, m, codes])  # (|queries|, n)
            # HALF_UP, not np.round (half-to-even): the exact re-rank's
            # dist column still uses F.round, and the repo's rounding
            # convention is one-sided everywhere (r13 review)
            adc = _np_round4(np.add.reduce(parts))  # (|queries|, n)
            out = []
            for qi, qid in enumerate(qids):
                keep = ids != qid
                row_ids, row_adc = ids[keep], adc[qi][keep]
                # per-batch partial top-k, ties (adc, vec_id) — the
                # global window's exact order, so distributivity holds
                order = np.lexsort((row_ids, row_adc))[:shortlist]
                out.append(
                    pd.DataFrame(
                        {"qid": qid, "vec_id": row_ids[order], "adc_dist": row_adc[order]}
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = vecs.select("vec_id", "e").mapInPandas(
        encode_score, "qid long, vec_id long, adc_dist double"
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", "vec_id")
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .select("qid", "vec_id", "adc_dist")
    )
    # exact re-rank: only the shortlisted candidates' full vectors are
    # read — |queries| x shortlist rows, never the corpus
    qdf = spark.createDataFrame(
        [(q["vec_id"], [float(x) for x in q["e"]]) for q in queries],
        "qid long, qe array<double>",
    )
    exact = (
        cand.join(vecs.select("vec_id", "e"), "vec_id")
        .join(F.broadcast(qdf), "qid")
        .select(
            "qid",
            "vec_id",
            "adc_dist",
            F.round(
                F.aggregate(
                    F.zip_with("qe", "e", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                4,
            ).alias("dist"),
        )
    )
    wr = Window.partitionBy("qid").orderBy("dist", "vec_id")
    out = (
        exact.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= topk)
        .select("qid", "vec_id", "dist", "adc_dist", "rn")
    )
    vecs.unpersist()
    return out


@query(
    "x_mmr_rerank",
    oracle=None,  # rows-only: iterative greedy selection is not SQL-expressible;
    # the selection contract is pinned by tests/test_round6_cont3.py
    # (first pick == plain top-1, exact match vs an independent Python
    # MMR model, and strictly-no-worse diversity than plain top-k)
    doc="Maximal Marginal Relevance re-rank: Spark generates the bounded candidate pool (one corpus cosine pass), then greedy lambda-tradeoff selection picks k diverse results — the retrieval step between ANN and context packing",
)
def x_mmr_rerank(
    spark: SparkSession, sf: str, pool: int = 32, k: int = 10, lam_ppm: int = 700000
) -> DataFrame:
    """MMR (Carbonell & Goldstein 1998, public): greedily pick the
    candidate maximizing lam * sim(query, c) - (1 - lam) * max sim(c,
    selected).

    100 TB plan: the HEAVY step — scoring the corpus against the query
    and keeping the top ``pool`` — is one Spark pass (broadcast query,
    TakeOrdered pool), identical in shape to d44. The greedy loop is
    O(k * pool) on a pool BOUNDED BY CONSTRUCTION (32 vectors), the one
    place driver-side compute is the honest design (the same bounded
    exception as the collected query set, training.py cosine path); an
    in-Spark loop would launch k jobs to argmax 32 rows. Determinism:
    every similarity is rounded to 6 dp before comparison and ties
    break on vec_id, so float noise cannot reorder the selection; lam
    arrives as integer ppm for the same reason."""
    from chyme_spark.ops.llm import _dot, _norm

    emb = load_table(spark, sf, "embeddings")
    corpus = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("nrm").alias("qnrm")
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    ).cast("double")
    cand = (
        corpus.join(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", "nrm", cos.alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(pool)
        .collect()  # bounded: exactly `pool` rows by construction
    )
    lam = lam_ppm / 1_000_000.0

    def pair_sim(a, b) -> float:
        dot = sum(x * y for x, y in zip(a["embedding"], b["embedding"]))
        return round(dot / (a["nrm"] * b["nrm"]), 6)

    selected: list = []
    remaining = list(cand)
    while remaining and len(selected) < k:
        best = None
        for c in remaining:
            penalty = max((pair_sim(c, s) for s in selected), default=0.0)
            score = round(lam * c["rel"] - (1 - lam) * penalty, 6)
            key = (score, -c["vec_id"])
            if best is None or key > best[0]:
                best = (key, c, score)
        selected.append(best[1])
        remaining.remove(best[1])
    rows = [
        (i + 1, r["vec_id"], float(r["rel"])) for i, r in enumerate(selected)
    ]
    return spark.createDataFrame(rows, "rank int, vec_id bigint, relevance double")


@query(
    "x_tokenizer_fertility",
    oracle=None,  # depends on the trained BPE merge table — no single
    # SQL equivalent; the >=1 fertility bound, full vocabulary
    # coverage, and the exact subword accounting identity are pinned
    # in tests/test_round7_ops.py
    doc="per-language tokenizer fertility (BPE subwords per whitespace word) off the trained merge table — the tokenizer-budget audit a multilingual mixture needs; rows-only, contracts in pytest",
)
def x_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Fertility — subword tokens emitted per whitespace word — is the
    number that turns a language-mixture token budget into a real
    compute budget (high-fertility languages cost proportionally more
    sequence length per word; tokenizer papers report it per language
    for exactly this reason).

    Spark-first shape: the trained words table (vocabulary-sized, one
    row per distinct word with its merged symbol array) already knows
    each word's subword count, so fertility needs NO corpus re-encode:
    (1) one (lang, word) count shuffle over the corpus, (2) an
    equi-join to the |V|-row words table (un-hinted: AQE broadcasts at
    fixture scale, shuffles if the vocabulary outgrows that), (3) a
    ~5-row lang rollup. Integer ppm division keeps the output exact
    and order-independent; the join cannot drop words because the
    vocabulary and the lang counts come from the same tokenization
    (whitespace split, '' filtered) — an identity the pytest contract
    re-proves."""
    from pyspark.sql import functions as F

    _, words = _train_merges(spark, sf)
    vocab = words.select("w", F.size("sym").cast("long").alias("n_sub"))
    docs = load_table(spark, sf, "documents")
    lw = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        lw.join(vocab, "w")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("n_sub")).cast("long").alias("n_subwords"),
        )
        .select(
            "lang",
            "n_words",
            "n_subwords",
            F.expr("(n_subwords * 1000000L) div n_words").cast("long").alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


_SHUFFLE_EPOCHS = 3
_SHUFFLE_SHARDS = 16


@query(
    "x_epoch_shuffle",
    # Deterministic multi-epoch shuffle: the standard pretraining data
    # order — each epoch re-permutes the corpus with a different seed,
    # and the permutation is sharded so every data-loader worker draws
    # from its own independently-shuffled shard (no global sort at any
    # scale). The coin is md5(epoch ':' doc_id): engine-stable, no RNG
    # state, resumable mid-epoch from (epoch, shard, pos).
    oracle=f"""
    WITH e AS (SELECT unnest(range({_SHUFFLE_EPOCHS})) AS epoch),
    t AS (
        SELECT e.epoch, doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % {_SHUFFLE_SHARDS} AS shard,
               md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS coin
        FROM documents CROSS JOIN e)
    SELECT CAST(epoch AS BIGINT) AS epoch, shard, doc_id,
           CAST(row_number() OVER (
               PARTITION BY epoch, shard ORDER BY coin, doc_id) AS BIGINT) AS pos
    FROM t
    """,
    doc="deterministic multi-epoch shard shuffle: per-(epoch, shard) md5-coin permutation of the corpus — the seeded data-loader order, resumable from (epoch, shard, pos)",
)
def x_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: shard assignment is the SAME md5_bucket coin as
    split/mixture/pack (one definition, llm.md5_bucket), so shuffle
    shards align with every other sampled artifact; the permutation
    window partitions by (epoch, shard) — {_SHUFFLE_SHARDS} independent
    streams per epoch, each a bounded local sort, never a global one.
    At real scale shards = data-loader workers (set it to the reader
    parallelism) and the (epoch, shard, pos) triple is the resumable
    cursor a training job checkpoints — restart replays the identical
    order, which is what makes loss curves reproducible across
    restarts."""
    from chyme_spark.ops.llm import md5_bucket

    docs = load_table(spark, sf, "documents")
    epochs = F.explode(F.sequence(F.lit(0), F.lit(_SHUFFLE_EPOCHS - 1)))
    t = docs.select("doc_id", epochs.alias("epoch")).select(
        F.col("epoch").cast("long").alias("epoch"),
        md5_bucket(F.col("doc_id").cast("string"), _SHUFFLE_SHARDS).alias("shard"),
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"), F.col("doc_id").cast("string"))
        ).alias("coin"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("coin", "doc_id")
    return t.select(
        "epoch", "shard", "doc_id", F.row_number().over(w).cast("long").alias("pos")
    )


@query(
    "x_class_balance_resample",
    # Class-balanced downsampling: every language keeps exactly the
    # minority class's count, members chosen by the repo's one md5
    # sampling coin — the balanced-corpus prep for classifier training
    # (quality/langid heads train on balanced data; raw web corpora are
    # 100:1 skewed). Deterministic: same corpus -> same kept set.
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS target FROM c),
    r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
    SELECT doc_id, lang FROM r, m WHERE rk <= m.target
    ORDER BY lang, doc_id
    """,
    doc="class-balanced resample: per-language md5-coin rank, keep minority-class count from every language — deterministic balanced-training-set prep",
)
def x_class_balance_resample(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: class counts are an aggregate (|langs| rows); the
    global minimum is a 1-row broadcast; member selection is ONE
    per-language rank window ordered by the md5 coin — each language
    sorts independently (no global order), and the coin is
    content-stable so adding documents to one language never reshuffles
    another's kept set. The same pattern balances any categorical key
    (source, domain, topic cluster) at any cardinality."""
    docs = load_table(spark, sf, "documents")
    target = docs.groupBy("lang").count().agg(F.min("count").alias("target"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", "lang", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rk") <= F.col("target"))
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


_BUDGET_TOKENS = 30_000  # per-source token budget


@query(
    "x_token_budget_select",
    # Quality-first data selection under a token budget: within each
    # source, keep the highest-quality documents until the source's
    # token budget is exhausted — the selection step every mixture
    # executes after weights are decided (budgets come from
    # x_mixture_temperature-style allocations). Quality is lexical
    # diversity in exact integer ppm (distinct/total tokens); the
    # budget cut is an exact cumulative-sum window comparison.
    oracle=f"""
    WITH q AS (
        SELECT doc_id, source,
               len(string_split(lower(text), ' ')) AS toks,
               len(list_distinct(string_split(lower(text), ' '))) * 1000000
                   // len(string_split(lower(text), ' ')) AS quality_ppm
        FROM documents),
    c AS (
        SELECT doc_id, source, toks, quality_ppm,
               SUM(toks) OVER (
                   PARTITION BY source
                   ORDER BY quality_ppm DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM q)
    SELECT doc_id, source, CAST(toks AS BIGINT) AS toks,
           CAST(quality_ppm AS BIGINT) AS quality_ppm,
           CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= {_BUDGET_TOKENS}
    ORDER BY source, quality_ppm DESC, doc_id
    """,
    doc="token-budget data selection: per-source quality-ranked (lexical-diversity ppm) cumulative cut at 30k tokens — the mixture-execution step, exact integer arithmetic",
)
def x_token_budget_select(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: one rank+cumsum window PER SOURCE (sources sort
    independently — the parallelism unit is the mixture component, and
    a component too large to sort in one partition takes the
    x_stratified_split salted two-level prefix-sum form with no change
    to semantics). Quality and budget comparisons are exact integers,
    so the kept set is engine-reproducible — the property that lets a
    data card state 'top-N tokens by diversity' and be audited."""
    docs = load_table(spark, sf, "documents")
    toks = F.size(F.split(F.lower("text"), " "))
    q = docs.select(
        "doc_id", "source",
        toks.alias("toks"),
        F.expr(
            "size(array_distinct(split(lower(text), ' '))) * 1000000"
            " div size(split(lower(text), ' '))"
        ).alias("quality_ppm"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality_ppm"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = q.withColumn("cum", F.sum("toks").over(w))
    return (
        c.filter(F.col("cum") <= _BUDGET_TOKENS)
        .select(
            "doc_id", "source",
            F.col("toks").cast("long").alias("toks"),
            F.col("quality_ppm").cast("long").alias("quality_ppm"),
            F.col("cum").cast("long").alias("cum_tokens"),
        )
        .orderBy("source", F.desc("quality_ppm"), "doc_id")
    )


@query(
    "x_quantile_normalize",
    # Rank-based quantile normalization (the ML feature transform):
    # each document's length maps to its within-language uniform
    # quantile, as exact integer ppm of the rank — no interpolated
    # percentile floats, reproducible across engines and partitions.
    oracle="""
    WITH r AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents)
    SELECT doc_id, lang, n_chars,
           CAST(CASE WHEN n > 1 THEN (rk - 1) * 1000000 // (n - 1)
                     ELSE 500000 END AS BIGINT) AS quantile_ppm
    FROM r ORDER BY doc_id
    """,
    doc="rank-based quantile normalization per language: (rank-1)/(n-1) in exact integer ppm — the reproducible feature-scaling transform",
)
def x_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """100 TB shape: one rank window per language partition plus a
    per-language count — groups transform independently. Integer-ppm
    quantiles mean a model trained on these features can be re-fed
    bit-identical inputs from any engine that reproduces the ranks
    (tiebreak by doc_id makes them total)."""
    docs = load_table(spark, sf, "documents")
    wr = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    r = docs.select(
        "doc_id", "lang", "n_chars",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    return r.select(
        "doc_id", "lang", "n_chars",
        F.when(F.col("n") > 1, F.expr("(rk - 1) * 1000000 div (n - 1)"))
        .otherwise(500000)
        .cast("long")
        .alias("quantile_ppm"),
    ).orderBy("doc_id")
