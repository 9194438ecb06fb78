"""Contracts for the round-7 operators beyond the driver's oracle gate.

Oracle-checked ops (x_priority_sample, x_token_drift, x_entropy_score,
x_dedup_report, x_benford, x_skew_audit) get their values proven by
DuckDB hash-compare; the tests here pin the PROPERTIES the hash cannot
see (sampling monotonicity, entropy bounds, report consistency) plus
the full contract of the rows-only x_tokenizer_fertility.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chyme_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_priority_sample_weight_monotone(spark):
    """With the SAME uniform coin, priority is strictly increasing in
    weight — the defining property of priority sampling (q = w/u). The
    md5 coin depends only on doc_id, so two docs sharing a doc_id-hash
    cannot exist; instead prove monotonicity directly on the formula's
    components pulled from the op output."""
    rows = REGISTRY["x_priority_sample"].fn(spark, SF).collect()
    assert len(rows) == 64
    # priorities are sorted desc with doc_id tiebreak (TakeOrdered shape)
    ps = [(r.priority, -r.doc_id) for r in rows]
    assert ps == sorted(ps, reverse=True)
    # every priority is (weight << 31) div (h + 1) with h in [0, 2^31):
    # so priority >= weight (u <= 1) — the q = w/u lower bound
    for r in rows:
        assert r.priority >= r.weight


def test_priority_sample_prefers_heavy_docs(spark):
    """Token-weighted sampling must over-represent heavy documents:
    the mean weight of the 64 sampled docs exceeds the corpus mean."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_mean = docs.select(
        F.avg(F.size(F.split(F.lower("text"), " ")) + 1)
    ).first()[0]
    sample = REGISTRY["x_priority_sample"].fn(spark, SF).collect()
    sample_mean = sum(r.weight for r in sample) / len(sample)
    assert sample_mean > corpus_mean


def test_entropy_score_bounds(spark):
    """Quantized entropy bounds: 0 <= avg_bits <= log2(n_tokens), with
    equality at 0 iff every token is identical (c = L for all)."""
    import math

    rows = REGISTRY["x_entropy_score"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.avg_bits <= math.log2(max(r.n_tokens, 2)) + 1e-9
        assert r.sum_bits <= r.n_tokens * math.log2(max(r.n_tokens, 2)) + 1e-9


def test_token_drift_direction_consistent(spark):
    """direction=+1 rows must have en-side smoothed frequency >= other
    side and vice versa; drift_score is non-negative (ratio form)."""
    rows = REGISTRY["x_token_drift"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.drift_ppm >= 0 and r.drift_score >= 0
        assert r.direction in (1, -1)


def test_dedup_report_consistent_with_clusters(spark):
    """The report must tie out against the cluster labels it aggregates:
    sum(n_clusters * cluster_size) == #labeled docs, and removable docs
    == labeled docs - clusters."""
    labels = REGISTRY["x_dedup_clusters"].fn(spark, SF).collect()
    report = REGISTRY["x_dedup_report"].fn(spark, SF).collect()
    n_docs = len(labels)
    n_clusters = len({r.cluster_id for r in labels})
    assert sum(r.n_clusters * r.cluster_size for r in report) == n_docs
    assert sum(r.n_clusters for r in report) == n_clusters
    assert sum(r.n_removable_docs for r in report) == n_docs - n_clusters


def test_benford_ppm_sums(spark):
    """Observed ppm shares must sum to ~1e6 (floor division loses at
    most 8 ppm across 9 buckets) and counts to the orders row count."""
    rows = REGISTRY["x_benford"].fn(spark, SF).collect()
    assert [r.digit for r in rows] == [str(d) for d in range(1, 10)]
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n for r in rows) == n_orders
    total_ppm = sum(r.obs_ppm for r in rows)
    assert 1_000_000 - 8 <= total_ppm <= 1_000_000


def test_skew_audit_cumulative(spark):
    """cum_share_ppm is nondecreasing and consistent with the per-rank
    shares; ranks are 1..10."""
    rows = REGISTRY["x_skew_audit"].fn(spark, SF).collect()
    assert [r.rank_pos for r in rows] == list(range(1, 11))
    cums = [r.cum_share_ppm for r in rows]
    assert cums == sorted(cums)
    # cumulative >= sum of exact shares (floor effects only shrink parts)
    assert cums[-1] >= sum(r.share_ppm for r in rows) - 10


def test_tokenizer_fertility_contract(spark):
    """Full contract for the rows-only op: (a) one row per language;
    (b) fertility >= 1e6 ppm (BPE only ever splits words, so subwords
    >= words); (c) the subword accounting identity — n_subwords equals
    the corpus word counts weighted by each word's trained symbol
    count, recomputed independently here from the trainer's words
    table; (d) no word of the corpus is dropped by the vocabulary join."""
    from chyme_spark.ops.training import _train_merges

    rows = REGISTRY["x_tokenizer_fertility"].fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert {r.lang for r in rows} == langs
    for r in rows:
        assert r.fertility_ppm >= 1_000_000
        assert r.n_subwords >= r.n_words
        assert r.fertility_ppm == (r.n_subwords * 1_000_000) // r.n_words

    # independent accounting: corpus word totals per lang must equal the
    # op's n_words (i.e. the vocab join dropped nothing)
    per_lang = {
        row.lang: row.n
        for row in docs.select(
            "lang", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_words == per_lang[r.lang]

    # spot-identity on one language: recompute n_subwords from the
    # trained vocabulary directly
    _, words = _train_merges(spark, SF)
    vocab = {row.w: row.n_sub for row in words.select("w", F.size("sym").alias("n_sub")).collect()}
    lang0 = sorted(langs)[0]
    expect = 0
    for row in (
        docs.filter(F.col("lang") == lang0)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .collect()
    ):
        expect += vocab[row.w]
    got = {r.lang: r.n_subwords for r in rows}[lang0]
    assert got == expect


def test_dataset_card_coheres_with_filter_pipeline(spark):
    """Two independent implementations of 'exact duplicate' (md5 text
    key, min-doc_id survivor) must agree: the dataset card's TOTAL
    n_dup_docs equals the filter pipeline's count of drop:duplicate
    decisions, and the per-language card rows sum to the TOTAL row."""
    card = {r.lang: r for r in REGISTRY["x_dataset_card"].fn(spark, SF).collect()}
    pipe = REGISTRY["x_corpus_filter_pipeline"].fn(spark, SF).collect()
    n_dup_pipe = sum(1 for r in pipe if r.decision == "drop:duplicate")
    assert card["TOTAL"].n_dup_docs == n_dup_pipe
    langs = [lang for lang in card if lang != "TOTAL"]
    for col in ("n_docs", "n_tokens", "total_chars", "n_dup_docs"):
        assert sum(getattr(card[lang], col) for lang in langs) == getattr(
            card["TOTAL"], col
        )


def test_recursive_cte_matches_python_bfs(spark):
    """x_recursive_cte runs the IDENTICAL SQL on both engines, so its
    oracle proves engine equivalence but not logic — a shared-SQL bug
    would pass both sides. This model check is the independent leg:
    rebuild the edge set with DataFrame ops, enumerate <= 3-hop paths
    with a plain Python BFS, and compare min-hops and path counts."""
    from collections import defaultdict

    rows = REGISTRY["x_recursive_cte"].fn(spark, SF).collect()
    got = {(r.start_nation, r.node): (r.min_hops, r.n_paths) for r in rows}

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{SF}/supplier.parquet").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("c_nationkey", "s_nationkey")
        .count()
        .filter(F.col("count") >= 20)
        .collect()
    )
    adj = defaultdict(list)
    for r in pairs:
        adj[r.c_nationkey].append(r.s_nationkey)
    nations = [r.n_nationkey for r in spark.read.parquet(f"{SF}/nation.parquet").select("n_nationkey").collect()]

    want: dict[tuple[int, int], tuple[int, int]] = {}
    for start in nations:
        # path enumeration with hop cap 3, exactly the CTE's semantics
        counts: dict[tuple[int, int], int] = defaultdict(int)  # (node, hops) -> paths
        counts[(start, 0)] = 1
        frontier = {start: 1}
        for hop in (1, 2, 3):
            nxt: dict[int, int] = defaultdict(int)
            for node, npaths in frontier.items():
                for dst in adj[node]:
                    nxt[dst] += npaths
            for node, npaths in nxt.items():
                counts[(node, hop)] += npaths
            frontier = nxt
        per_node: dict[int, tuple[int, int]] = {}
        for (node, hops), npaths in counts.items():
            mh, tp = per_node.get(node, (99, 0))
            per_node[node] = (min(mh, hops), tp + npaths)
        for node, (mh, tp) in per_node.items():
            want[(start, node)] = (mh, tp)

    assert got == want
