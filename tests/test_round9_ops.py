"""Property/invariant tests for the round-9 operators — semantic
contracts the DuckDB hash oracle cannot express (AUC extremes on
constructed separable/random data, bin partition totality, transpose
shape duality, keyness support floor), mostly on inputs where the
expected answer is known a priori.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chyme_spark.registry import load_all
from chyme_spark.session import load_table

REGISTRY = load_all()


# ---------------------------------------------------------------- AUC


def _auc_of(spark, rows):
    """Run the x_auc_score arithmetic on constructed (source, v, lang)
    rows by writing them as a one-table parquet dir and calling the op."""
    import tempfile

    d = tempfile.mkdtemp(prefix="auc_")
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return {r.source: r for r in REGISTRY["x_auc_score"].fn(spark, d).collect()}


def test_auc_perfect_separation_is_one_million(spark):
    # every positive scores above every negative -> AUC = 1.0 exactly
    rows = [(i, "t", "en", "s", 100 + i) for i in range(10)] + [
        (100 + i, "t", "de", "s", i) for i in range(10)
    ]
    out = _auc_of(spark, rows)
    assert out["s"].auc_ppm == 1_000_000
    assert out["s"].n_pos == 10 and out["s"].n_neg == 10


def test_auc_inverted_separation_is_zero(spark):
    rows = [(i, "t", "en", "s", i) for i in range(10)] + [
        (100 + i, "t", "de", "s", 100 + i) for i in range(10)
    ]
    assert _auc_of(spark, rows)["s"].auc_ppm == 0


def test_auc_all_tied_is_exactly_half(spark):
    # identical scores: every pos/neg pair is a tie -> AUC = 0.5 exactly
    rows = [(i, "t", "en", "s", 7) for i in range(5)] + [
        (100 + i, "t", "de", "s", 7) for i in range(5)
    ]
    assert _auc_of(spark, rows)["s"].auc_ppm == 500_000


def test_auc_single_class_sources_dropped(spark):
    rows = [(i, "t", "en", "only_pos", i) for i in range(5)] + [
        (100 + i, "t", "de", "only_neg", i) for i in range(5)
    ]
    assert _auc_of(spark, rows) == {}


def test_auc_bounds_on_fixture(spark, sf_dir):
    for r in REGISTRY["x_auc_score"].fn(spark, sf_dir).collect():
        assert 0 <= r.auc_ppm <= 1_000_000
        assert r.n_pos > 0 and r.n_neg > 0


# -------------------------------------------------------- calibration


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    out = REGISTRY["x_calibration_bins"].fn(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in out) == total
    for r in out:
        assert 0 <= r.bin <= 9
        assert 0 <= r.mean_score_ppm <= 1_000_000
        assert 0 <= r.pos_rate_ppm <= 1_000_000
        assert r.gap_ppm == abs(r.mean_score_ppm - r.pos_rate_ppm)
    bins = [r.bin for r in out]
    assert len(bins) == len(set(bins))


# ---------------------------------------------------------- transpose


def test_transpose_stats_shape_duality(spark, sf_dir):
    """Transposed frame is metrics x languages; values must equal the
    straight groupBy read directly."""
    out = REGISTRY["x_transpose_stats"].fn(spark, sf_dir)
    assert out.columns == ["key", "de", "en", "es", "fr", "zh"]
    rows = {r.key: r for r in out.collect()}
    assert set(rows) == {"n_docs", "sum_chars", "n_sources"}
    docs = load_table(spark, sf_dir, "documents")
    direct = {
        r.lang: r
        for r in docs.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    for lang in ("de", "en", "es", "fr", "zh"):
        assert rows["n_docs"][lang] == direct[lang].n
        assert rows["sum_chars"][lang] == direct[lang].s


# ------------------------------------------------------------ keyness


def test_keyness_support_floor_and_monotone_order(spark, sf_dir):
    out = REGISTRY["x_keyness_tokens"].fn(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    keyness = [r.keyness_ppm for r in out]
    assert keyness == sorted(keyness, reverse=True)
    for r in out:
        assert r.df_en + r.df_rest >= 5
        assert len(r.token) >= 3
        assert -1_000_000 <= r.keyness_ppm <= 1_000_000


def test_keyness_finds_a_label_exclusive_token(spark, sf_dir):
    """A token appearing in EVERY en doc and NO other doc must rank #1
    with keyness exactly 1e6 (constructed corpus)."""
    import tempfile

    d = tempfile.mkdtemp(prefix="key_")
    rows = [(i, "zzmarker common filler", "en", "s", 10) for i in range(6)] + [
        (100 + i, "common filler other", "de", "s", 10) for i in range(6)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = REGISTRY["x_keyness_tokens"].fn(spark, d).collect()
    assert out[0].token == "zzmarker" and out[0].keyness_ppm == 1_000_000
    by_tok = {r.token: r.keyness_ppm for r in out}
    # tokens present in every doc of both labels have keyness exactly 0
    assert by_tok.get("common") == 0 and by_tok.get("filler") == 0


# ------------------------------------------------- AUC property check


def _exact_auc_ppm(pairs):
    """Reference AUC in exact integers: (conc + ties/2) / (np*nn), ppm.

    O(n^2) pair enumeration — fine at property-test sizes, and an
    implementation as different as possible from the op's histogram +
    cumulative-window formulation (the point of the cross-check)."""
    pos = [v for v, y in pairs if y]
    neg = [v for v, y in pairs if not y]
    if not pos or not neg:
        return None
    num2 = 0  # doubled: +2 concordant, +1 tied
    for p in pos:
        for q in neg:
            if p > q:
                num2 += 2
            elif p == q:
                num2 += 1
    return num2 * 1_000_000 // (2 * len(pos) * len(neg))


def test_auc_matches_pairwise_reference_on_random_data(spark):
    """Cross-check the histogram/window AUC against brute-force pair
    counting on deterministic pseudo-random datasets with heavy ties
    (score domain 0..6 forces tie handling to matter)."""
    import hashlib

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    for salt in ("a", "b", "c"):
        rows, pairs = [], []
        for i in range(60):
            v = h(i, salt) % 7          # heavy ties
            y = h(i, salt + "y") % 3 == 0
            rows.append((i, "t", "en" if y else "de", "s", v))
            pairs.append((v, y))
        want = _exact_auc_ppm(pairs)
        out = _auc_of(spark, rows)
        assert out["s"].auc_ppm == want, (salt, out["s"].auc_ppm, want)
