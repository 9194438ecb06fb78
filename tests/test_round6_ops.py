"""Semantic contracts for the round-6 ops: sub-document dedup scrub,
temperature mixture weights, overlapping chunking, Z-order layout.

Each test pins a property the oracle hash cannot see on its own (e.g.
reconstruction fidelity, exact-integer sqrt pinning, window coverage,
interleave bijectivity)."""

from __future__ import annotations

import decimal
import math

from pyspark.sql import functions as F

from chyme_spark.registry import load_all
from chyme_spark.session import load_table

REGISTRY = load_all()


def _segments(text: str, k: int = 8) -> list[str]:
    ws = text.split(" ")
    return [" ".join(ws[i * k : (i + 1) * k]) for i in range(math.ceil(len(ws) / k))]


def test_segment_scrub_preserves_unique_docs_and_counts(spark, sf_dir):
    """Docs with nothing removed come back byte-identical; kept+removed
    equals the exact segment count of every doc; the kept multiset is
    exactly one copy of each distinct segment in the corpus."""
    out = {r["doc_id"]: r for r in REGISTRY["x_segment_dedup_scrub"].fn(spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").collect()}
    assert set(out) == set(docs)
    all_segs: list[str] = []
    for doc_id, text in docs.items():
        segs = _segments(text)
        all_segs.extend(segs)
        r = out[doc_id]
        assert r["n_kept"] + r["n_removed"] == len(segs), doc_id
        if r["n_removed"] == 0:
            assert r["scrubbed_text"] == text, doc_id
    n_kept_total = sum(r["n_kept"] for r in out.values())
    assert n_kept_total == len(set(all_segs))
    assert any(r["n_removed"] > 0 for r in out.values())


def test_segment_scrub_keeps_first_occurrence(spark, sf_dir):
    """The survivor of each duplicated segment is the global (min doc_id,
    min seg) occurrence — recomputed in pure Python."""
    docs = sorted(
        (r["doc_id"], r["text"]) for r in load_table(spark, sf_dir, "documents").collect()
    )
    expect_kept: dict[int, list[str]] = {}
    seen: set[str] = set()
    for doc_id, text in docs:
        kept = []
        for seg in _segments(text):
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        expect_kept[doc_id] = kept
    out = REGISTRY["x_segment_dedup_scrub"].fn(spark, sf_dir).collect()
    for r in out:
        assert r["scrubbed_text"] == " ".join(expect_kept[r["doc_id"]]), r["doc_id"]


def test_mixture_temperature_exact_isqrt_and_flattening(spark, sf_dir):
    """score is exactly floor(sqrt(n_tokens * 1e6)) (cross-checked with
    integer math.isqrt), ppm weights nearly sum to 1e6, and T=2
    flattening holds: every language's weight share is strictly closer
    to uniform than its raw token share (up-samples the tail)."""
    rows = REGISTRY["x_mixture_temperature"].fn(spark, sf_dir).collect()
    tot_tokens = sum(r["n_tokens"] for r in rows)
    tot_score = sum(r["score"] for r in rows)
    uniform = 1.0 / len(rows)
    assert 1_000_000 - len(rows) < sum(r["weight_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["score"] == math.isqrt(r["n_tokens"] * 1_000_000)
        assert r["weight_ppm"] == (r["score"] * 1_000_000) // tot_score
        raw = r["n_tokens"] / tot_tokens
        flat = r["score"] / tot_score
        if raw != uniform:
            assert abs(flat - uniform) < abs(raw - uniform), r["lang"]


def test_chunk_windows_cover_and_overlap(spark, sf_dir):
    """Every doc is fully covered: chunk i starts at 150*i, is <=200
    chars, consecutive chunks overlap by 50, and the concatenation of
    chunk starts reconstructs the text exactly."""
    chunks: dict[int, dict[int, str]] = {}
    for r in REGISTRY["x_doc_chunk_windows"].fn(spark, sf_dir).collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").collect()}
    assert set(chunks) == set(docs)
    for doc_id, text in docs.items():
        by_id = chunks[doc_id]
        n = len(by_id)
        assert sorted(by_id) == list(range(n))
        for i in range(n):
            assert by_id[i] == text[i * 150 : i * 150 + 200], (doc_id, i)
        # full coverage: the last window reaches the end of the doc
        assert (n - 1) * 150 + len(by_id[n - 1]) == len(text), doc_id
        if len(text) > 200:
            assert n == 1 + math.ceil((len(text) - 200) / 150)
        else:
            assert n == 1


def _interleave(x: int, y: int) -> int:
    z = 0
    for i in range(21):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_buckets_match_python_interleave(spark, sf_dir):
    """Per-zbucket counts equal a pure-Python Morton interleave of the
    same keys, and the layout actually clusters: every bucket's custkey
    range is a narrow slice of the full key domain."""
    orders = [
        (r["o_orderkey"], r["o_custkey"])
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    ]
    expect: dict[int, int] = {}
    for ok, ck in orders:
        b = _interleave(ck, ok) >> 16
        expect[b] = expect.get(b, 0) + 1
    got = {r["zbucket"]: r["n"] for r in REGISTRY["x_zorder_layout"].fn(spark, sf_dir).collect()}
    assert got == expect
    out = REGISTRY["x_zorder_layout"].fn(spark, sf_dir).collect()
    domain = max(ck for _, ck in orders) - min(ck for _, ck in orders) + 1
    # zbucket fixes custkey bits 8..15 (even bit positions 16+), so the
    # custkey spread inside one bucket is < 256: the min/max file stats
    # a reader would prune on are genuinely selective on BOTH keys
    for r in out:
        assert r["max_cust"] - r["min_cust"] < min(256, domain), r["zbucket"]


def test_lm_surprisal_exact_integer_log2(spark, sf_dir):
    """sum_bits equals a pure-Python floor(log2(T/c)) recompute over the
    whole corpus — the bin-length quantization is exactly the math it
    claims, and high-surprisal docs are rarer-bigram docs."""
    from collections import Counter

    docs = sorted(
        (r["doc_id"], r["text"]) for r in load_table(spark, sf_dir, "documents").collect()
    )
    corpus: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        bs = [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
        per_doc[doc_id] = bs
        corpus.update(bs)
    total = sum(corpus.values())
    out = {r["doc_id"]: r for r in REGISTRY["x_lm_surprisal_score"].fn(spark, sf_dir).collect()}
    assert set(out) == {d for d, bs in per_doc.items() if bs}
    for doc_id, bs in per_doc.items():
        if not bs:
            continue
        expect_bits = sum(
            math.floor(math.log2(total / corpus[b])) for b in bs
        )
        r = out[doc_id]
        assert r["n_bigrams"] == len(bs)
        assert r["sum_bits"] == expect_bits, doc_id
        # Spark/DuckDB ROUND is half-away-from-zero; Python's round() is
        # half-even — ties (dyadic quotients like 586/64 = 9.15625) need
        # the engines' convention here
        q = decimal.Decimal(repr(expect_bits / len(bs)))  # shortest repr of the double, as BigDecimal.valueOf does
        expect_avg = float(q.quantize(decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP))
        assert r["avg_surprisal"] == expect_avg, doc_id


def test_mixture_resample_consistent_with_weights(spark, sf_dir):
    """Rates follow the published weights exactly (integer recompute),
    the most up-weighted language keeps 100%, and n_kept matches a
    pure-Python md5-bucket replay over the corpus."""
    import hashlib

    weights = {
        r["lang"]: r for r in REGISTRY["x_mixture_temperature"].fn(spark, sf_dir).collect()
    }
    out = {r["lang"]: r for r in REGISTRY["x_mixture_resample"].fn(spark, sf_dir).collect()}
    assert set(out) == set(weights)
    r_raw = {
        lang: (weights[lang]["weight_ppm"] * 1_000_000) // out[lang]["n_docs"]
        for lang in out
    }
    m = max(r_raw.values())
    kept = dict.fromkeys(out, 0)
    n_docs = dict.fromkeys(out, 0)
    for row in load_table(spark, sf_dir, "documents").select("lang", "text").collect():
        lang = row["lang"]
        n_docs[lang] += 1
        bucket = int(hashlib.md5(row["text"].encode()).hexdigest()[:8], 16) % 1_000_000
        if bucket < (r_raw[lang] * 1_000_000) // m:
            kept[lang] += 1
    assert any(v["rate_ppm"] == 1_000_000 for v in out.values())
    for lang, v in out.items():
        assert v["rate_ppm"] == (r_raw[lang] * 1_000_000) // m, lang
        assert v["n_docs"] == n_docs[lang], lang
        assert v["n_kept"] == kept[lang], lang


def test_pmi_collocations_match_python(spark, sf_dir):
    """The top-100 positive-PMI pairs equal a pure-Python recompute:
    counts, the integer bit quantization, the min-count/positivity
    gates, and the deterministic (pmi_bits, cxy, wa, wb) ordering."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    tb = 0
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        ws = r["text"].split(" ")
        uni.update(ws)
        for i in range(len(ws) - 1):
            bi[(ws[i], ws[i + 1])] += 1
            tb += 1
    tu = sum(uni.values())
    rows = []
    for (wa, wb), cxy in bi.items():
        if cxy < 5:
            continue
        p = cxy * tu * tu
        q = tb * uni[wa] * uni[wb]
        if p >= q:
            rows.append((wa, wb, cxy, (p // q).bit_length() - 1))
    rows.sort(key=lambda t: (-t[3], -t[2], t[0], t[1]))
    expect = rows[:100]
    got = [
        (r["wa"], r["wb"], r["cxy"], r["pmi_bits"])
        for r in REGISTRY["x_pmi_collocations"].fn(spark, sf_dir).collect()
    ]
    assert got == expect


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """The distributed trainer's full merge table (order, pairs, counts)
    equals a sequential Sennrich-style BPE over the same word-frequency
    dict, including the (max count, lexicographic pair) tie-break and
    the greedy left-to-right merge application."""
    from collections import Counter

    freqs: Counter = Counter()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        freqs.update(w for w in r["text"].split(" ") if w)

    words = {w: list(w) for w in freqs}
    expect = []
    for rank in range(12):
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
        expect.append((rank, a, b, a + b, n))
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
    got = [
        (r["rank"], r["a"], r["b"], r["merged"], r["pair_count"])
        for r in REGISTRY["x_bpe_train"].fn(spark, sf_dir).collect()
    ]
    assert got == expect


def test_embedding_quantize_codes_and_recall(spark, sf_dir):
    """Codes equal the pure-Python affine quantizer, live in [0,255],
    and int8-reconstructed cosine top-10 keeps >= 80% recall vs exact
    float top-10 — the accuracy contract that justifies the 4x
    compression."""
    import numpy as np

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    vecs = np.stack([emb[k] for k in sorted(emb)])
    ids = sorted(emb)
    lo, hi = vecs.min(axis=0), vecs.max(axis=0)
    span = np.where(hi == lo, 1.0, hi - lo)
    expect_codes = np.floor((vecs - lo) * 255.0 / span).astype(int)
    expect_codes[:, hi == lo] = 0

    out = REGISTRY["x_embedding_quantize"].fn(spark, sf_dir).collect()
    assert len(out) == vecs.size
    got = {}
    for r in out:
        assert 0 <= r["code"] <= 255
        got[(r["vec_id"], r["dim"])] = r["code"]
    for i, vid in enumerate(ids):
        for d in range(vecs.shape[1]):
            assert got[(vid, d + 1)] == expect_codes[i, d], (vid, d)

    # recall bracket: reconstruct midpoints and compare cosine top-10
    recon = (expect_codes + 0.5) * span / 255.0 + lo

    def topk(m, q, k=10):
        sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q) + 1e-12)
        return set(np.argsort(-sims)[:k])

    hits = total = 0
    for qi in range(0, len(ids), 50):
        exact = topk(vecs, vecs[qi])
        approx = topk(recon, recon[qi])
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.8, hits / total


def test_bpe_apply_matches_python_encode(spark, sf_dir):
    """x_bpe_apply's token-frequency table equals a sequential
    train-then-encode in pure Python: train 12 merges (same tie-break
    as the trainer test), greedily apply them in rank order to every
    word, weight token counts by word frequency, take the same
    (n desc, token) top-30."""
    from collections import Counter

    freqs: Counter = Counter()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        freqs.update(w for w in r["text"].split(" ") if w)

    words = {w: list(w) for w in freqs}
    for rank in range(12):
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
    tok: Counter = Counter()
    for w, syms in words.items():
        for s in syms:
            tok[s] += freqs[w]
    expect = sorted(tok.items(), key=lambda kv: (-kv[1], kv[0]))[:30]

    got = [
        (r["token"], r["n"])
        for r in REGISTRY["x_bpe_apply"].fn(spark, sf_dir).collect()
    ]
    assert got == expect


def test_embedding_pq_shortlist_rerank_recall(spark, sf_dir):
    """The PQ two-stage contract: (a) output shape — exactly topk rows
    per query, ranked by EXACT distance with vec_id tie-break, and the
    exact distance matches numpy on the same pair; (b) accuracy — ADC
    shortlist + exact re-rank keeps >= 70% of the true float top-10."""
    import numpy as np

    out = REGISTRY["x_embedding_pq"].fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(emb)
    vecs = np.stack([emb[k] for k in ids])
    idx = {v: i for i, v in enumerate(ids)}

    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    hits = total = 0
    for qid, rows in by_q.items():
        assert len(rows) == 10
        rows.sort(key=lambda r: r["rn"])
        # ranked by exact dist then vec_id; dist matches numpy
        for a, b in zip(rows, rows[1:]):
            assert (a["dist"], a["vec_id"]) <= (b["dist"], b["vec_id"])
        for r in rows:
            want = round(float(((emb[qid] - emb[r["vec_id"]]) ** 2).sum()), 4)
            assert abs(r["dist"] - want) < 1e-6, (qid, r["vec_id"])
        d = ((vecs - vecs[idx[qid]]) ** 2).sum(axis=1)
        d[idx[qid]] = np.inf
        exact = set(np.array(ids)[np.argsort(d)[:10]].tolist())
        approx = {r["vec_id"] for r in rows}
        hits += len(exact & approx)
        total += len(exact)
    assert total and hits / total >= 0.7, hits / total


def _md5_bucket(s: str, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_stratified_split_exact_quotas(spark, sf_dir):
    """Every stratum honors the integer cut exactly: train gets
    floor(0.8n), val floor(0.9n)-floor(0.8n), test the rest, and the
    rank ranges are contiguous 1..n — the property the two-level
    prefix-sum must reproduce bit-for-bit vs a single global window."""
    rows = REGISTRY["x_stratified_split"].fn(spark, sf_dir).collect()
    by_src: dict[str, dict[str, tuple]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["split"]] = (
            r["n_docs"], r["rank_lo"], r["rank_hi"]
        )
    docs = load_table(spark, sf_dir, "documents").groupBy("source").count().collect()
    n_by_src = {r["source"]: r["count"] for r in docs}
    assert set(by_src) == set(n_by_src)
    for src, splits in by_src.items():
        n = n_by_src[src]
        want_train = (8 * n) // 10
        want_val = (9 * n) // 10 - want_train
        want_test = n - want_train - want_val
        got = {s: splits[s][0] if s in splits else 0 for s in ("train", "val", "test")}
        assert got == {"train": want_train, "val": want_val, "test": want_test}, src
        # contiguous, ordered rank ranges covering 1..n
        if want_train:
            assert splits["train"][1] == 1 and splits["train"][2] == want_train
        if want_val:
            assert splits["val"][1] == want_train + 1
            assert splits["val"][2] == want_train + want_val
        if want_test:
            assert splits["test"][1] == want_train + want_val + 1
            assert splits["test"][2] == n


def test_dsir_scores_match_python_model(spark, sf_dir):
    """Recompute the DSIR quantized scores with a sequential Python
    model (md5 bucketing, add-one smoothing, the <<20 bit trick) and
    check every returned doc's score and the top-k ordering."""
    docs = [
        (r["doc_id"], r["lang"], r["text"])
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _, lang, text in docs:
        for w in text.split(" "):
            b = _md5_bucket(w, 4096)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    wgt = {
        b: (((tgt.get(b, 0) + 1) << 20) // (raw[b] + 1)).bit_length() - 1
        for b in raw
    }
    model = []
    for doc_id, lang, text in docs:
        if lang == "en":
            continue
        ws = text.split(" ")
        bits = sum(wgt[_md5_bucket(w, 4096)] for w in ws)
        model.append((-(bits * 1000000 // len(ws)), doc_id, lang, len(ws), bits))
    model.sort()
    out = REGISTRY["x_dsir_resample"].fn(spark, sf_dir).collect()
    assert len(out) == min(100, len(model))
    for r, m in zip(out, model):
        assert (r["doc_id"], r["lang"], r["n_grams"], r["score_bits"], r["score_npm"]) == (
            m[1], m[2], m[3], m[4], -m[0]
        )
    assert all(r["lang"] != "en" for r in out)


def test_hll_union_brackets_exact(spark, sf_dir):
    """The unioned daily sketches estimate within the pinned 5% of the
    exact distinct count for every event type, and the exact/day counts
    match a direct recompute."""
    out = {r["event_type"]: r for r in REGISTRY["x_hll_sketch_union"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["days"], r["users"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct(F.to_date("ts")).alias("days"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for et, r in out.items():
        assert r["est_within_5pct"] is True, et
        assert (r["n_days"], r["n_exact"]) == exact[et], et


def test_skyline_is_pareto_frontier(spark, sf_dir):
    """Brute-force dominance check: every returned part is undominated,
    every omitted part is dominated by some returned part (the frontier
    property — sufficiency AND completeness)."""
    parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    sky = {r["p_partkey"] for r in REGISTRY["x_skyline"].fn(spark, sf_dir).collect()}

    def dominates(a, b):
        return a[1] <= b[1] and a[2] >= b[2] and (a[1] < b[1] or a[2] > b[2])

    for p in parts:
        dominated = any(dominates(q, p) for q in parts)
        assert (p[0] in sky) == (not dominated), p


def test_markov_rows_normalize(spark, sf_dir):
    """Per from_type, transition counts sum to the lag-pair total and
    ppm values sum to ~1e6 (floor-division undershoot < n_to_types)."""
    rows = REGISTRY["x_markov_transitions"].fn(spark, sf_dir).collect()
    by_from: dict[str, list] = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users  # one lag NULL per user
    for ft, grp in by_from.items():
        tot_ppm = sum(r["p_ppm"] for r in grp)
        assert 1000000 - len(grp) < tot_ppm <= 1000000, ft
        for r in grp:
            assert r["p_ppm"] == r["n"] * 1000000 // sum(g["n"] for g in grp)


def test_anomaly_zscore_matches_exact_rational_model(spark, sf_dir):
    """Independent derivation (review finding: the first version of
    this test re-implemented the production integer rewrite, so a shared
    mis-derivation could not be caught): flag |x - mean| > 2*stddev
    straight from the definition in exact rational arithmetic —
    mean = S/n, var = SS/n - mean^2, outlier iff (x-mean)^2 > 4*var —
    with no multiply-through-by-n^2 anywhere."""
    import math
    from fractions import Fraction

    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(math.floor(r["value"] * 100))
    out = {r["event_type"]: r for r in REGISTRY["x_anomaly_zscore"].fn(spark, sf_dir).collect()}
    assert set(out) == set(by_type)
    for et, xs in by_type.items():
        n = len(xs)
        mean = Fraction(sum(xs), n)
        var = Fraction(sum(x * x for x in xs), n) - mean * mean
        n_out = sum(1 for x in xs if (Fraction(x) - mean) ** 2 > 4 * var)
        assert out[et]["n_events"] == n
        assert out[et]["n_outliers"] == n_out
        assert out[et]["share_ppm"] == n_out * 1000000 // n


def test_record_linkage_pairs_are_canonical_and_complete(spark, sf_dir):
    """Pairs are (a<b), within-nation, true edit distance <= 2; spot-
    check completeness against a brute-force pass over one nation."""
    rows = REGISTRY["x_record_linkage"].fn(spark, sf_dir).collect()
    assert all(r["a_key"] < r["b_key"] and 0 <= r["dist"] <= 2 for r in rows)
    cust = [
        (r["c_custkey"], r["c_nationkey"], r["c_name"])
        for r in load_table(spark, sf_dir, "customer").collect()
    ]

    def lev(a, b):
        if len(a) == len(b):  # synthetic names: same length, subs only
            return sum(1 for x, y in zip(a, b) if x != y) if a != b else 0
        return 99

    nat0 = [c for c in cust if c[1] == cust[0][1]]
    want = {
        (a[0], b[0])
        for a in nat0
        for b in nat0
        if a[0] < b[0] and lev(a[2], b[2]) <= 2
    }
    got = {(r["a_key"], r["b_key"]) for r in rows if r["nationkey"] == cust[0][1]}
    assert got == want


def test_hll_intersect_brackets_exact(spark, sf_dir):
    """Inclusion-exclusion estimates stay within the pinned 5%-of-union
    bracket for every segment, and the exact branch matches a direct
    recompute."""
    out = {r["event_type"]: r for r in REGISTRY["x_hll_intersect"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    users: dict[str, set] = {}
    for r in ev:
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    p = users.pop("purchase")
    assert set(out) == set(users)
    for et, s in users.items():
        assert out[et]["n_overlap"] == len(s & p), et
        assert out[et]["n_union"] == len(s | p), et
        assert out[et]["est_within_5pct_of_union"] is True, et


def test_inverted_index_reconstructs_documents(spark, sf_dir):
    """The index is lossless: placing every term at its 1-based
    positions rebuilds each document's token sequence exactly, and tf
    equals the posting length."""
    rows = REGISTRY["x_inverted_index"].fn(spark, sf_dir).collect()
    rebuilt: dict[int, dict[int, str]] = {}
    for r in rows:
        poss = [int(p) for p in r["positions"].split("|")]
        assert r["tf"] == len(poss)
        assert poss == sorted(poss)
        for p in poss:
            assert p not in rebuilt.setdefault(r["doc_id"], {}), "position collision"
            rebuilt[r["doc_id"]][p] = r["term"]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert set(rebuilt) == {d["doc_id"] for d in docs}
    for d in docs:
        toks = d["text"].split(" ")
        got = rebuilt[d["doc_id"]]
        assert [got[i + 1] for i in range(len(toks))] == toks, d["doc_id"]


def test_event_pattern_match_vs_python_re(spark, sf_dir):
    """Recompute every user's sequence string and match count with
    Python re (same leftmost non-overlapping semantics) and compare
    the full result set."""
    import re as _re

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["event_type"][0]))
    model = {}
    for uid, items in seqs.items():
        s = "".join(c for _, _, c in sorted(items, key=lambda t: (t[0], t[1])))
        n = len(_re.findall("v[ce]*p", s))
        if n:
            model[uid] = (len(s), n)
    out = {
        r["user_id"]: (r["seq_len"], r["n_matches"])
        for r in REGISTRY["x_event_pattern_match"].fn(spark, sf_dir).collect()
    }
    assert out == model


def test_last_click_attribution_vs_python(spark, sf_dir):
    """Sequential per-user replay: every purchase's lag to the most
    recent prior click matches, including NULL (no prior click) and
    the 7-day flag."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    byu: dict[int, list] = {}
    for r in ev:
        byu.setdefault(r["user_id"], []).append(r)
    model = {}
    for uid, items in byu.items():
        last_click = None
        for r in sorted(items, key=lambda t: (t["ts"], t["event_id"])):
            if r["event_type"] == "purchase":
                if last_click is None:
                    lag = None
                else:
                    td = r["ts"] - last_click
                    lag = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
                model[r["event_id"]] = (
                    uid, lag, lag is not None and lag <= 604800000000
                )
            if r["event_type"] == "click":
                last_click = r["ts"]
    out = {
        r["purchase_id"]: (r["user_id"], r["lag_us"], r["attributed_7d"])
        for r in REGISTRY["x_last_click_attribution"].fn(spark, sf_dir).collect()
    }
    assert out == model


def test_pandas_grouped_agg_median_vs_python(spark, sf_dir):
    """Exact lower median per group vs a sequential model."""
    import math

    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by: dict[str, list] = {}
    for r in ev:
        by.setdefault(r["event_type"], []).append(math.floor(r["value"] * 100))
    out = {r["event_type"]: r for r in REGISTRY["x_pandas_grouped_agg"].fn(spark, sf_dir).collect()}
    assert set(out) == set(by)
    for et, xs in by.items():
        xs.sort()
        assert out[et]["n"] == len(xs)
        assert out[et]["median_cents"] == xs[(len(xs) - 1) // 2]
