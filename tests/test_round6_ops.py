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
