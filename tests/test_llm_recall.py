"""Recall contracts for the ANN scale paths (x_ann_lsh_topk, x_ann_ivf_topk).

The sf0.001 embeddings are near-random 64-dim vectors: true top-1
neighbors sit at cosine ~0.5 where no sublinear structure exists, so a
fixed-recall assertion at the default knobs would pin luck, not the
algorithm. What IS testable is the knob contract itself:

  * at the exhaustive end of each knob (nprobe=k cells probed, 0
    hyperplanes = 1 bucket) the ANN path must degrade to the exact
    brute-force result, row for row and cosine for cosine;
  * recall of the brute-force top-1 is monotone in nprobe (probing a
    superset of cells can never evict the globally-best neighbor).

Together these prove the approximation is *only* in the candidate
pruning the knobs control — precisely the property that lets a 100 TB
run trade recall for scan cost by turning them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chyme_spark.registry import load_all

REGISTRY = load_all()


def _rows(df):
    return {(r.qid, r.vec_id, r.cosine) for r in df.collect()}


def _top1(brute_rows):
    best: dict[int, tuple[float, int]] = {}
    for qid, vec_id, cosine in brute_rows:
        cur = best.get(qid)
        cand = (-cosine, vec_id)
        if cur is None or cand < cur:
            best[qid] = cand
    return {qid: vec_id for qid, (_neg, vec_id) in best.items()}


def test_ivf_exhaustive_probe_equals_brute_force(spark, sf_dir):
    from chyme_spark.ops import llm

    brute = _rows(llm.d44_cosine_topk(spark, sf_dir))
    ivf = _rows(llm.x_ann_ivf_topk(spark, sf_dir, k=4, nprobe=4))
    assert ivf == brute


def test_lsh_single_bucket_equals_brute_force(spark, sf_dir):
    from chyme_spark.ops import llm

    brute = _rows(llm.d44_cosine_topk(spark, sf_dir))
    lsh = _rows(llm.x_ann_lsh_topk(spark, sf_dir, n_planes=0))
    assert lsh == brute


def test_lsh_top1_recall_monotone_in_multiprobe(spark, sf_dir):
    from chyme_spark.ops import llm

    top1 = _top1(_rows(llm.d44_cosine_topk(spark, sf_dir)))

    def recall(multiprobe: int) -> int:
        got: dict[int, set[int]] = {}
        for qid, vec_id, _ in _rows(
            llm.x_ann_lsh_topk(spark, sf_dir, n_planes=6, multiprobe=multiprobe)
        ):
            got.setdefault(qid, set()).add(vec_id)
        return sum(1 for q, v in top1.items() if v in got.get(q, set()))

    # Hamming-1 probing scans a strict superset of candidates, and the
    # global best neighbor can never be evicted by extra candidates
    assert recall(0) <= recall(1)


def test_ivf_top1_recall_monotone_in_nprobe(spark, sf_dir):
    from chyme_spark.ops import llm

    top1 = _top1(_rows(llm.d44_cosine_topk(spark, sf_dir)))

    def recall(nprobe: int) -> int:
        got: dict[int, set[int]] = {}
        for qid, vec_id, _ in _rows(llm.x_ann_ivf_topk(spark, sf_dir, k=8, nprobe=nprobe)):
            got.setdefault(qid, set()).add(vec_id)
        return sum(1 for q, v in top1.items() if v in got.get(q, set()))

    r2, r4, r8 = recall(2), recall(4), recall(8)
    assert r2 <= r4 <= r8
    assert r8 == len(top1)  # nprobe == k is exhaustive


SF001 = "/root/testdata/sf0.01"


def test_ann_recall_brackets_vs_exact_twins_sf001(spark):
    """Recorded-constant recall brackets (VERDICT r7 #6): every piece of
    the ANN stack is deterministic (hyperplanes from xxhash64 parity,
    KMeans seed=42, no RNG anywhere), so its recall against the exact
    twin at a fixed scale is a CONSTANT, not a distribution. These are
    the measured sf0.01 values (2026-08-14, this commit's
    implementations); any implementation change that silently degrades
    candidate generation now fails loudly instead of hiding behind a
    loose luck-tolerant bracket.

    Measured constants at sf0.01 (exact twin: d44_cosine_topk,
    top-3 = 30 pairs over 10 queries):
      * IVF  k=16 nprobe=2 (defaults): top3-overlap  9/30, top1 5/10
      * IVF  k=16 nprobe=4:            top3-overlap 14/30, top1 7/10
      * LSH  planes=4 multiprobe=1:    top3-overlap 13/30, top1 4/10
    Near-random 64-dim vectors are ANN's worst case (neighbors at
    cosine ~0.5 carry no cluster structure), so absolute recall is low
    by construction — the bracket pins the implementation, not the
    data's friendliness.
    """
    from chyme_spark.ops import llm

    brute = _rows(llm.d44_cosine_topk(spark, SF001))
    pairs = {(q, v) for q, v, _ in brute}
    top1 = _top1(brute)
    assert len(pairs) == 30 and len(top1) == 10

    def overlap(df):
        got = {(r.qid, r.vec_id) for r in df.collect()}
        by_q: dict[int, set[int]] = {}
        for q, v in got:
            by_q.setdefault(q, set()).add(v)
        t1 = sum(1 for q, v in top1.items() if v in by_q.get(q, set()))
        return len(got & pairs), t1

    o3, o1 = overlap(llm.x_ann_ivf_topk(spark, SF001))  # k=16, nprobe=2
    assert o3 >= 9 and o1 >= 5, (o3, o1)
    o3, o1 = overlap(llm.x_ann_ivf_topk(spark, SF001, k=16, nprobe=4))
    assert o3 >= 14 and o1 >= 7, (o3, o1)
    o3, o1 = overlap(llm.x_ann_lsh_topk(spark, SF001, n_planes=4, multiprobe=1))
    assert o3 >= 13 and o1 >= 4, (o3, o1)


def test_simhash_recall_bracket_vs_exact_jaccard_sf001(spark):
    """x_simhash_neardup vs its exact twin x_ngram_jaccard at sf0.01:
    deterministic measured constants (2026-08-14) — the Hamming<=3
    SimHash recovers 15 of the 25 exact-Jaccard near-dup pairs and
    emits 17 candidate pairs total. Pins both recall (>=15) and
    precision discipline (bounded emission: a regression that floods
    candidates would trip the ceiling)."""
    from chyme_spark.ops import llm

    sim = {(r.doc_a, r.doc_b) for r in llm.x_simhash_neardup(spark, SF001).collect()}
    jac = {(r.doc_a, r.doc_b) for r in llm.x_ngram_jaccard(spark, SF001).collect()}
    assert len(jac) == 25
    assert len(sim & jac) >= 15, len(sim & jac)
    assert len(sim) <= 25, len(sim)  # bounded emission, not a candidate flood


def test_semdedup_contract(spark, sf_dir):
    """x_semdedup: (1) pruning is monotone in tau; (2) at a tau that
    actually prunes, every pruned vec has a SENIOR (lower vec_id) in the
    same cluster with cosine >= tau, and every kept pair in a cluster
    with both ids kept is either below tau or ordered senior-first —
    i.e. the keep-min-id rule, verified exactly with numpy."""
    import numpy as np

    from chyme_spark.ops.llm import x_semdedup

    tau = 0.4
    surv = x_semdedup(spark, sf_dir, tau=tau)
    kept = {r.vec_id: r.cluster for r in surv.collect()}
    loose = x_semdedup(spark, sf_dir, tau=0.97).count()
    assert len(kept) <= loose  # monotone: higher tau prunes less

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    assert len(kept) < len(vecs)  # tau=0.4 actually prunes on this fixture

    # reconstruct cluster membership from the survivor output is not
    # possible for pruned ids, so recompute: group all vecs by the
    # cluster of their nearest kept doc is wrong — instead verify the
    # rule pairwise inside each kept cluster and for pruned ids via the
    # full assignment returned at tau ~ 1 (nothing pruned => full map).
    full = {r.vec_id: r.cluster for r in x_semdedup(spark, sf_dir, tau=1.01).collect()}
    assert set(full) == set(vecs)
    pruned = set(vecs) - set(kept)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    by_cluster: dict[int, list[int]] = {}
    for vid, c in full.items():
        by_cluster.setdefault(c, []).append(vid)
    for vid in pruned:
        peers = [p for p in by_cluster[full[vid]] if p < vid]
        assert any(cos(vecs[vid], vecs[p]) >= tau for p in peers), vid
    # no kept doc should have a kept senior above tau in its cluster
    for c, members in by_cluster.items():
        kept_members = sorted(m for m in members if m in kept)
        for i, hi in enumerate(kept_members):
            for lo in kept_members[:i]:
                assert cos(vecs[hi], vecs[lo]) < tau, (lo, hi)


def test_semdedup_sampled_fit(spark, sf_dir):
    """The KMeans fit must run on a bounded sample: with max_fit_rows
    below the corpus size the op still returns a full assignment (every
    vec_id clustered at tau>1 => nothing pruned) and the keep-min-id
    contract holds at a pruning tau. Proves the assign-only full-corpus
    path works when the fit never saw most rows."""
    from chyme_spark.ops.llm import x_semdedup

    full = x_semdedup(spark, sf_dir, tau=1.01, max_fit_rows=100)
    n_all = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert full.count() == n_all  # assign covers rows the fit never saw
    surv = x_semdedup(spark, sf_dir, tau=0.4, max_fit_rows=100)
    assert 0 < surv.count() < n_all


def test_bloom_prod_no_false_negatives_and_prunes(spark):
    """Bloom contract over a corpus WITH real duplicates (the synthetic
    documents table has none across the even/odd split at small sf):
    every true duplicate must come back bloom_maybe=true (no false
    negatives — the property that makes the prefilter sound), and the
    mostly-unique probe set must be pruned near the designed FPP, not
    pass wholesale."""
    from chyme_spark.ops.llm import bloom_build, bloom_probe

    hist_texts = [f"historical document body number {i}" for i in range(300)]
    dup_texts = hist_texts[::10]  # 30 true duplicates
    new_texts = [f"freshly crawled text {i}" for i in range(170)]
    hist = spark.createDataFrame([(t,) for t in hist_texts], "text string")
    probes = spark.createDataFrame(
        [(i, t) for i, t in enumerate(dup_texts + new_texts)], "pid long, text string"
    )
    words = bloom_build(hist, "text")
    out = {r["pid"]: r["bloom_maybe"] for r in bloom_probe(probes, "pid", "text", words).collect()}
    # no false negatives: every true duplicate is a maybe
    assert all(out[i] for i in range(len(dup_texts)))
    # pruning: the 170 genuinely-new probes mostly miss (FPP target 1%;
    # allow generous slack for a 300-item fill of a 4096-item filter)
    false_pos = sum(out[i] for i in range(len(dup_texts), len(dup_texts) + len(new_texts)))
    assert false_pos <= 5, f"{false_pos} false positives out of 170"


def test_duplicate_ngram_hashed_key_matches_exact_strings(spark, sf_dir):
    """x_duplicate_ngram_fraction shuffles xxhash64(gram) instead of the
    gram string (severalfold smaller exchange). This pins hashed ==
    exact-string results on the oracle-checked data, i.e. zero 64-bit
    collisions here — the DuckDB oracle uses exact grams, so any
    collision would surface as a driver hash-mismatch."""
    from chyme_spark.ops.llm import doc_ngrams, x_duplicate_ngram_fraction

    hashed = {tuple(r) for r in x_duplicate_ngram_fraction(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = doc_ngrams(spark, sf_dir, n=5)  # exact strings
    shared = grams.groupBy("g").agg(F.count("*").alias("nd")).filter(F.col("nd") >= 2)
    per_doc = (
        grams.join(shared.select("g").withColumn("is_shared", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.count("is_shared").alias("n_shared"))
    )
    exact = {
        tuple(r)
        for r in docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared") * 1.0 / F.col("n_grams"), F.lit(0.0)), 4
            ).cast("double").alias("dup_frac"),
        )
        .collect()
    }
    assert hashed == exact


def test_lsh_hot_bucket_cap_bounds_pairs_and_keeps_connectivity(spark):
    """Adversarial degenerate-bucket fixture (VERDICT r6 #4): 600
    byte-identical documents share every band bucket, so the uncapped
    all-pairs form would emit 600*599/2 = 179,700 pairs from ONE task.
    The cap must (a) bound output to the linear star form, (b) keep all
    members in one connected component (the downstream dedup contract),
    and (c) leave sub-cap buckets byte-identical to the all-pairs form."""
    from chyme_spark.ops.llm import lsh_candidates

    n_hot = 600
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        # identical shingle sets => identical minhash signatures
        F.expr("transform(sequence(1, 8), i -> cast(i * 1000 as bigint))").alias("hs"),
    ).withColumn("n", F.size("hs"))

    capped = lsh_candidates(hot).collect()
    # linear, not quadratic: every band yields the same 599 star pairs
    assert len(capped) == n_hot - 1
    # connectivity: the hub is the deterministic min doc_id, every other
    # member is directly attached => one component of size 600
    assert {r.doc_a for r in capped} == {0}
    assert {r.doc_b for r in capped} == set(range(1, n_hot))

    # sub-cap buckets keep the exact all-pairs behavior: capped and
    # effectively-uncapped runs agree pair-for-pair
    small = hot.filter(F.col("doc_id") < 10)
    got = {(r.doc_a, r.doc_b) for r in lsh_candidates(small).collect()}
    want = {(a, b) for a in range(10) for b in range(10) if a < b}
    assert got == want


def test_incremental_neardup_soundness_and_recall(spark, sf_dir):
    """x_incremental_neardup contract (r10): (a) SOUNDNESS — every
    rejected batch doc's (doc_id, dup_of, jaccard) matches the exact
    offline Jaccard of that pair and clears tau, with dup_of < doc_id
    (earlier-doc-wins); (b) RECALL — every batch doc that offline d43
    (full-corpus LSH + verify) pairs with a lower id is also rejected
    here: the incremental hist-ledger join is an uncapped superset of
    d43's bucketed pairing, and the in-batch path reuses
    lsh_candidates, so at sub-cap bucket sizes nothing can be lost."""
    from chyme_spark.ops.llm import _JACCARD_TAU, doc_shingle_sets

    disp = REGISTRY["x_incremental_neardup"].fn(spark, sf_dir).collect()
    assert {r.doc_id for r in disp} == {
        r.doc_id
        for r in doc_shingle_sets(spark, sf_dir).filter(F.col("doc_id") >= 250).collect()
    }
    sets = {
        r.doc_id: set(r.hs) for r in doc_shingle_sets(spark, sf_dir).collect()
    }

    def exact_j(a, b):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        return inter / union if union else None

    rejected = {}
    for r in disp:
        if r.kept:
            assert r.dup_of is None and r.jaccard is None
            continue
        assert r.dup_of < r.doc_id
        j = exact_j(r.doc_id, r.dup_of)
        assert j is not None and j >= _JACCARD_TAU
        assert abs(round(j, 4) - r.jaccard) < 1e-9
        rejected[r.doc_id] = r.dup_of

    d43 = REGISTRY["d43_minhash_lsh"].fn(spark, sf_dir).collect()
    expected = {r.doc_b for r in d43 if r.doc_b >= 250}
    assert expected <= set(rejected), (
        "offline d43 found a lower-id near-dup the incremental gate missed: "
        f"{sorted(expected - set(rejected))[:10]}"
    )


def test_incremental_ann_soundness_recall_monotone(spark, sf_dir):
    """x_incremental_ann contract (r11): (a) SOUNDNESS — every rejected
    batch vector's (vec_id, dup_of, cosine) matches the exact offline
    cosine of that pair (round-4), clears tau, with dup_of < vec_id
    (earlier-doc-wins), and every kept row carries nulls; (b) RECALL —
    the gate catches >= 60% of the batch vectors that the EXACT pair
    join (x_embedding_neardup, tau=0.45) pairs with a lower id
    (measured 4/6 at sf0.001, 10/14 at sf0.01, 65/96 at sf0.1 with the
    default k=16/nprobe=4 — IVF probing is approximate BY DESIGN and
    the docstring says so); (c) MONOTONICITY — probing more cells can
    only reject more (candidate sets nest in nprobe)."""
    import math

    disp = REGISTRY["x_incremental_ann"].fn(spark, sf_dir).collect()
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    split = (max(emb) + 1) // 2  # the op's proportional hist/batch split
    assert {r.vec_id for r in disp} == {v for v in emb if v >= split}

    def exact_cos(a, b):
        va, vb = emb[a], emb[b]
        dot = sum(float(x) * float(y) for x, y in zip(va, vb))
        na = math.sqrt(sum(float(x) * float(x) for x in va))
        nb = math.sqrt(sum(float(x) * float(x) for x in vb))
        return dot / (na * nb)

    rejected = {}
    for r in disp:
        if r.kept:
            assert r.dup_of is None and r.cosine is None
            continue
        assert r.dup_of < r.vec_id
        c = exact_cos(r.vec_id, r.dup_of)
        assert c >= 0.45
        # HALF_UP like the op (Python round is half-to-even)
        assert abs(math.floor(c * 1e4 + 0.5) / 1e4 - r.cosine) < 1e-9
        rejected[r.vec_id] = r.dup_of

    # recall vs the exact offline pair join on the union
    exact_pairs = REGISTRY["x_embedding_neardup"].fn(spark, sf_dir).collect()
    expected = {r.vec_b for r in exact_pairs if r.vec_b >= split}
    assert expected, "fixture must contain at least one qualifying pair"
    recall = len(expected & set(rejected)) / len(expected)
    assert recall >= 0.6, (
        f"recall {recall:.3f} below the measured fixture floor; "
        f"missed={sorted(expected - set(rejected))[:10]}"
    )
    # the gate must never reject a vector the exact join wouldn't
    # (soundness already proves pairwise cosine >= tau, this closes the
    # set-level statement)
    assert set(rejected) <= expected

    # monotone in nprobe: fewer probes never reject MORE
    narrow = {
        r.vec_id
        for r in REGISTRY["x_incremental_ann"].fn(spark, sf_dir, nprobe=1).collect()
        if not r.kept
    }
    assert narrow <= set(rejected)


def test_incremental_ann_exhaustive_probe_degrades_to_exact(spark, sf_dir):
    """The same exhaustive-end contract the LSH/IVF top-k paths pin:
    with nprobe=k (every cell probed) the approximation disappears —
    a batch vector meets every history vector AND every earlier batch
    vector (each rests in some probed primary cell), so the gate's
    rejected set must EQUAL the exact pair join's lower-id-pairing on
    the union, vector for vector. Proves the approximation lives only
    in the probe pruning nprobe controls."""
    disp = REGISTRY["x_incremental_ann"].fn(spark, sf_dir, k=16, nprobe=16).collect()
    rejected = {r.vec_id for r in disp if not r.kept}
    emb_ids = [
        r.vec_id
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id").collect()
    ]
    split = (max(emb_ids) + 1) // 2
    exact_pairs = REGISTRY["x_embedding_neardup"].fn(spark, sf_dir).collect()
    expected = {r.vec_b for r in exact_pairs if r.vec_b >= split}
    assert rejected == expected
    # earlier-doc-wins MINIMALITY: with every cell probed, dup_of must be
    # the SMALLEST qualifying lower-id partner, not just any of them —
    # this pins the min-reduction the verify kernel performs in-task
    # (soundness alone only proves dup_of < vec_id and cosine >= tau)
    exp_min: dict[int, int] = {}
    for r in exact_pairs:
        if r.vec_b >= split:
            exp_min[r.vec_b] = min(exp_min.get(r.vec_b, r.vec_a), r.vec_a)
    for r in disp:
        if not r.kept:
            assert r.dup_of == exp_min[r.vec_id], (
                f"vec {r.vec_id}: dup_of={r.dup_of} but the smallest "
                f"qualifying earlier partner is {exp_min[r.vec_id]}"
            )
