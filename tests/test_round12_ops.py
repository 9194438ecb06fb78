"""Round-12 op contracts: the IVF compaction loop + the flood-hardened
verify kernel.

x_ivf_compaction (VERDICT r11 #2) closes x_incremental_ann's
codebook-drift loop; its contracts here are (a) CONSERVATION — the
rebuilt layout holds exactly the original vectors, no loss, no dup;
(b) EXHAUSTIVE-REPLAY EQUIVALENCE — with every cell probed, a replayed
batch gets the identical disposition against the compacted ledger as
against the original (geometry moves which cells are probed, never the
exact-cosine verdicts); (c) RECALL NON-DEGRADING — at the default
nprobe the corpus-trained codebook catches at least as many of the
exact pairs as the stale hist-trained one (measured on the fixture).

The verify-kernel flood test pins the ADVICE-r11 hardening: residents
are gemm-chunked too (4096 columns), with a running per-probe
(min dup_of, cosine) carried across resident chunks — a synthetic
duplicate flood forces one cell to hold > 4096 residents so the
cross-chunk merge is actually exercised (the fixture SFs never cross
the boundary).
"""

from __future__ import annotations

import os

from chyme_spark.ops.llm import _adaptive_k, compact_ann_ledger, x_incremental_ann
from chyme_spark.registry import load_all

REGISTRY = load_all()


def test_verify_kernel_flood_crosses_resident_chunks(spark, tmp_path):
    """5000 identical unit vectors: every one lands in cell 0 (stable
    argsort tie-break), so the verify cogroup sees ~5000 residents —
    two 4096-column chunks — and every batch vector's smallest
    qualifying partner (vec 0) sits in the FIRST chunk while later
    chunks keep matching at cosine 1.0: a broken cross-chunk merge
    (overwrite instead of min) would report a larger dup_of."""
    n = 5000
    d = str(tmp_path / "flood")
    spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    disp = x_incremental_ann(spark, d).collect()
    assert len(disp) == n // 2  # the proportional split's batch half
    for r in disp:
        assert not r.kept
        assert r.dup_of == 0, f"vec {r.vec_id}: dup_of={r.dup_of}, want 0"
        assert r.cosine == 1.0


def test_ivf_compaction_conservation_and_layout(spark, sf_dir):
    report = REGISTRY["x_ivf_compaction"].fn(spark, sf_dir).collect()
    cdir = compact_ann_ledger(spark, sf_dir)  # session-cached: same dir

    # hive layout by cell, same shape the ingest gate prunes on — and
    # CLUSTERED: the pre-write repartition("cell") puts each cell in
    # exactly one task, so a cell dir holds ONE data file (without it
    # every write task holds rows of ~every cell and the layout
    # shatters into up to tasks x k2 small files; r12 review)
    cell_dirs = [p for p in os.listdir(f"{cdir}/cells") if p.startswith("cell=")]
    assert len(cell_dirs) >= 2
    for cd in cell_dirs:
        parts = [
            f
            for f in os.listdir(f"{cdir}/cells/{cd}")
            if f.endswith(".parquet") and not f.startswith(".")
        ]
        assert len(parts) == 1, f"{cd}: {len(parts)} files — layout not clustered"

    # conservation: compacted cells hold exactly history + admitted
    # batch, each exactly once (re-layout is pure re-partitioning)
    disp = x_incremental_ann(spark, sf_dir).collect()
    emb_ids = [
        r.vec_id
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id")
        .collect()
    ]
    split = (max(emb_ids) + 1) // 2
    expected = {v for v in emb_ids if v < split} | {
        r.vec_id for r in disp if r.kept
    }
    got = [
        r.vec_id for r in spark.read.parquet(f"{cdir}/cells").select("vec_id").collect()
    ]
    assert len(got) == len(set(got)), "duplicate vectors in compacted layout"
    assert set(got) == expected

    # the report covers every codebook cell (k2 = the SHARED adaptive
    # clamp over the corpus) and its occupancies sum to the corpus
    k2 = _adaptive_k(len(expected))
    assert len(report) == k2
    assert sum(r.n_vecs for r in report) == len(expected)
    assert all(r.n_hist + r.n_admitted == r.n_vecs for r in report)


def test_incremental_ann_rejects_k_with_ledger_dir(spark, sf_dir):
    """A provided ledger IS the geometry: asking for k=64 alongside it
    cannot be honored and must raise instead of silently using the
    dir's own k (r12 review)."""
    import pytest

    cdir = compact_ann_ledger(spark, sf_dir)
    with pytest.raises(ValueError, match="not both"):
        x_incremental_ann(spark, sf_dir, k=64, ledger_dir=cdir)


def test_ivf_compaction_exhaustive_replay_equivalence(spark, sf_dir):
    """With every cell probed the approximation disappears on BOTH
    geometries: a batch vector meets every history vector and every
    earlier batch vector (ledger residents + the in-batch primary-cell
    path), so the candidate sets coincide and the exact-cosine verify
    must produce the identical disposition row for row — including
    dup_of minimality and the reported cosine.

    ULP caveat (r12 advice): the gate thresholds the RAW float64
    cosine (cos >= tau before any rounding), and BLAS results can
    drift ~1 ULP between gemm chunk shapes — the two geometries here
    have different resident chunk boundaries. Bit-exact disposition
    equality is therefore only sound when no fixture pair's cosine
    sits within that drift of tau; the guard below asserts a 1e-9
    moat (vs ~2e-16 of 1-ULP drift), so a fixture regeneration that
    lands a pair near the boundary fails HERE with a clear message
    instead of flaking the equality assert below."""
    import numpy as np

    emb = np.array(
        [
            r.embedding
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    nrm = np.linalg.norm(emb, axis=1)
    cos = (emb @ emb.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(emb), k=1)
    moat = np.abs(cos[iu] - 0.45).min()
    assert moat > 1e-9, (
        f"fixture pair cosine within {moat:.2e} of tau=0.45 — regenerate "
        "fixtures away from the threshold or the bit-exact geometry "
        "equivalence below can flake on 1-ULP BLAS drift"
    )

    orig = sorted(
        (r.vec_id, r.kept, r.dup_of, r.cosine)
        for r in x_incremental_ann(spark, sf_dir, k=16, nprobe=16).collect()
    )
    cdir = compact_ann_ledger(spark, sf_dir)
    replay = sorted(
        (r.vec_id, r.kept, r.dup_of, r.cosine)
        for r in x_incremental_ann(
            spark, sf_dir, nprobe=10**6, ledger_dir=cdir
        ).collect()
    )
    assert replay == orig


def test_ivf_compaction_recall_non_degrading(spark, sf_dir):
    """At the default nprobe, the compacted (corpus-trained) codebook
    must catch at least as many of the exact pair join's lower-id
    pairings as the stale hist-trained one — retraining on the data
    actually resting in the ledger is the entire point of compaction.
    (Measured at sf0.001: both geometries catch 4/6; the assertion is
    >=, not equality, because the two KMeans runs are independent.)"""
    exact = REGISTRY["x_embedding_neardup"].fn(spark, sf_dir).collect()
    emb_ids = [
        r.vec_id
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id")
        .collect()
    ]
    split = (max(emb_ids) + 1) // 2
    expected = {r.vec_b for r in exact if r.vec_b >= split}

    orig_rej = {
        r.vec_id for r in x_incremental_ann(spark, sf_dir).collect() if not r.kept
    }
    cdir = compact_ann_ledger(spark, sf_dir)
    replay = x_incremental_ann(spark, sf_dir, ledger_dir=cdir).collect()
    replay_rej = {r.vec_id for r in replay if not r.kept}

    assert len(replay_rej & expected) >= len(orig_rej & expected)

    # soundness of the replay: every rejection is a genuine earlier
    # partner at tau (the gate's contract must survive a geometry swap)
    import math

    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    for r in replay:
        if r.kept:
            assert r.dup_of is None and r.cosine is None
            continue
        assert r.dup_of < r.vec_id
        va, vb = emb[r.vec_id], emb[r.dup_of]
        dot = sum(float(x) * float(y) for x, y in zip(va, vb))
        c = dot / (
            math.sqrt(sum(float(x) * float(x) for x in va))
            * math.sqrt(sum(float(x) * float(x) for x in vb))
        )
        assert c >= 0.45
        assert abs(math.floor(c * 1e4 + 0.5) / 1e4 - r.cosine) < 1e-9
