"""Round-15 contracts: the ANN read path, x_ann_overlay_search.

The op completes the vector-store lifecycle (gate = x_incremental_ann,
GC = x_ivf_compaction) with the serve side: cosine top-k through the
base+delta overlay. The DuckDB oracle pins the exhaustive default
equal to exact top-k over the surviving corpus; the contracts here
pin what the oracle can't see:

  * the fixture serves BOTH overlay sides (base cells and the gate's
    admitted flat buffer) and never a tombstoned or rejected vector;
  * probing the whole codebook (nprobe >= k) through the FINITE-probe
    machinery reproduces the exhaustive default exactly — the probe
    path changes which candidates are scanned, never how they score;
  * finite nprobe is sound (a served vector is always a surviving
    vector) with recall against the exhaustive ceiling that is
    monotone in nprobe;
  * the base read under finite nprobe keeps the literal probed-cell
    partition filter (the gate's plan-time pruning story, applied to
    serving).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from chyme_spark.ops import llm
from chyme_spark.registry import REGISTRY, load_all
from chyme_spark.session import load_table

load_all()


def _surviving_ids(spark, sf_dir) -> tuple[set[int], set[int], int]:
    """(surviving vec_ids, tombstoned vec_ids, split) per the overlay's
    fixture conventions, with admission replayed via the exhaustive
    gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    split = (emb.agg(F.max("vec_id")).first()[0] + 1) // 2
    disp = REGISTRY["x_incremental_ann"].fn(spark, sf_dir, nprobe=1024)
    admitted = {r.vec_id for r in disp.collect() if r.kept}
    hist = {r.vec_id for r in emb.select("vec_id").collect() if r.vec_id < split}
    tombs = {v for v in hist if v % 7 == llm._RETRACT_RESIDUE}
    return (hist - tombs) | admitted, tombs, split


def test_overlay_serves_both_sides_never_tombstoned_or_rejected(spark, sf_dir):
    surviving, tombs, split = _surviving_ids(spark, sf_dir)
    rows = REGISTRY["x_ann_overlay_search"].fn(spark, sf_dir).collect()
    assert len(rows) == 30  # 10 queries x top-3
    served = {r.vec_id for r in rows}
    assert served <= surviving, "a served vector must survive the overlay"
    assert not served & tombs, "tombstoned vectors must never be served"
    assert any(v < split for v in served), "base cells must be served"
    assert any(v >= split for v in served), "the delta buffer must be served"
    for r in rows:
        assert r.vec_id != r.qid, "self-pairs are excluded"


def test_overlay_full_probe_equals_exhaustive(spark, sf_dir):
    """nprobe >= k routes through the probe machinery (quantize, cell
    join, literal IN) but covers every cell — the result must be
    byte-identical to the exhaustive default, because probing affects
    WHICH candidates are scanned, never their scores."""
    exhaustive = {
        (r.qid, r.vec_id, r.cosine)
        for r in REGISTRY["x_ann_overlay_search"].fn(spark, sf_dir).collect()
    }
    full_probe = {
        (r.qid, r.vec_id, r.cosine)
        for r in REGISTRY["x_ann_overlay_search"]
        .fn(spark, sf_dir, nprobe=10_000)
        .collect()
    }
    assert full_probe == exhaustive


def test_overlay_finite_probe_sound_and_recall_monotone(spark, sf_dir):
    surviving, tombs, _ = _surviving_ids(spark, sf_dir)
    exact = {
        (r.qid, r.vec_id)
        for r in REGISTRY["x_ann_overlay_search"].fn(spark, sf_dir).collect()
    }
    recalls = []
    for np_ in (1, 4):
        rows = REGISTRY["x_ann_overlay_search"].fn(spark, sf_dir, nprobe=np_).collect()
        served = {r.vec_id for r in rows}
        assert served <= surviving and not served & tombs
        recalls.append(len(exact & {(r.qid, r.vec_id) for r in rows}) / len(exact))
    assert recalls[0] <= recalls[1], f"recall must be monotone in nprobe: {recalls}"
    assert recalls[1] >= 0.5, f"fixture recall floor at nprobe=4: {recalls}"


def test_overlay_base_scan_keeps_literal_cell_filter(spark, sf_dir):
    """Under finite nprobe the base cells scan must carry the
    probed-cell set as a PLAN-TIME partition filter (the
    test_round11_ops pin, applied to the serve path)."""
    df = REGISTRY["x_ann_overlay_search"].fn(spark, sf_dir, nprobe=2)
    df.count()
    from chyme_spark.ops.llm import _LEDGER_DIRS

    ann_keys = [k for k in _LEDGER_DIRS if k.startswith("ann_k") and k.endswith(sf_dir)]
    assert ann_keys, f"no ann ledger cached for {sf_dir}: {sorted(_LEDGER_DIRS)}"
    ledger_dir = _LEDGER_DIRS[ann_keys[0]]
    plan = df._jdf.queryExecution().executedPlan().toString()
    pruned = []
    for line in plan.splitlines():
        if ledger_dir not in line or "PartitionFilters:" not in line:
            continue
        filt_seg = line.split("PartitionFilters:", 1)[1]
        if "cell" in filt_seg.split("]", 1)[0]:
            pruned.append(line)
    assert pruned, (
        "overlay base scan lost its literal cell partition filter:\n"
        + "\n".join(line for line in plan.splitlines() if ledger_dir in line)[:2000]
    )
