"""Round-11 op contracts: x_incremental_ann plan/layout guarantees.

The recall/soundness/monotonicity contracts live in
tests/test_llm_recall.py::test_incremental_ann_soundness_recall_monotone;
this file pins the SCALE claims the docstring makes — the persisted
ledger's hive layout and the literal partition-filter pushdown that
makes a small daily batch read only its probed cells' files.
"""

from __future__ import annotations

import os

from chyme_spark.registry import load_all

REGISTRY = load_all()


def test_incremental_ann_ledger_layout_and_pruned_scan(spark, sf_dir):
    df = REGISTRY["x_incremental_ann"].fn(spark, sf_dir)
    df.count()  # force the ledger build

    # (a) the persisted ledger is hive-partitioned BY CELL — the layout
    # partition pruning needs at 100 TB
    from chyme_spark.ops.llm import _LEDGER_DIRS

    ann_keys = [k for k in _LEDGER_DIRS if k.startswith("ann_k") and k.endswith(sf_dir)]
    assert ann_keys, f"no ann ledger cached for {sf_dir}: {sorted(_LEDGER_DIRS)}"
    ledger_dir = _LEDGER_DIRS[ann_keys[0]]
    cell_dirs = [d for d in os.listdir(f"{ledger_dir}/cells") if d.startswith("cell=")]
    assert len(cell_dirs) >= 2, f"expected hive cell= partitions, got {cell_dirs[:5]}"

    # (b) the probe pushes the probed-cell set as a PLAN-TIME partition
    # filter onto the LEDGER scan specifically (no DPP reliance — the
    # docstring's pruning claim must be visible in PartitionFilters of
    # the scan that reads the persisted cells layout)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pruned = []
    for line in plan.splitlines():
        if ledger_dir not in line or "PartitionFilters:" not in line:
            continue
        filt_seg = line.split("PartitionFilters:", 1)[1]
        # the filter segment ends at the next bracketed field; the cell
        # IN (...) literal must be inside it
        if "cell" in filt_seg.split("]", 1)[0]:
            pruned.append(line)
    assert pruned, (
        "ledger cells scan lost its literal cell partition filter:\n"
        + "\n".join(
            line for line in plan.splitlines() if ledger_dir in line
        )[:2000]
    )

    # (c) pruning is semantics-free: a narrow probe (nprobe=1) rejects a
    # subset and never invents a rejection the full verify wouldn't
    full = {r.vec_id: r.dup_of for r in df.collect() if not r.kept}
    narrow = {
        r.vec_id
        for r in REGISTRY["x_incremental_ann"].fn(spark, sf_dir, nprobe=1).collect()
        if not r.kept
    }
    assert narrow <= set(full)


def test_cached_ledger_dir_failed_build_is_retried():
    """A ledger build that dies midway must NOT poison the session
    (round-11 review): freshness is an on-disk sentinel written by
    _mark_ledger_built, not dict membership, so the next call sees
    fresh=True again and rebuilds into the SAME dir."""
    from chyme_spark.ops.llm import _cached_ledger_dir, _mark_ledger_built

    d1, fresh1 = _cached_ledger_dir("unit_sentinel", "/tmp/sfX")
    assert fresh1
    # simulate a crashed build: caller never marked it built
    d2, fresh2 = _cached_ledger_dir("unit_sentinel", "/tmp/sfX")
    assert d2 == d1 and fresh2, "partial build must be retried, same dir"
    _mark_ledger_built(d1)
    d3, fresh3 = _cached_ledger_dir("unit_sentinel", "/tmp/sfX")
    assert d3 == d1 and not fresh3, "completed build must be reused"
