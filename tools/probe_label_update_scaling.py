"""VERDICT r14 #4: x_cluster_label_update batch-size scaling probe.

The op's 100 TB claim is O(batch + touched components) — measured in
r14 at ONE batch shape (the >=250 doc-id split). This probe sweeps the
batch FRACTION of the pair list (1% / 10% / 50%) at 20x scale and
records, per point:

  * quotient-graph size (contracted distinct pairs — the CC input),
  * wall time of the ledger update (history labels pre-built, NOT
    timed: in production they are yesterday's table),
  * vs the from-scratch CC over the full pair list (what the op
    replaces).

The claim passes if update wall time tracks the batch fraction (and
the quotient size), staying well under from-scratch at every point.

Batch split: by doc-id boundary (batch = every pair whose greater
endpoint is above the 1-frac quantile of doc_b) — the production
shape: a batch of NEWLY INGESTED docs arrives with its gate-admitted
pairs. A random EDGE split was tried first and is degenerate: the 20x
corpus is replica cliques, so dropping even half the edges leaves
every component connected and the quotient graph EMPTY (update 0.1 s
flat — intra-component edge churn is free by construction, worth
knowing but not the claim under test).

Usage:
    python tools/probe_label_update_scaling.py [--out tools/probe_label_update_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--dir", default="/tmp/chyme_sf2")
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--out", default="tools/probe_label_update_r15.json")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from chyme_spark.ops import llm
    from chyme_spark.scaleup import ensure_scaled
    from chyme_spark.session import get_spark

    spark = get_spark("probe_label_update")
    sf2 = ensure_scaled(spark, args.sf, args.dir, factor=args.factor)
    base = llm._ensure_cluster_base(spark, sf2)
    pairs = spark.read.parquet(f"{base}/pairs").select("doc_a", "doc_b")
    n_pairs = pairs.count()
    print(f"pairs at {args.factor}x: {n_pairs}", flush=True)

    def noop(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # from-scratch comparator: one cold CC over the full pair list
    t0 = time.time()
    lab = llm._min_label_cc(pairs)
    scratch_sec = time.time() - t0 + noop(lab)
    if lab.is_cached:
        lab.unpersist()
    print(f"from-scratch CC: {scratch_sec:.1f}s", flush=True)

    points = []
    for frac in (0.01, 0.10, 0.50):
        # batch = pairs whose greater endpoint sits in the top `frac`
        # of the pair-weighted doc_b distribution (the newest docs)
        cut = int(pairs.approxQuantile("doc_b", [1.0 - frac], 0.001)[0])
        hist_dir = f"/tmp/probe15_hist_{cut}"
        batch_dir = f"/tmp/probe15_batch_{cut}"
        pairs.filter(F.col("doc_b") < cut).write.mode("overwrite").parquet(
            f"{hist_dir}_pairs"
        )
        hist_pairs = spark.read.parquet(f"{hist_dir}_pairs")
        hl = llm._min_label_cc(hist_pairs)
        hl.select(
            F.col("doc").alias("doc_id"), F.col("label").alias("cluster_id")
        ).write.mode("overwrite").parquet(hist_dir)
        if hl.is_cached:
            hl.unpersist()
        pairs.filter(F.col("doc_b") >= cut).write.mode("overwrite").parquet(batch_dir)
        old = spark.read.parquet(hist_dir)
        batch = spark.read.parquet(batch_dir)
        n_batch = batch.count()

        # quotient size: the contraction _apply_label_updates hands to CC
        ma = old.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("na"))
        mb = old.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("nb"))
        q = (
            batch.join(ma, "doc_a", "left")
            .join(mb, "doc_b", "left")
            .select(
                F.least(F.coalesce("na", "doc_a"), F.coalesce("nb", "doc_b")).alias("u"),
                F.greatest(F.coalesce("na", "doc_a"), F.coalesce("nb", "doc_b")).alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        n_quot = q.count()

        def one() -> float:
            # time CONSTRUCTION + sink together: _apply_label_updates
            # runs the quotient CC eagerly (per-round count() actions)
            # at construction, so a sink-only timer would exclude the
            # very batch-dependent cost under test (r15 self-review) —
            # symmetric with the from-scratch comparator above
            t0 = time.time()
            out = llm._apply_label_updates(old, batch)
            out.write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            # drop the update's quotient-CC persist between passes
            for rdd_id, rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().items()  # noqa: SLF001
            ):
                rdd.unpersist()
            return sec

        one()  # warm
        times = sorted(one() for _ in range(2))
        sec = times[0]
        points.append(
            {
                "batch_frac": frac,
                "batch_pairs": n_batch,
                "quotient_pairs": n_quot,
                "update_sec": round(sec, 2),
                "vs_scratch": round(sec / scratch_sec, 4),
            }
        )
        print(f"frac={frac}: batch={n_batch} quotient={n_quot} "
              f"update={sec:.2f}s ({sec / scratch_sec:.3f}x scratch)", flush=True)

    out = {
        "factor": args.factor,
        "n_pairs": n_pairs,
        "from_scratch_sec": round(scratch_sec, 2),
        "cc_rounds_log": list(llm._CC_ROUNDS_LOG),
        "points": points,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
