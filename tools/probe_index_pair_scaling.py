"""Round-15 scale probe: the text-index lifecycle pair.

The pair's 100 TB claims are (a) the gate's work is bounded by the
DELIVERY's postings (one keyed shuffle over the gated batch; the
history segment contributes one narrow doc_id column to the
anti-join), and (b) the compactor is one postings-grain shuffle whose
manifest reduction is segment-grain (tiny). Neither has an iterative
or quadratic term, so both should scale LINEARLY in postings volume.

This probe measures 3-pass wall medians at sf0.1 (5,000 docs) and at
10x / 20x scaled corpora (ensure_scaled replicas: 50k / 100k docs)
and reports time ratios vs the postings-volume ratios. Note the
fixture constants make the gate's batch ~the whole corpus here
(history is the fixed 250-doc prefix), so the probe exercises the
WORST batch shape — throughput linearity in delivered postings; a
production delivery is a small fraction and costs proportionally
less, which is the point of the gate.

Usage:
    python tools/probe_index_pair_scaling.py [--out tools/probe_index_pair_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default="tools/probe_index_pair_r15.json")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from chyme_spark.registry import REGISTRY, load_all
    from chyme_spark.scaleup import ensure_scaled
    from chyme_spark.session import get_spark, load_table

    load_all()
    spark = get_spark("probe_index_pair")

    tiers = [("1x", args.sf)]
    for factor, dest in ((10, "/tmp/chyme_sf1"), (20, "/tmp/chyme_sf2")):
        tiers.append((f"{factor}x", ensure_scaled(spark, args.sf, dest, factor=factor)))

    result: dict = {"sf": args.sf, "passes": args.passes, "tiers": {}}
    for label, sf_dir in tiers:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        n_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
        tier: dict = {"n_docs": n_docs, "n_tokens": int(n_tokens), "ops": {}}
        for name in ("x_incremental_index", "x_index_compaction"):
            walls = []
            rows = REGISTRY[name].fn(spark, sf_dir).count()
            for _ in range(args.passes):
                t0 = time.monotonic()
                # noop sink, not count(): count() lets Catalyst prune the
                # aggregate expressions (collect_list never runs) — the
                # same sink-only understatement the r15 label-update
                # probe review caught. bench.py's convention.
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(round(time.monotonic() - t0, 3))
            tier["ops"][name] = {
                "rows": rows,
                "walls": walls,
                "median": statistics.median(walls),
            }
            print(f"{label} {name}: rows={rows} walls={walls}", flush=True)
        result["tiers"][label] = tier

    t1 = result["tiers"]["1x"]
    for label in ("10x", "20x"):
        t = result["tiers"][label]
        t["token_ratio"] = round(t["n_tokens"] / t1["n_tokens"], 2)
        for name, rec in t["ops"].items():
            rec["time_ratio_vs_1x"] = round(
                rec["median"] / t1["ops"][name]["median"], 2
            )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
