"""Isolated 3-pass steady-state probe for a set of batch queries.

Usage: python tools/probe_queries.py [--sf DIR] [--passes N] name [name...]

Methodology matches bench.py: noop sink (full evaluation of every
output column), one warm pass (JIT + parquet footers), then N timed
passes per query with the per-query MEDIAN reported — the number a
round's OPTIMIZATION_r*.md quotes as a before/after. Run on an idle
host: the r14/r15 census-mover adjudications all traced inflated
readings to concurrent Spark JVMs.

Prints one JSON line: {"sf": ..., "passes": N, "queries": {name: median_sec}}
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
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from chyme_spark.registry import load_all
    from chyme_spark.session import get_spark

    registry = load_all()
    unknown = [n for n in args.names if n not in registry]
    if unknown:
        ap.error(f"not registered: {unknown}")
    spark = get_spark("probe_queries")

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = registry[name].fn(spark, args.sf)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in args.names:  # warm pass, untimed
        run(name)
    times: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.passes):
        for name in args.names:
            times[name].append(run(name))

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    print(json.dumps({
        "sf": args.sf,
        "passes": args.passes,
        "queries": {n: round(median(ts), 3) for n, ts in times.items()},
        "spread": {n: round(max(ts) - min(ts), 3) for n, ts in times.items()},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
