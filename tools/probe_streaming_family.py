"""3-pass noop-sink medians for the streaming family at a given SF.

The streaming ops drain to a memory sink inside fn(); the noop write of
the returned batch DF evaluates every output column (census
methodology). Usage:

    python tools/probe_streaming_family.py [--sf /root/testdata/sf0.1] [--passes 3] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = [
    "d40_stream_watermark",
    "d41_stream_dedup",
    "x_stream_static_join",
    "x_stream_stream_join",
    "x_stream_outer_join",
    "x_stream_stateful_counts",
    "x_stream_session_timeout",
    "x_stream_tws_counts",
    "x_stream_tws_sessions",
    "x_stream_upsert",
    "x_datasource_stream_write",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from chyme_spark.registry import load_all
    from chyme_spark.session import get_spark

    registry = load_all()
    spark = get_spark("probe_streaming")
    names = args.names or FAMILY

    def run(name: str) -> float:
        t0 = time.time()
        df = registry[name].fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        warm = run(name)  # warm pass (footers, codegen)
        ts = sorted(run(name) for _ in range(args.passes))
        out[name] = {
            "warm_pass": round(warm, 3),
            "median": round(ts[len(ts) // 2], 3),
            "all": [round(t, 3) for t in ts],
        }
        print(f"{name}: median {out[name]['median']} s  {out[name]['all']}", flush=True)
    print(json.dumps({"sf": args.sf, "passes": args.passes, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
