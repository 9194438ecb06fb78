"""Calibration-normalized comparison of two bench JSON files.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [--threshold 1.3]

Accepts either a raw ``bench.py`` output line or a driver
``BENCH_r{N}.json`` wrapper (uses its ``parsed`` object, or scrapes the
last JSON object out of ``tail`` when ``parsed`` is null). Per-query
times are divided by each file's ``cpu_calibration_sec`` before
comparing, so host drift cancels (VERDICT r6 #6); queries present in
only one file are listed, not compared. Exit code 1 when any common
query's calibrated ratio exceeds the threshold — usable as a regression
gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "queries_steady" not in d:
        if d.get("parsed"):
            d = d["parsed"]
        else:
            tail = d.get("tail", "")
            # rfind: BOTH the full dump and the compact final line start
            # with {"metric" — when a short run's full dump fits in the
            # tail, find() would grab it and choke on the trailing
            # summary/final lines; the LAST occurrence is the compact
            # final line, always self-contained
            start = tail.rfind('{"metric"')
            if start < 0:
                raise SystemExit(
                    f"{path}: no parsable bench object (keys: {sorted(d)})"
                )
            d = json.loads(tail[start:])
    # bench.py's compact FINAL line (r11) carries the medians under
    # "queries" only — normalize so both the full dump and the tail
    # line compare identically
    if "queries_steady" not in d and "queries" in d:
        d["queries_steady"] = d["queries"]
    if "queries_steady" not in d:
        # bench.py's oversize fallback drops the medians from the final
        # line ("queries_dropped") — headline fields survive, but a
        # per-query compare is impossible; say so instead of KeyError
        raise SystemExit(
            f"{path}: bench object has no per-query medians "
            f"({d.get('queries_dropped', 'keys: ' + str(sorted(d)))}) — "
            "use the run's full-dump JSON instead of the tail line"
        )
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    c_old = old.get("cpu_calibration_sec")
    c_new = new.get("cpu_calibration_sec")
    if not c_old or not c_new:
        print(
            "WARNING: calibration missing "
            f"(old={c_old}, new={c_new}) — comparing RAW seconds", file=sys.stderr
        )
        c_old = c_new = 1.0
    s_old, s_new = old["queries_steady"], new["queries_steady"]
    common = sorted(set(s_old) & set(s_new))
    rows = sorted(
        ((s_new[n] / c_new) / (s_old[n] / c_old), n, s_old[n], s_new[n])
        for n in common
        if s_old[n] > 0
    )
    print(f"calibration: old={c_old} new={c_new}  common queries: {len(common)}")
    print(f"{'ratio':>6}  {'query':35s} {'old_s':>8} {'new_s':>8}")
    for r, n, a, b in rows:
        flag = "  <-- regression" if r > args.threshold else ""
        print(f"{r:6.2f}  {n:35s} {a:8.3f} {b:8.3f}{flag}")
    only_old = sorted(set(s_old) - set(s_new))
    only_new = sorted(set(s_new) - set(s_old))
    if only_old:
        print("only in old:", ", ".join(only_old))
    if only_new:
        print("only in new:", ", ".join(only_new))
    med = sorted(r for r, *_ in rows)[len(rows) // 2] if rows else 1.0
    tot = sum(s_new[n] / c_new for n in common) / max(
        sum(s_old[n] / c_old for n in common), 1e-9
    )
    print(f"median calibrated ratio: {med:.3f}   total calibrated ratio: {tot:.3f}")
    bad = [n for r, n, *_ in rows if r > args.threshold]
    if bad:
        print(f"REGRESSIONS (> {args.threshold}x calibrated): {bad}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
