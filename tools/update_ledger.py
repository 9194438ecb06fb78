"""Refresh tools/oracle_ledger.json — the per-query source-hash ledger
behind the window-coverage guard (tests/test_registry.py).

Run this at ROUND START, before editing any operator: at that moment the
working tree is byte-identical to the snapshot the driver last checked,
so recording the *current* source hash for every query with a green
CORRECTNESS row is sound.  During the round, any edit to a query fn or
its oracle flips the hash, and the guard test forces that query into
``_FRONT_50`` until a later driver round re-proves it.

Usage:
    python tools/update_ledger.py                 # refresh greens
    python tools/update_ledger.py --mark-changed a,b,c
        # force-sentinel queries whose code changed since their last
        # driver-green (e.g. edits to shared helpers the hash can't see,
        # or changes made before the ledger existed)

A query is "driver-green in round N" when its CORRECTNESS_rN row has
hash_match true, or (rows-only ops) err == no_oracle with rows > 0.
A later red row demotes.  Queries green at some round keep that round
number; --mark-changed replaces the hash with a sentinel that can never
match, so the guard fires until the next green refresh.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEDGER = os.path.join(REPO, "tools", "oracle_ledger.json")
SENTINEL = "CHANGED-SINCE-LAST-GREEN"


def last_green_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rows = json.load(open(os.path.join(REPO, path)))
        for name, row in rows.items():
            ok = (row.get("hash_match") is True) or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
            )
            if ok:
                out[name] = rnd
            else:
                out.pop(name, None)  # later red demotes
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mark-changed", default="", help="comma-separated query names to sentinel")
    ap.add_argument(
        "--refresh",
        default="",
        help="comma-separated query names whose hash should be re-stamped to the "
        "CURRENT source without a new driver green — ONLY for comment/docstring-"
        "only edits that cannot change results; say so in the commit message",
    )
    args = ap.parse_args()
    changed = {n for n in args.mark_changed.split(",") if n}
    refresh = {n for n in args.refresh.split(",") if n}

    from chyme_spark.registry import load_all, source_hash

    reg = load_all()
    unknown = changed - set(reg)
    if unknown:
        raise SystemExit(f"--mark-changed names not in registry: {sorted(unknown)}")

    old = json.load(open(LEDGER)) if os.path.exists(LEDGER) else {}
    greens = last_green_rounds()
    ledger: dict[str, dict] = {}
    for name, q in reg.items():
        cur = source_hash(q)
        if name in changed:
            rec = {"hash": SENTINEL, "round": greens.get(name, 0)}
        elif name in refresh:
            rec = {"hash": cur, "round": old.get(name, {}).get("round", greens.get(name, 0))}
        elif name in greens:
            prior = old.get(name)
            # re-stamp the hash ONLY on a NEW green (a CORRECTNESS round
            # later than the stamped one): mid-round re-runs must not
            # quietly bless edits the driver never saw
            if prior is None or greens[name] > prior.get("round", -1):
                rec = {"hash": cur, "round": greens[name]}
            else:
                rec = prior  # no new green since last stamp (incl. sentinel)
        elif name in old:
            rec = old[name]  # keep whatever we knew (likely sentinel/new)
        else:
            continue  # never green, not previously tracked: guard treats as new
        ledger[name] = rec

    with open(LEDGER, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    n_sent = sum(1 for r in ledger.values() if r["hash"] == SENTINEL)
    print(f"ledger: {len(ledger)} entries ({n_sent} sentinel), registry {len(reg)}")


if __name__ == "__main__":
    main()
