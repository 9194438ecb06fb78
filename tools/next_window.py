"""Propose the next round's ``_FRONT_50`` from the oracle ledger.

The window policy (chyme_spark/registry.py) is mechanical:

  (a) never-driver-checked queries first (no ledger row),
  (b) queries whose current source hash differs from their last
      driver-green stamp (the guard test forces these in anyway),
  (c) backfill oldest-stamp-first with hash-proven greens; rows-only
      ops (oracle is None) are excluded from backfill — their driver
      row is only rows>0, the weakest re-proof, and their contracts
      live in pytest.

Applying it by hand each round invites exactly the displacement
arithmetic mistakes the round-9 verdict called out. This tool computes
the list; a human still pastes it (the registry comment block explains
WHY each cohort is there, which no generator can write).

Usage:
    python tools/next_window.py            # print the proposed 50
    python tools/next_window.py --check    # exit 1 if the CURRENT
                                           # _FRONT_50 misses any (a)/(b)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def propose() -> tuple[list[str], dict[str, list[str]]]:
    from chyme_spark.registry import REGISTRY, load_all, source_hash

    load_all()
    ledger_path = os.path.join(ROOT, "tools", "oracle_ledger.json")
    try:
        with open(ledger_path) as fh:
            ledger = json.load(fh)
    except FileNotFoundError:
        raise SystemExit(
            f"missing {ledger_path} — run `python tools/update_ledger.py` "
            "after a driver round to create/refresh it"
        )

    new: list[str] = []
    changed: list[str] = []
    backfill_pool: list[tuple[int, str]] = []
    for name, q in sorted(REGISTRY.items()):
        rec = ledger.get(name)
        if rec is None:
            new.append(name)
        elif rec["hash"] != source_hash(q):
            changed.append(name)
        elif q.oracle is not None:  # rows-only never backfills
            backfill_pool.append((rec["round"], name))
    backfill_pool.sort()  # oldest stamp first, then name
    room = max(0, 50 - len(new) - len(changed))
    backfill = [n for _, n in backfill_pool[:room]]
    displaced = [n for _, n in backfill_pool[room:]]
    if len(new) + len(changed) > 50:
        # The guard test REQUIRES every new/changed query in _FRONT_50;
        # a window that can't hold them all is a policy violation, not
        # something to silently slice.
        raise SystemExit(
            f"forced members overflow the window: {len(new)} new + "
            f"{len(changed)} changed > 50 — split the round or revert "
            "churn before rotating"
        )
    window = new + changed + backfill
    return window, {
        "new": new,
        "changed": changed,
        "backfill": backfill,
        "displaced_oldest_20": displaced[:20],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    window, parts = propose()

    if args.check:
        from chyme_spark.registry import _FRONT_50

        must = set(parts["new"]) | set(parts["changed"])
        missing = sorted(must - set(_FRONT_50))
        if missing:
            print(f"FRONT_50 misses forced members: {missing}")
            raise SystemExit(1)
        print(f"FRONT_50 covers all {len(must)} forced (new/changed) members")
        return

    print(f"# proposed window: {len(parts['new'])} new, "
          f"{len(parts['changed'])} changed, {len(parts['backfill'])} backfill")
    for section in ("new", "changed", "backfill"):
        print(f"# --- {section} ---")
        for n in parts[section]:
            print(f'    "{n}",')
    if parts["displaced_oldest_20"]:
        print("# oldest still-displaced (head of the round after):")
        print("#   " + ", ".join(parts["displaced_oldest_20"]))


if __name__ == "__main__":
    main()
