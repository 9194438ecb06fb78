"""Registry-order regression: the grading driver checks exactly the FIRST
50 entries of ``load_all()`` per round, so the window must be deliberate.

Round-1 cost: 22 core operators silently missed a round of verification
because x-ops registered ahead of them.  This test pins the round-3
window — two red-row fixes first, then every never-checked query, then
green backfill — so a registration-order change can't silently push a
query out of the checked set again.
"""

from __future__ import annotations

import json
import os
import re

from chyme_spark.registry import _FRONT_50, load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_front_window_is_exactly_front_50():
    names = list(load_all())
    assert len(names) >= 50
    assert names[:50] == _FRONT_50
    assert len(_FRONT_50) == len(set(_FRONT_50)) == 50


def test_front_window_covers_all_unchecked_and_red_rows():
    """Every registered query that lacks a green CORRECTNESS row across
    recorded rounds must sit inside the checked window."""
    names = set(load_all())
    green: set[str] = set()
    checked: set[str] = set()
    for path in sorted(os.listdir(REPO)):
        if not re.fullmatch(r"CORRECTNESS_r\d+\.json", path):
            continue
        rows = json.load(open(os.path.join(REPO, path)))
        checked |= set(rows)
        for name, row in rows.items():
            ok = (row.get("hash_match") is True) or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
            )
            if ok:
                green.add(name)
            else:
                green.discard(name)  # a later red row demotes
    unproven = (names - green) & names
    missing = sorted(unproven - set(_FRONT_50))
    assert not missing, f"unproven queries outside the checked window: {missing}"


def test_changed_or_new_queries_enter_window():
    """Window-coverage guard (VERDICT r6 #8): any query whose fn/oracle
    source hash differs from tools/oracle_ledger.json — or that has no
    ledger row at all (new op, or marked CHANGED) — must sit inside the
    first-50 checked window this round.  This makes the round-6 class of
    risk (an implementation rewritten after its last driver-green, then
    slot-yielded out of the window) structurally impossible."""
    from chyme_spark.registry import source_hash

    ledger = json.load(open(os.path.join(REPO, "tools", "oracle_ledger.json")))
    reg = load_all()
    window = set(list(reg)[:50])
    offenders = []
    for name, q in reg.items():
        rec = ledger.get(name)
        if rec is None or rec["hash"] != source_hash(q):
            if name not in window:
                offenders.append(name)
    assert not offenders, (
        f"queries changed since last driver-green (or new/unledgered) sit outside "
        f"the checked window — rotate them into _FRONT_50 or refresh the ledger "
        f"(tools/update_ledger.py): {sorted(offenders)}"
    )


def test_ledger_covers_registry():
    """Every ledger row must point at a registered query (no orphans), and
    sentinel rows must be inside the window (they are by definition
    changed-since-green)."""
    from chyme_spark.registry import source_hash  # noqa: F401

    ledger = json.load(open(os.path.join(REPO, "tools", "oracle_ledger.json")))
    reg = load_all()
    orphans = sorted(set(ledger) - set(reg))
    assert not orphans, f"ledger rows for unregistered queries: {orphans}"
    window = set(list(reg)[:50])
    stray = [n for n, r in ledger.items() if r["hash"] == "CHANGED-SINCE-LAST-GREEN" and n not in window]
    assert not stray, f"sentinel (changed) queries outside the window: {stray}"


def test_all_d_ids_register():
    names = list(load_all())
    d_ids = [n for n in names if re.match(r"^d\d\d_", n)]
    assert len(d_ids) == 50


def test_update_ledger_green_history_semantics(tmp_path, monkeypatch):
    """last_green_rounds() on a synthetic CORRECTNESS history: a later
    RED row demotes an earlier green (the query must re-prove), a
    rows-only pass (err == no_oracle, rows > 0) counts as green, and
    the recorded round is the LATEST green — the value the refresher
    compares against the stamped round to decide whether a new green
    arrived (re-stamp) or not (keep prior hash/sentinel)."""
    import importlib.util
    import json as js

    spec = importlib.util.spec_from_file_location(
        "update_ledger", os.path.join(REPO, "tools", "update_ledger.py")
    )
    ul = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ul)

    (tmp_path / "CORRECTNESS_r01.json").write_text(js.dumps({
        "q1": {"hash_match": True, "spark_rows": 5},
        "q2": {"hash_match": True, "spark_rows": 5},
        "q3": {"hash_match": None, "spark_rows": 7, "err": "no_oracle"},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(js.dumps({
        "q1": {"hash_match": True, "spark_rows": 5},
        "q2": {"hash_match": False, "spark_rows": 5, "err": "hash"},
    }))
    monkeypatch.setattr(ul, "REPO", str(tmp_path))
    assert ul.last_green_rounds() == {"q1": 2, "q3": 1}

    (tmp_path / "CORRECTNESS_r03.json").write_text(js.dumps({
        "q2": {"hash_match": True, "spark_rows": 5},
    }))
    assert ul.last_green_rounds() == {"q1": 2, "q2": 3, "q3": 1}
