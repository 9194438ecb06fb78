"""Bench-battery membership guards (r9 review finding #3).

bench.py's ROTATION cohort and tools/bench_ledger.json's current-round
entry are two hand-maintained copies of the same list; and every probe
membership list filters with `in registry`, which silently drops a
renamed/deleted query. Both failure modes would quietly corrupt the
never/stalest-benched targeting the rotation policy depends on — fail
HERE instead.
"""

from __future__ import annotations

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location("bench", os.path.join(ROOT, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _ledger() -> dict:
    return json.load(open(os.path.join(ROOT, "tools", "bench_ledger.json")))


def test_rotation_matches_current_ledger_entry():
    led = _ledger()
    current = max(led["rotations"], key=int)
    assert led["rotations"][current] == bench.ROTATION, (
        "bench.py ROTATION and tools/bench_ledger.json rotations"
        f"[{current!r}] diverged — update BOTH in the same commit"
    )


def test_ledger_core13_is_a_headline_prefix_subset():
    led = _ledger()
    missing = [n for n in led["core_13"] if n not in bench.HEADLINE]
    assert not missing, f"core_13 members missing from HEADLINE: {missing}"


def test_every_battery_member_is_a_registered_query():
    from chyme_spark.registry import load_all

    registry = load_all()
    for list_name in ("HEADLINE", "ROTATION", "SF1_HEAVY", "SF2_SKEW", "CORE_SCALE"):
        members = getattr(bench, list_name)
        missing = [n for n in members if n not in registry]
        assert not missing, (
            f"bench.{list_name} names unregistered queries {missing} — "
            "the `in registry` filter would silently drop them from the "
            "battery while the ledger still claims they were benched"
        )


def test_core_scale_members_have_sf1_denominators():
    # the core-scaling block divides low-core sf1 medians by the sf1
    # probe's high-core medians — every member must be in SF1_HEAVY or
    # the ratio silently drops out
    missing = [n for n in bench.CORE_SCALE if n not in bench.SF1_HEAVY]
    assert not missing, f"CORE_SCALE members without sf1 denominators: {missing}"


def test_rotation_does_not_overlap_the_fixed_battery():
    overlap = set(bench.ROTATION) & set(bench.HEADLINE)
    assert not overlap, (
        f"rotation members already in HEADLINE: {sorted(overlap)} — "
        "a rotation slot spent on an always-benched query is wasted"
    )


def test_all_ledger_rotation_rounds_name_registered_queries():
    from chyme_spark.registry import load_all

    registry = load_all()
    for rnd, members in _ledger()["rotations"].items():
        missing = [n for n in members if n not in registry]
        assert not missing, f"ledger round {rnd} names unknown queries: {missing}"


def test_final_line_is_bounded_pure_json():
    """The driver parses bench.py's FINAL stdout line as JSON (r10
    VERDICT #2: parsed:null since r5 because the old last line carried
    a text prefix). Pin the contract: prefix-free, parseable, bounded
    well under any plausible captured-tail window, and carrying the
    per-query medians for every headline member."""
    steady = {n: 1.234 for n in bench.HEADLINE}
    summary = {
        "steady_total": 12.3, "cpu_calibration_sec": 0.15,
        "steady_total_calibrated": 82.0, "n_queries": len(bench.HEADLINE),
        "value": 25.0, "unit": "sec", "sf": 0.1,
        "sf1_ratio_max": 4.7, "sf1_flagged": [], "sf2_ratio_max": 8.1,
        "sf2_flagged": [], "rotation_n": len(bench.ROTATION),
        "rotation_total": 25.0,
    }
    line = bench.final_line(summary, steady)
    parsed = json.loads(line)  # prefix-free pure JSON
    assert not line.startswith("BENCH_SUMMARY")
    assert line.startswith('{"metric"')  # tail-scraper anchor, FIRST key
    assert parsed["metric"] == "headline_queries_total_wall_clock"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    # flagged-cliff NAME lists are reduced to counts (a bad round could
    # add ~500B of query names and blow the tail)
    assert parsed["sf1_flagged_n"] == 0 and "sf1_flagged" not in parsed
    # the driver's captured tail is 2000 BYTES (BENCH_r10.json "tail");
    # the final line must fit ENTIRELY inside it or its head is cut and
    # the parse dies. Real sf0.1 runs measure ~1390B; leave headroom.
    assert len(line) < 1900, f"final line {len(line)}B risks 2000B-tail truncation"
    # oversize fallback: a pathological summary drops the medians, never
    # the headline fields, and stays parseable under the budget
    huge = dict(summary)
    huge["sf2_flagged"] = [f"x_some_long_query_name_{i}" for i in range(40)]
    big_line = bench.final_line(huge, {f"q{i}_{'x'*40}": 1.0 for i in range(60)})
    big = json.loads(big_line)
    assert len(big_line) < 1900
    assert "queries_dropped" in big and big["steady_total"] == 12.3
