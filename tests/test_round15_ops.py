"""Round-15 contracts: cluster-label RETRACTION (VERDICT r14 #1).

``x_cluster_label_retract`` completes the near-dup label lifecycle:
the quotient-graph update (x_cluster_label_update) can only MERGE, so
tombstoning an articulation doc — which must SPLIT its component —
needs this separate localized re-CC pass. The DuckDB double-CTE
oracle pins the fixture equal to from-scratch clustering of the
surviving pairs; the synthetic cases here exercise the split
topologies the fixture can't guarantee (articulation removal,
whole-cluster removal, edge-starved isolation, no-op retraction) plus
the LOCALITY claim itself (untouched components never re-enter the CC
loop — pinned by sentinel labels a corpus-wide re-CC would have
corrected), and a union-find property pin over random graphs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chyme_spark.ops import llm
from chyme_spark.registry import REGISTRY, load_all

load_all()


def test_retract_fixture_equals_from_scratch_on_survivors(spark, sf_dir):
    """Survivor rows of the retraction == from-scratch min-label CC of
    the surviving pair list; retracted/isolated rows carry NULL."""
    base = llm._ensure_cluster_base(spark, sf_dir)
    pairs = spark.read.parquet(f"{base}/pairs").select("doc_a", "doc_b")
    surv = pairs.filter((F.col("doc_a") % 7 != 3) & (F.col("doc_b") % 7 != 3))
    scratch = {(r["doc"], r["label"]) for r in llm._min_label_cc(surv).collect()}
    out = REGISTRY["x_cluster_label_retract"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in out
        if r["status"] in ("unchanged", "relabeled")
    }
    assert got == scratch
    for r in out:
        if r["status"] in ("retracted", "isolated"):
            assert r["cluster_id"] is None


def _retract(spark, old_rows, pair_rows, tomb_ids):
    old = spark.createDataFrame(old_rows, "doc_id long, cluster_id long")
    pairs = spark.createDataFrame(pair_rows, "doc_a long, doc_b long")
    tomb = spark.createDataFrame([(t,) for t in tomb_ids], "doc_id long")
    return {
        r["doc_id"]: (r["cluster_id"], r["status"])
        for r in llm._retract_labels(old, pairs, tomb).collect()
    }


def test_retract_articulation_split(spark):
    """Removing the middle of a path 1-2-3-4-5 SPLITS the component:
    {1,2} keeps label 1, {4,5} gets the new local min 4 — exactly what
    the merge-only quotient update cannot express."""
    got = _retract(
        spark,
        [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)],
        [(1, 2), (2, 3), (3, 4), (4, 5)],
        [3],
    )
    assert got == {
        1: (1, "unchanged"),
        2: (1, "unchanged"),
        3: (None, "retracted"),
        4: (4, "relabeled"),
        5: (4, "relabeled"),
    }


def test_retract_whole_cluster_and_min_doc(spark):
    """Tombstoning an entire cluster retracts every member; tombstoning
    a cluster's MIN doc relabels the survivors to the next min; an
    untouched cluster passes through verbatim."""
    got = _retract(
        spark,
        [(1, 1), (2, 1), (5, 5), (6, 5), (7, 5), (8, 8), (9, 8)],
        [(1, 2), (5, 6), (6, 7), (8, 9)],
        [1, 2, 5],
    )
    assert got == {
        1: (None, "retracted"),
        2: (None, "retracted"),
        5: (None, "retracted"),
        6: (6, "relabeled"),
        7: (6, "relabeled"),
        8: (8, "unchanged"),
        9: (8, "unchanged"),
    }


def test_retract_isolates_edge_starved_survivor(spark):
    """A survivor whose only near-dup partner is tombstoned leaves the
    pair ledger: status 'isolated', NULL label — not a singleton row
    masquerading as a cluster."""
    got = _retract(spark, [(1, 1), (2, 1)], [(1, 2)], [2])
    assert got == {1: (None, "isolated"), 2: (None, "retracted")}


def test_retract_duplicate_tombstones_no_fanout(spark):
    """A takedown feed can deliver the same doc_id twice (retry,
    overlapping TTL+takedown) — the audit must stay one row per ledger
    doc, not fan out duplicate 'retracted' rows (r15 review)."""
    old = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    tomb = spark.createDataFrame([(2,), (2,), (2,)], "doc_id long")
    rows = llm._retract_labels(old, pairs, tomb).collect()
    assert len(rows) == 2
    got = {r["doc_id"]: (r["cluster_id"], r["status"]) for r in rows}
    assert got == {1: (None, "isolated"), 2: (None, "retracted")}


def test_retract_empty_tombstones_is_identity(spark):
    """No tombstones -> the ledger comes back verbatim, every row
    'unchanged' (the daily no-op run)."""
    got = _retract(spark, [(1, 1), (2, 1), (8, 8)], [(1, 2)], [])
    assert got == {
        1: (1, "unchanged"),
        2: (1, "unchanged"),
        8: (8, "unchanged"),
    }


def test_retract_untouched_components_never_reclustered(spark):
    """LOCALITY pin: untouched components must pass through VERBATIM,
    never entering the re-CC. Ledger labels for the untouched cluster
    are wrong on purpose (sentinel 999); a corpus-wide re-CC would
    correct them — passthrough preserves them."""
    got = _retract(
        spark,
        [(1, 1), (2, 1), (8, 999), (9, 999)],
        [(1, 2), (8, 9)],
        [2],
    )
    assert got[8] == (999, "unchanged")
    assert got[9] == (999, "unchanged")
    assert got[1] == (None, "isolated")
    assert got[2] == (None, "retracted")


def _union_find(edges):
    """Independent reference: min-label components by union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


_EDGE = st.tuples(
    st.integers(min_value=0, max_value=29), st.integers(min_value=0, max_value=29)
).filter(lambda t: t[0] != t[1]).map(lambda t: (min(t), max(t)))
# <= 12 edges per draw keeps every component diameter far under
# _min_label_cc's 20-round cap (a path of E edges has diameter <= E)
_EDGES = st.lists(_EDGE, min_size=1, max_size=12, unique=True)

_PROPERTY_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@_PROPERTY_SETTINGS
@given(edges=_EDGES)
def test_retract_matches_union_find(spark, edges):
    """Randomized exactness pin: on ANY graph with tombstones = nodes
    ≡ 1 (mod 4), the localized retraction must reproduce union-find
    over the SURVIVING edges — labels AND the retracted/isolated/
    relabeled/unchanged audit, row for row."""
    old = _union_find(edges)
    tomb = sorted(n for n in old if n % 4 == 1)
    surviving = [e for e in edges if e[0] % 4 != 1 and e[1] % 4 != 1]
    new = _union_find(surviving)
    expected = {}
    for n, lbl in old.items():
        if n % 4 == 1:
            expected[n] = (None, "retracted")
        elif n not in new:
            expected[n] = (None, "isolated")
        elif new[n] != lbl:
            expected[n] = (new[n], "relabeled")
        else:
            expected[n] = (lbl, "unchanged")
    got = _retract(
        spark,
        [(int(n), int(l)) for n, l in sorted(old.items())],
        [(int(a), int(b)) for a, b in edges],
        [int(t) for t in tomb],
    )
    assert got == expected


def test_min_label_cc_returns_cached_frame_with_scratch_column(spark):
    """r15 OPTIMIZATION-round contract: the convergence check reads the
    SAME per-round materialization as the label update (the old_label
    scratch column replaced a free-standing labels-join per round), and
    the returned frame IS the cached final round — is_cached visible —
    so callers that release the persist (_ensure_cluster_base) still
    can. Labels must stay exact min-label CC across components."""
    from chyme_spark.ops import llm

    g = spark.createDataFrame(
        [(5, 9), (9, 2), (7, 8)], "doc_a long, doc_b long"
    )
    lab = llm._min_label_cc(g)
    assert set(lab.columns) == {"doc", "old_label", "label"}
    assert lab.is_cached, "final round's persist must be visible to callers"
    got = {(r["doc"], r["label"]) for r in lab.collect()}
    assert got == {(5, 2), (9, 2), (2, 2), (7, 7), (8, 7)}
    lab.unpersist()
