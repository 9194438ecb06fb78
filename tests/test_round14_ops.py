"""Round-14 contracts: the dedup-cluster shared ledger and the
incremental cluster-label update.

* The trio decomposition (VERDICT r13 #1) is a pure physical change —
  x_dedup_clusters / x_neardup_survivors / x_dedup_report now read a
  session-cached candidate+labels ledger instead of each re-running
  the candidate join and CC loop. The recursive-CTE oracles remain
  the primary pin; here we pin the ledger's internal consistency
  (labels == CC of the pairs table it sits next to).
* ``x_cluster_label_update`` (VERDICT r13 #8) must equal FROM-SCRATCH
  clustering of the union graph — the quotient-graph contraction is
  an optimization, never a semantic. The DuckDB double-recursive-CTE
  oracle pins it on the fixture; the synthetic cases here exercise
  the merge topologies the fixture can't guarantee (two old clusters
  bridged by one batch doc, unledgered history docs, batch-only
  components).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chyme_spark.ops import llm
from chyme_spark.registry import REGISTRY, load_all

load_all()


def test_cluster_ledger_labels_match_cc_of_pairs(spark, sf_dir):
    """The shared ledger's labels/ table must be exactly the min-label
    CC of its own pairs/ table — the invariant every trio member now
    leans on."""
    base = llm._ensure_cluster_base(spark, sf_dir)
    pairs = spark.read.parquet(f"{base}/pairs").select("doc_a", "doc_b")
    recomputed = {
        (r["doc"], r["label"]) for r in llm._min_label_cc(pairs).collect()
    }
    stored = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(f"{base}/labels").collect()
    }
    assert stored == recomputed and len(stored) > 0


def test_label_update_equals_from_scratch(spark, sf_dir):
    """(doc_id, cluster_id) of the incremental update == x_dedup_clusters
    (from-scratch CC over the full pair list), row for row."""
    inc = {
        (r["doc_id"], r["cluster_id"])
        for r in REGISTRY["x_cluster_label_update"].fn(spark, sf_dir).collect()
    }
    scratch = {
        (r["doc_id"], r["cluster_id"])
        for r in REGISTRY["x_dedup_clusters"].fn(spark, sf_dir).collect()
    }
    assert inc == scratch and len(inc) > 0


def test_label_update_status_accounting(spark, sf_dir):
    """status must be an exact audit of the ledger diff: 'new' iff the
    doc had no row in the history ledger, 'relabeled' iff its label
    strictly decreased (labels are component minima — a merge can only
    pull a label down), 'unchanged' otherwise."""
    base = llm._ensure_cluster_base(spark, sf_dir)
    pairs = spark.read.parquet(f"{base}/pairs").select("doc_a", "doc_b")
    old = {
        r["doc"]: r["label"]
        for r in llm._min_label_cc(pairs.filter(F.col("doc_b") < 250)).collect()
    }
    out = REGISTRY["x_cluster_label_update"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        if r["status"] == "new":
            assert r["doc_id"] not in old
        elif r["status"] == "relabeled":
            assert old[r["doc_id"]] > r["cluster_id"]
        else:
            assert r["status"] == "unchanged"
            assert old[r["doc_id"]] == r["cluster_id"]


def _update(spark, old_rows, pair_rows):
    old = spark.createDataFrame(old_rows, "doc_id long, cluster_id long")
    pairs = spark.createDataFrame(pair_rows, "doc_a long, doc_b long")
    return {
        r["doc_id"]: (r["cluster_id"], r["status"])
        for r in llm._apply_label_updates(old, pairs).collect()
    }


def test_label_update_merges_two_old_clusters(spark):
    """One batch doc bridging two old clusters must merge them under
    the global-min label; an untouched old cluster must survive
    byte-identical as 'unchanged'."""
    got = _update(
        spark,
        [(1, 1), (2, 1), (5, 5), (6, 5), (8, 8), (9, 8)],
        [(2, 300), (5, 300), (400, 401)],
    )
    assert got == {
        1: (1, "unchanged"),
        2: (1, "unchanged"),
        5: (1, "relabeled"),
        6: (1, "relabeled"),
        8: (8, "unchanged"),
        9: (8, "unchanged"),
        300: (1, "new"),
        400: (400, "new"),
        401: (400, "new"),
    }


def test_label_update_unledgered_history_doc(spark):
    """A history doc that never had a near-dup is absent from the
    ledger; when a batch doc finally pairs with it, BOTH are 'new' to
    the ledger and the component label is the history doc's id (the
    true minimum)."""
    got = _update(spark, [(1, 1), (2, 1)], [(10, 500)])
    assert got == {
        1: (1, "unchanged"),
        2: (1, "unchanged"),
        10: (10, "new"),
        500: (10, "new"),
    }


def test_label_update_chain_through_batch(spark):
    """Transitivity through a batch-only chain: old clusters {1,2} and
    {5,6} connected only via 300-301 (a batch edge) must still merge —
    the quotient CC sees the full batch graph, not single hops."""
    got = _update(
        spark,
        [(1, 1), (2, 1), (5, 5), (6, 5)],
        [(2, 300), (300, 301), (5, 301)],
    )
    assert got == {
        1: (1, "unchanged"),
        2: (1, "unchanged"),
        5: (1, "relabeled"),
        6: (1, "relabeled"),
        300: (1, "new"),
        301: (1, "new"),
    }


def test_label_update_empty_batch_is_identity(spark):
    """No batch pairs -> the ledger comes back verbatim, every row
    'unchanged' (the daily no-op run)."""
    got = _update(spark, [(1, 1), (2, 1)], [])
    assert got == {1: (1, "unchanged"), 2: (1, "unchanged")}


_EDGE = st.tuples(
    st.integers(min_value=0, max_value=29), st.integers(min_value=0, max_value=29)
).filter(lambda t: t[0] != t[1]).map(lambda t: (min(t), max(t)))
# <= 12 edges per draw keeps every component diameter far under
# _min_label_cc's 20-round cap (a path of E edges has diameter <= E)
_EDGES = st.lists(_EDGE, min_size=0, max_size=12, unique=True)

_PROPERTY_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


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


@_PROPERTY_SETTINGS
@given(edges=_EDGES)
def test_label_update_matches_union_find(spark, edges):
    """Randomized exactness pin: on ANY graph, folding the batch edges
    (those touching a node >= 15) into a union-find-built history
    ledger must reproduce union-find over the whole edge set — labels
    AND the new/relabeled/unchanged audit, row for row."""
    old_edges = [e for e in edges if e[0] < 15 and e[1] < 15]
    batch = [e for e in edges if not (e[0] < 15 and e[1] < 15)]
    old = _union_find(old_edges)
    expected = _union_find(edges)
    got = _update(
        spark,
        [(int(n), int(l)) for n, l in sorted(old.items())],
        [(int(a), int(b)) for a, b in sorted(batch)],
    )
    assert {n: c for n, (c, _) in got.items()} == expected
    for n, (c, status) in got.items():
        if n not in old:
            assert status == "new"
        elif old[n] != c:
            assert status == "relabeled"
        else:
            assert status == "unchanged"


def test_min_label_cc_raises_past_diameter_cap(spark):
    """A path component with diameter > 20 must FAIL LOUD (r14 review:
    the pre-fix loop silently returned non-minimal labels), and the
    rounds log must record converged runs, not capped ones."""
    import pytest

    from chyme_spark.ops import llm

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="large-star/small-star"):
        llm._min_label_cc(chain).count()


def test_cc_rounds_log_appends_per_call(spark):
    """_CC_ROUNDS_LOG appends one entry per converged CC (a clobbered
    scalar misled multi-CC ops and warm-ledger calls — r14 review)."""
    from chyme_spark.ops import llm

    llm._CC_ROUNDS_LOG.clear()
    tri = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    lab1 = llm._min_label_cc(tri)
    assert {(r["doc"], r["label"]) for r in lab1.collect()} == {
        (1, 1), (2, 1), (3, 1)
    }
    lab2 = llm._min_label_cc(tri)
    lab2.count()
    assert len(llm._CC_ROUNDS_LOG) == 2 and all(
        1 <= r <= 20 for r in llm._CC_ROUNDS_LOG
    )
    for df in (lab1, lab2):
        if df.is_cached:
            df.unpersist()
