"""Round-15 contracts: the text-index lifecycle pair.

``x_incremental_index`` (gate) + ``x_index_compaction`` (GC) give the
inverted-index family the same incremental maintenance story the
dedup / near-dup / ANN families already have. The DuckDB oracles pin
the fixture arithmetic; the contracts here pin the lifecycle claims
the oracle can't see:

  * the doc-ledger gate drops at-least-once redeliveries (no 'add'
    row for an already-indexed doc);
  * deletes are DOC-grain tombstones (the Lucene O(1) delete model) —
    exactly the takedown set, no postings payload;
  * REPLAY: history index + delta (apply adds, drop tombstoned docs'
    postings) == from-scratch index over the surviving corpus;
  * the compaction manifest conserves postings (survivors + dropped
    == every (doc, term) pair in the corpus) and reports the tiered
    source-segment census;
  * an all-tombstoned merged segment keeps its manifest row (n_docs
    0, NULL doc range) — the degenerate edge the fixture's modulus
    tombstones never produce, via the factored _index_merge_manifest.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from chyme_spark.ops import llm
from chyme_spark.registry import REGISTRY, load_all
from chyme_spark.session import load_table

load_all()


def _full_index(spark, sf_dir, pred):
    """From-scratch (doc_id, term, tf, positions) index over docs
    matching pred — the same tokenization as x_inverted_index."""
    docs = load_table(spark, sf_dir, "documents").filter(pred)
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    )
    return toks.groupBy("doc_id", F.col("w").alias("term")).agg(
        F.count("*").cast("long").alias("tf"),
        F.array_join(
            F.sort_array(F.collect_list((F.col("pos0") + 1).cast("long"))), "|"
        ).alias("positions"),
    )


def test_gate_drops_redelivered_docs(spark, sf_dir):
    """Docs 240-249 arrive in the delivery but are already indexed —
    the doc-ledger anti-join must emit NO 'add' row for them, and
    every gated add doc must be >= 250."""
    out = REGISTRY["x_incremental_index"].fn(spark, sf_dir)
    add_docs = {
        r["doc_id"]
        for r in out.filter(F.col("action") == "add").select("doc_id").distinct().collect()
    }
    assert add_docs, "fixture must produce adds"
    assert min(add_docs) >= 250
    assert add_docs == {d for d in range(250, 500)}


def test_deletes_are_doc_grain_tombstones(spark, sf_dir):
    """'delete' rows are exactly the takedown set (indexed docs with
    doc_id % 25 == 3), one row per doc, with NULL postings columns —
    recording a takedown never reads the index."""
    dels = (
        REGISTRY["x_incremental_index"].fn(spark, sf_dir)
        .filter(F.col("action") == "delete")
        .collect()
    )
    assert {r["doc_id"] for r in dels} == {d for d in range(250) if d % 25 == 3}
    assert len(dels) == 10  # one row per doc, not per posting
    for r in dels:
        assert r["term"] is None and r["tf"] is None and r["positions"] is None


def test_delta_replay_equals_from_scratch(spark, sf_dir):
    """Applying the delta to the history index — union the 'add'
    postings, anti-join away tombstoned docs — reproduces the
    from-scratch index over the surviving corpus, row for row."""
    delta = REGISTRY["x_incremental_index"].fn(spark, sf_dir)
    history = _full_index(spark, sf_dir, F.col("doc_id") < 250)
    tombs = delta.filter(F.col("action") == "delete").select("doc_id")
    replayed = history.join(tombs, "doc_id", "left_anti").unionByName(
        delta.filter(F.col("action") == "add").select(
            "doc_id", "term", "tf", "positions"
        )
    )
    scratch = _full_index(
        spark,
        sf_dir,
        (F.col("doc_id") >= 250) | (F.col("doc_id") % 25 != 3),
    )
    key = ["doc_id", "term", "tf", "positions"]
    assert {tuple(r) for r in replayed.select(*key).collect()} == {
        tuple(r) for r in scratch.select(*key).collect()
    }


def test_compaction_manifest_conserves_postings(spark, sf_dir):
    """survivor postings + dropped postings == every (doc, term) pair
    in the corpus; the tiered merge census is [2, 2, 1] source
    segments for the 500-doc fixture; dropped_docs covers the full
    modulus takedown set."""
    rows = {
        r["segment"]: r
        for r in REGISTRY["x_index_compaction"].fn(spark, sf_dir).collect()
    }
    assert sorted(rows) == [0, 1, 2]
    assert [rows[s]["n_src_segments"] for s in (0, 1, 2)] == [2, 2, 1]
    total_pairs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .count()
    )
    assert (
        sum(r["n_postings"] + r["dropped_postings"] for r in rows.values())
        == total_pairs
    )
    assert sum(r["dropped_docs"] for r in rows.values()) == 20  # 500/25
    for r in rows.values():
        assert r["min_doc"] is not None and r["min_doc"] >= r["segment"] * 200
        assert r["max_doc"] < (r["segment"] + 1) * 200


def test_overlay_search_serves_both_sides_and_excludes_tombstones(spark, sf_dir):
    """The read path must serve base AND delta: the fixture's top-20
    contains docs from the history segment and from the gate's
    admitted batch, never a tombstoned doc — and never a redelivered
    doc counted twice (a double-served doc would double its tf and
    the DuckDB oracle equality would break; here we pin the
    composition directly)."""
    rows = REGISTRY["x_index_overlay_search"].fn(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == 20 and len(set(ids)) == 20
    assert any(i < 250 for i in ids), "base segment must be served"
    assert any(i >= 250 for i in ids), "delta adds must be served"
    assert not [i for i in ids if i < 250 and i % 25 == 3], (
        "tombstoned docs must not be served"
    )
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_all_tombstoned_segment_keeps_manifest_row(spark):
    """A merged segment whose docs are ALL tombstoned must keep its
    row — n_docs 0, zero survivors, NULL doc range — so the manifest
    conserves the source-segment census."""
    post = spark.createDataFrame(
        # segment 0: doc 1 survives, doc 3 tombstoned.
        # segment 1: docs 201, 203 BOTH tombstoned.
        [
            (1, "a", 2, 0, 0, False),
            (1, "b", 1, 0, 0, False),
            (3, "a", 1, 0, 0, True),
            (201, "c", 4, 1, 2, True),
            (203, "c", 1, 1, 2, True),
        ],
        "doc_id long, w string, tf long, segment long, src_seg long, tomb boolean",
    )
    rows = {r["segment"]: r for r in llm._index_merge_manifest(post).collect()}
    assert sorted(rows) == [0, 1]
    dead = rows[1]
    assert dead["n_docs"] == 0
    assert dead["n_terms"] == 0
    assert dead["n_postings"] == 0
    assert dead["total_tf"] == 0
    assert dead["dropped_docs"] == 2
    assert dead["dropped_postings"] == 2
    assert dead["min_doc"] is None and dead["max_doc"] is None
    live = rows[0]
    assert live["n_docs"] == 1 and live["n_postings"] == 2
    assert live["total_tf"] == 3
    assert live["dropped_docs"] == 1 and live["dropped_postings"] == 1
    assert (live["min_doc"], live["max_doc"]) == (1, 1)
