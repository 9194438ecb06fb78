"""Round-13 contracts: the BPE adaptive-path equivalence and the
PPJoin dedup-first invariants.

The r13 rewrites are pure physical-strategy changes — every logical
output is pinned equal to its previous form:

* ``_train_merges`` now runs the merge loop collected on the driver
  when the word-frequency table is under ``_BPE_DRIVER_VOCAB_CAP``
  rows, and distributed above it. The two paths must produce the
  IDENTICAL merge table and final symbolized vocabulary.
* ``x_ppjoin_setsim`` now groups identical token sets before the
  prefix join (Vernica et al., SIGMOD'10) and buckets the probe key
  by partner size. Both are lossless; the oracle hash-equality is the
  primary pin (driver + tools/check_oracle.py), and the group-theory
  invariants here catch regressions the small fixtures might not.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from chyme_spark.ops import training
from chyme_spark.registry import REGISTRY, load_all

load_all()


def test_bpe_driver_and_distributed_paths_identical(spark, sf_dir, monkeypatch):
    """The adaptive strategy must be invisible: forcing the distributed
    loop (cap = 0) yields the same merge table, the same final word
    symbolization, and therefore the same x_bpe_apply top-30 as the
    driver loop — merge-for-merge, row-for-row."""
    merges_drv, words_drv = training._train_merges(spark, sf_dir)
    drv_words = {
        r["w"]: (r["freq"], tuple(r["sym"]))
        for r in words_drv.select("w", "freq", "sym").collect()
    }

    monkeypatch.setattr(training, "_BPE_DRIVER_VOCAB_CAP", 0)
    merges_dist, words_dist = training._train_merges(spark, sf_dir)
    dist_words = {
        r["w"]: (r["freq"], tuple(r["sym"]))
        for r in words_dist.select("w", "freq", "sym").collect()
    }

    assert merges_drv == merges_dist
    assert drv_words == dist_words


def test_bpe_driver_path_taken_on_fixture(spark, sf_dir):
    """The fixtures' vocabulary is far under the cap, so the default
    call must take the driver branch — guard the gate itself, so a
    refactor can't silently send every corpus through 12 rounds of
    job dispatch again."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .count()
    )
    assert n_vocab <= training._BPE_DRIVER_VOCAB_CAP


def _ppjoin_brute_force(spark, sf_dir):
    """All-pairs Jaccard >= 0.95 on distinct token sets, expanded to
    doc pairs — the oracle's definition, computed Spark-side so the
    test stands alone."""
    from chyme_spark.ops.llm import _tokens
    from chyme_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    sets = docs.select(
        "doc_id", F.array_sort(F.array_distinct(_tokens())).alias("hs")
    ).withColumn("n", F.size("hs"))
    a = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"), F.col("n").alias("na")
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"), F.col("n").alias("nb")
    )
    pairs = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    i = F.size(F.array_intersect("ha", "hb"))
    jac = i * 1.0 / (F.col("na") + F.col("nb") - i)
    return (
        pairs.filter(jac >= 0.95)
        .select("doc_a", "doc_b", F.round(jac, 4).cast("double").alias("jaccard"))
    )


def test_ppjoin_dedup_first_equals_all_pairs(spark, sf_dir):
    """Lossless end to end: dedup-first + size-bucketed prefix join +
    verify + group expansion reproduces the brute-force all-pairs join
    exactly (sf0.001 is small enough for the quadratic reference)."""
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in REGISTRY["x_ppjoin_setsim"].fn(spark, sf_dir).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in _ppjoin_brute_force(spark, sf_dir).collect()
    }
    assert got == want


def test_ppjoin_intra_group_pairs_all_exact(spark, sf_dir):
    """Every identical-set doc pair appears with jaccard exactly 1.0 —
    the intra-group branch bypasses the prefix join entirely, so a
    bug there would lose whole duplicate groups silently."""
    from chyme_spark.ops.llm import _tokens
    from chyme_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    keys = docs.select(
        "doc_id",
        F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens()))).alias("key"),
    )
    k1 = keys.select("key", F.col("doc_id").alias("doc_a"))
    k2 = keys.select("key", F.col("doc_id").alias("doc_b"))
    want = {
        (r["doc_a"], r["doc_b"])
        for r in k1.join(k2, "key").filter(F.col("doc_a") < F.col("doc_b")).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in REGISTRY["x_ppjoin_setsim"].fn(spark, sf_dir).collect()
    }
    for pair in want:
        assert got.get(pair) == 1.0, pair


def test_embedding_pq_codebooks_deterministic(spark, sf_dir):
    """Two runs of the rewritten PQ produce identical rows — the
    numpy Lloyd trainer is seed-pinned and the hash-sample collect is
    sorted, so no partition-layout dependence may leak in."""
    r1 = sorted(
        tuple(r) for r in REGISTRY["x_embedding_pq"].fn(spark, sf_dir).collect()
    )
    r2 = sorted(
        tuple(r) for r in REGISTRY["x_embedding_pq"].fn(spark, sf_dir).collect()
    )
    assert r1 == r2
