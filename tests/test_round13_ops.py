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


def test_neardup_compaction_conservation(spark, sf_dir):
    """GC is pure filtering: the compacted relations hold EXACTLY the
    base ledger's rows minus the tombstoned docs' — no recomputation,
    no loss, no duplication, surviving band hashes bit-identical."""
    from chyme_spark.ops.llm import _ensure_neardup_base, compact_neardup_ledger

    cdir = compact_neardup_ledger(spark, sf_dir)
    base = _ensure_neardup_base(spark, sf_dir)
    tomb = {r["doc_id"] for r in spark.read.parquet(f"{cdir}/tombstones").collect()}
    assert tomb, "fixture produced an empty retraction set — weaken nothing"

    base_bands = {
        (r["doc_id"], r["band"], r["bh"])
        for r in spark.read.parquet(f"{base}/bands").collect()
    }
    comp_bands = {
        (r["doc_id"], r["band"], r["bh"])
        for r in spark.read.parquet(f"{cdir}/bands").collect()
    }
    assert comp_bands == {t for t in base_bands if t[0] not in tomb}

    base_sets = {
        r["doc_id"]: (tuple(r["hs"]), r["n"])
        for r in spark.read.parquet(f"{base}/sets").collect()
    }
    comp_sets = {
        r["doc_id"]: (tuple(r["hs"]), r["n"])
        for r in spark.read.parquet(f"{cdir}/sets").collect()
    }
    assert comp_sets == {d: v for d, v in base_sets.items() if d not in tomb}


def test_neardup_compaction_replay_equals_scratch_ledger(spark, sf_dir, tmp_path):
    """The gate replayed against the compacted ledger must produce the
    IDENTICAL disposition table as against a ledger built from scratch
    on the surviving history — compaction is indistinguishable from
    never having ingested the retracted docs."""
    from chyme_spark.ops.llm import (
        _mark_ledger_built,
        band_signatures,
        compact_neardup_ledger,
        doc_shingle_sets,
        x_incremental_neardup,
    )

    cdir = compact_neardup_ledger(spark, sf_dir)
    tomb = [r["doc_id"] for r in spark.read.parquet(f"{cdir}/tombstones").collect()]

    scratch = str(tmp_path / "scratch_ledger")
    surviving = (
        doc_shingle_sets(spark, sf_dir)
        .filter(F.col("doc_id") < 250)
        .filter(~F.col("doc_id").isin(tomb))
    )
    band_signatures(surviving).write.mode("overwrite").parquet(f"{scratch}/bands")
    surviving.write.mode("overwrite").parquet(f"{scratch}/sets")
    _mark_ledger_built(scratch)

    replay = sorted(
        tuple(r)
        for r in x_incremental_neardup(spark, sf_dir, ledger_dir=cdir).collect()
    )
    want = sorted(
        tuple(r)
        for r in x_incremental_neardup(spark, sf_dir, ledger_dir=scratch).collect()
    )
    assert replay == want


def test_neardup_compaction_retraction_monotone(spark, sf_dir):
    """Row-for-row vs the pre-compaction gate: retraction can only
    ADMIT a previously-rejected doc or RAISE its dup_of (the min over
    a smaller verified set); any changed row's old dup_of must be a
    tombstoned id. Nothing may flip kept -> rejected."""
    from chyme_spark.ops.llm import compact_neardup_ledger, x_incremental_neardup

    cdir = compact_neardup_ledger(spark, sf_dir)
    tomb = {r["doc_id"] for r in spark.read.parquet(f"{cdir}/tombstones").collect()}
    before = {
        r["doc_id"]: (r["kept"], r["dup_of"])
        for r in x_incremental_neardup(spark, sf_dir).collect()
    }
    after = {
        r["doc_id"]: (r["kept"], r["dup_of"])
        for r in x_incremental_neardup(spark, sf_dir, ledger_dir=cdir).collect()
    }
    assert set(before) == set(after)
    for d, (kept_b, dup_b) in before.items():
        kept_a, dup_a = after[d]
        if (kept_b, dup_b) == (kept_a, dup_a):
            continue
        assert not kept_b, f"doc {d} flipped kept -> rejected after retraction"
        # the old partner must be gone, and the new state is either
        # admitted or a strictly later surviving partner
        assert dup_b in tomb, (d, dup_b)
        if not kept_a:
            assert dup_a is not None and dup_a > dup_b and dup_a not in tomb


def test_neardup_compaction_band_layout_one_file_each(spark, sf_dir):
    """The rewritten band index is clustered: exactly one parquet part
    per band directory (the ANN compactor's one-file-per-cell rule)."""
    import glob
    import os

    from chyme_spark.ops.llm import compact_neardup_ledger

    cdir = compact_neardup_ledger(spark, sf_dir)
    band_dirs = sorted(glob.glob(os.path.join(cdir, "bands", "band=*")))
    assert band_dirs, "no band partitions written"
    for d in band_dirs:
        parts = [p for p in os.listdir(d) if p.endswith(".parquet")]
        assert len(parts) == 1, (d, parts)


def test_incremental_neardup_rejects_unbuilt_ledger_dir(spark, sf_dir, tmp_path):
    """A ledger_dir without the .built sentinel must fail fast with a
    descriptive error, mirroring the ANN gate's r12-advice rule."""
    with pytest.raises(ValueError, match=r"\.built"):
        from chyme_spark.ops.llm import x_incremental_neardup

        x_incremental_neardup(spark, sf_dir, ledger_dir=str(tmp_path / "nope"))


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
