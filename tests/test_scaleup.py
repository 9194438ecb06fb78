"""The bench's deterministic scale-up utility (chyme_spark/scaleup.py)."""

from __future__ import annotations

import os

from chyme_spark.scaleup import ensure_scaled


def test_scaleup_shape_and_integrity(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "sf2x")
    ensure_scaled(spark, sf_dir, dest, factor=2)

    li_src = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li = spark.read.parquet(os.path.join(dest, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(dest, "orders.parquet"))
    nation = spark.read.parquet(os.path.join(dest, "nation.parquet"))

    # facts scale by the factor; fixed dims don't
    assert li.count() == 2 * li_src.count()
    assert nation.count() == 25

    # referential integrity holds across the shifted copies: every
    # lineitem orderkey still resolves to exactly one order
    unmatched = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    assert unmatched.count() == 0

    # key spaces of the copies are disjoint (no accidental overlap
    # inflating join fan-out): distinct orderkeys also double
    src_ok = li_src.select("l_orderkey").distinct().count()
    assert li.select("l_orderkey").distinct().count() == 2 * src_ok

    # idempotent: marker short-circuits, content unchanged
    ensure_scaled(spark, sf_dir, dest, factor=2)
    assert li.count() == 2 * li_src.count()


def test_scaleup_documents_texts_differ_across_copies(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "sf2y")
    ensure_scaled(spark, sf_dir, dest, factor=2)
    docs = spark.read.parquet(os.path.join(dest, "documents.parquet"))
    n = docs.count()
    # whole-document texts are unique across copies (suffix salt), so
    # exact-dedup ops keep a realistic survivor rate at scale
    assert docs.select("text").distinct().count() == n
