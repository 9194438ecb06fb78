"""Multimodal/binary op plumbing tests (ops/binary.py).

Also pins the ASCII fixture invariant the x_frame_sample /
x_media_resize oracles depend on: DuckDB substr() slices characters
while the Spark side slices UTF-8 bytes, so byte-exact md5 parity
requires 1 char == 1 byte throughout documents.text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chyme_spark.ops.binary import x_frame_sample, x_media_resize


def test_documents_text_is_pure_ascii(spark, sf_dir):
    """The oracle's char-slice == Spark's byte-slice assumption."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    non_ascii = docs.filter(F.length("text") != F.octet_length("text")).count()
    assert non_ascii == 0


def test_frame_sample_fanout_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = x_frame_sample(spark, sf_dir)
    # every doc with text fans out to >= 1 frame; stride keeps idx % 4 == 0
    n_docs = docs.filter(F.length("text") > 0).count()
    assert frames.select("doc_id").distinct().count() == n_docs
    assert frames.filter(F.col("frame_idx") % 4 != 0).count() == 0
    # all kept frames except a doc's last are exactly _FRAME_BYTES long
    from chyme_spark.ops.binary import _FRAME_BYTES

    assert frames.filter(F.col("frame_len") > _FRAME_BYTES).count() == 0


def test_media_resize_halves_length(spark, sf_dir):
    out = x_media_resize(spark, sf_dir)
    bad = out.filter(F.col("out_len") != F.expr("(in_len + 1) div 2")).count()
    assert bad == 0
