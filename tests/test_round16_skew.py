"""Round-16 skew-hardening pins (VERDICT r15 #1, ADVICE r15).

1. Null-key semantics (ADVICE r15 #3): the r15 join->window conversions
   changed how a NULL window key would behave vs the former inner join.
   For x_corpus_filter_pipeline — the only converted op whose key
   (md5(text)) can be NULL, the others derive keys from explodes that
   drop null rows identically on both engines — the oracle SQL was
   ALREADY converted to the same window shape (min OVER (PARTITION BY
   md5(text))), and both engines group NULL keys into one partition.
   Pin that agreement on a corpus that actually contains null text so a
   future restructure of either side cannot silently diverge.

2. Skew-shape pins for the r16 hardened operators live alongside.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from chyme_spark.registry import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _write_null_text_docs(spark, path: str) -> None:
    rows = [
        # two null-text docs: one exact-dup cluster under window
        # semantics (nulls group together; min doc_id 3 is the keeper)
        Row(doc_id=3, text=None, lang="en", source="crawl", n_chars=0),
        Row(doc_id=7, text=None, lang="en", source="crawl", n_chars=0),
        # two identical non-null docs (normal dup cluster)
        Row(doc_id=1, text="the a of is common words here now ok yes", lang="en", source="crawl", n_chars=40),
        Row(doc_id=5, text="the a of is common words here now ok yes", lang="en", source="crawl", n_chars=40),
        # a unique doc
        Row(doc_id=9, text="der und die nicht etwas anderes text hier", lang="de", source="curated", n_chars=41),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


def test_corpus_filter_null_text_window_semantics_match_oracle(spark, tmp_path, registry):
    import duckdb

    sf = str(tmp_path)
    _write_null_text_docs(spark, sf)
    q = registry["x_corpus_filter_pipeline"]

    got = [tuple(r) for r in q.fn(spark, sf).collect()]

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.sql(q.oracle).fetchall()]

    assert got == want, (
        "null-text corpus diverged between Spark and the DuckDB oracle — "
        "the window null-grouping semantics must stay aligned on BOTH sides"
    )
    # and the semantics themselves: null-text docs are present (the old
    # inner-join shape dropped them) and dedup'd among themselves
    by_id = {r[0]: r for r in got}
    assert 3 in by_id and 7 in by_id
    assert by_id[3][4] is False and by_id[7][4] is True  # is_dup: keeper=3
