"""CLI verbs driven in-process (regression net for the command layer)."""

from __future__ import annotations

import os

from chyme_spark import cli


def test_pipeline_verb_end_to_end(spark, tmp_path):
    src = tmp_path / "media"
    src.mkdir()
    (src / "a.mov").write_bytes(b"A" * 100)
    (src / "b.mp4").write_bytes(b"B" * 50)
    (src / "skip.log").write_bytes(b"z")
    t = tmp_path / "tables"
    args = [
        "pipeline", str(src), "--filter", "ext/mov/mp4",
        "--catalog", f"{t}/catalog", "--ledger", f"{t}/ledger",
        "--tasks", f"{t}/tasks", "--quarantine", f"{t}/quar",
        "--mirror-base", f"file://{t}/mirror", "--executor", "subprocess",
        "--cmd", 'for f in "$IN"/*; do wc -c < "$f" > "$OUT/$(basename $f).size"; done',
    ]
    assert cli.main(args) == 0
    produced = []
    for root, _d, files in os.walk(f"{t}/mirror"):
        produced += [f for f in files if f.endswith(".size")]
    assert sorted(produced) == ["a.mov.size", "b.mp4.size"]
    # idempotent rerun: no new tasks, no failures
    assert cli.main(args) == 0
    ledger = spark.read.parquet(f"{t}/ledger")
    assert ledger.count() == 2  # still exactly one ledger row per task


def test_ingest_bad_filter_clean_error(spark, tmp_path, capsys):
    src = tmp_path / "m"
    src.mkdir()
    (src / "a.mov").write_bytes(b"A")
    rc = cli.main(["ingest", str(src), "--filter", "nope/x", "--catalog", str(tmp_path / "c")])
    assert rc == 2
    assert "unknown filter" in capsys.readouterr().err


def test_status_verb(spark, tmp_path, capsys):
    t = tmp_path / "tables"
    src = tmp_path / "m"
    src.mkdir()
    (src / "a.mov").write_bytes(b"A" * 10)
    assert cli.main(["ingest", str(src), "--filter", "ext/mov", "--catalog", f"{t}/catalog"]) == 0
    assert cli.main(["status", "--catalog", f"{t}/catalog", "--tasks", f"{t}/tasks"]) == 0
    out = capsys.readouterr().out
    assert "catalog    1" in out
    assert "tasks      -" in out  # not created yet


def test_compact_verb(spark, tmp_path, capsys):
    t = str(tmp_path / "t")
    spark.range(0, 5000).repartition(9).write.parquet(t)
    assert len(spark.read.parquet(t).inputFiles()) == 9
    assert cli.main(["compact", "--table", t, "--target-files", "2"]) == 0
    assert len(spark.read.parquet(t).inputFiles()) == 2
    assert spark.read.parquet(t).count() == 5000


def test_query_verb_runs(spark, capsys):
    rc = cli.main(["query", "d15_count_distinct", "--sf", "/root/testdata/sf0.001", "--show", "3"])
    assert rc == 0
    assert "rows" in capsys.readouterr().out
