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


def test_worker_follow_streams_tasks(spark, tmp_path, capsys):
    """--follow drains the tasks table via Structured Streaming; a second
    drain after more tasks are enqueued processes ONLY the new files
    (stream checkpoint), and the ledger stays one-row-per-task."""
    src = tmp_path / "media"
    src.mkdir()
    (src / "a.mov").write_bytes(b"A" * 100)
    t = tmp_path / "tables"
    common = [
        "--catalog", f"{t}/catalog", "--ledger", f"{t}/ledger", "--tasks", f"{t}/tasks",
    ]
    tasker = common + [
        "--mirror-base", f"file://{t}/mirror", "--executor", "subprocess",
        "--cmd", 'for f in "$IN"/*; do wc -c < "$f" > "$OUT/$(basename $f).size"; done',
    ]
    worker = [
        "worker", "--tasks", f"{t}/tasks", "--ledger", f"{t}/ledger",
        "--quarantine", f"{t}/quar", "--follow",
    ]
    assert cli.main(["ingest", str(src), "--filter", "ext/mov", "--catalog", f"{t}/catalog"]) == 0
    assert cli.main(["tasker"] + tasker) == 0
    assert cli.main(worker) == 0
    assert "completed 1 tasks" in capsys.readouterr().out
    assert spark.read.parquet(f"{t}/ledger").count() == 1

    # enqueue one more resource; the second drain sees only the new task
    (src / "b.mov").write_bytes(b"B" * 60)
    assert cli.main(["ingest", str(src), "--filter", "ext/mov", "--catalog", f"{t}/catalog"]) == 0
    assert cli.main(["tasker"] + tasker) == 0
    assert cli.main(worker) == 0
    assert "completed 1 tasks" in capsys.readouterr().out
    ledger = spark.read.parquet(f"{t}/ledger")
    assert ledger.count() == 2
    assert ledger.select("task_hash").distinct().count() == 2

    # an immediate re-drain with nothing new is a no-op
    assert cli.main(worker) == 0
    assert "completed 0 tasks" in capsys.readouterr().out


def test_worker_follow_interval_long_poll(spark, tmp_path, capsys):
    """--follow-interval turns the drain into a perpetual processingTime
    long-poll (ref worker 20s loop): ONE follow run picks up a second
    task batch appended while it is already running."""
    import threading
    import time

    src = tmp_path / "media"
    src.mkdir()
    (src / "a.mov").write_bytes(b"A" * 100)
    t = tmp_path / "tables"
    tasker = [
        "--catalog", f"{t}/catalog", "--ledger", f"{t}/ledger", "--tasks", f"{t}/tasks",
        "--mirror-base", f"file://{t}/mirror", "--executor", "subprocess",
        "--cmd", 'for f in "$IN"/*; do wc -c < "$f" > "$OUT/$(basename $f).size"; done',
    ]
    assert cli.main(["ingest", str(src), "--filter", "ext/mov", "--catalog", f"{t}/catalog"]) == 0
    assert cli.main(["tasker"] + tasker) == 0

    def ledger_count() -> int:
        try:
            return spark.read.parquet(f"{t}/ledger").count()
        except Exception:  # noqa: BLE001 — ledger not written yet
            return 0

    worker = [
        "worker", "--tasks", f"{t}/tasks", "--ledger", f"{t}/ledger",
        "--quarantine", f"{t}/quar", "--follow",
        "--follow-interval", "1 seconds", "--follow-duration", "120",
    ]
    rc: dict[str, int] = {}
    th = threading.Thread(target=lambda: rc.setdefault("rc", cli.main(worker)))
    th.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and ledger_count() < 1:
            time.sleep(0.5)
        assert ledger_count() == 1
        # enqueue a second batch WHILE the poll loop is live
        (src / "b.mov").write_bytes(b"B" * 60)
        assert cli.main(["ingest", str(src), "--filter", "ext/mov", "--catalog", f"{t}/catalog"]) == 0
        assert cli.main(["tasker"] + tasker) == 0
        while time.time() < deadline and ledger_count() < 2:
            time.sleep(0.5)
    finally:
        for q in spark.streams.active:
            q.stop()
        th.join(timeout=60)
    assert not th.is_alive()
    assert rc.get("rc") == 0
    assert "long-poll every 1 seconds" in capsys.readouterr().out
    ledger = spark.read.parquet(f"{t}/ledger")
    assert ledger.count() == 2
    assert ledger.select("task_hash").distinct().count() == 2


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


def test_sql_verb_runs(spark, capsys):
    rc = cli.main(
        [
            "sql",
            "SELECT r_name, count(*) AS n FROM region JOIN nation ON r_regionkey = n_regionkey GROUP BY r_name ORDER BY r_name",
            "--sf",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "5 rows" in out


def test_sql_verb_extra_table(spark, tmp_path, capsys):
    p = str(tmp_path / "extra")
    spark.range(7).write.parquet(p)
    rc = cli.main(["sql", "SELECT count(*) AS n FROM extra", "--sf", "/root/testdata/sf0.001", "--table", f"extra={p}"])
    assert rc == 0
    assert "1 rows" in capsys.readouterr().out


def test_sql_verb_bad_table_arg(spark, capsys):
    rc = cli.main(["sql", "SELECT 1", "--sf", "/root/testdata/sf0.001", "--table", "nopath"])
    assert rc == 2
    assert "NAME=PATH" in capsys.readouterr().err


def test_compact_zorder_prunes_both_columns(spark, tmp_path):
    """Z-ordered rewrite: every output file must cover a strict subset
    of BOTH clustered columns' ranges (a plain single-column sort only
    narrows one; an unsorted layout narrows neither)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    t = str(tmp_path / "zt")
    # two independent uniform dimensions, deterministic
    spark.range(20000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), 10000) / 10000.0).alias("a"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 10000) / 10000.0).alias("b"),
    ).repartition(8).write.parquet(t)
    assert cli.main(["compact", "--table", t, "--target-files", "4", "--zorder", "a,b"]) == 0

    files = spark.read.parquet(t).inputFiles()
    assert len(files) == 4
    for colname in ("a", "b"):
        spans = []
        for f in files:
            md = pq.ParquetFile(f.removeprefix("file:")).metadata
            idx = md.schema.names.index(colname)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        # Derived bound (VERDICT r6 #3 — the old 0.75 failed once at
        # 0.7503 under concurrent load): with 4 range partitions over a
        # 2-dim z-curve each file ideally spans 0.5 of each dimension
        # (the top two z bits are the two columns' high bucket bits).
        # Each of the 3 interior range boundaries that lands INSIDE a
        # quadrant (repartitionByRange samples, so alignment is not
        # guaranteed) doubles one dimension's span in the two adjacent
        # files; the worst split-every-boundary mean is therefore
        # (2*0.5 + 2*1.0)/4 = 0.75 per dimension, plus approxQuantile
        # (0.001) and 256-bucket quantization error. An UNclustered
        # column concentrates at ~1.0 (every file sees the full range),
        # so 0.85 keeps the full discriminating power with real margin.
        assert sum(spans) / len(spans) < 0.85, (colname, spans)
    # rows survived the rewrite
    assert spark.read.parquet(t).count() == 20000


def test_profile_verb(spark, capsys):
    rc = cli.main(["profile", "--table", "/root/testdata/sf0.001/nation.parquet"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rows: 25" in out and "n_nationkey" in out


def test_convert_verb_roundtrip(spark, tmp_path, capsys):
    src = "/root/testdata/sf0.001/region.parquet"
    dst = str(tmp_path / "region_orc")
    rc = cli.main(["convert", "--src", src, "--dst", dst, "--dst-format", "orc"])
    assert rc == 0
    assert spark.read.orc(dst).count() == 5
    rc2 = cli.main(["convert", "--src", src, "--dst", str(tmp_path / "x"), "--dst-format", "delta"])
    assert rc2 == 2  # gated format -> clean error, not a stacktrace


def test_readme_counts_match_registry():
    """The README scoreboard number is generated, not hand-maintained:
    this fails the suite the moment the registry grows past the stated
    count (r3 item 10)."""
    import os
    import re

    from chyme_spark.cli import query_counts

    total, n_oracle, n_rows_only = query_counts()
    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    ).read()
    m = re.search(
        r"\*\*(\d+) registered queries\*\* \((\d+) DuckDB-oracle hash-checked,\s*(\d+)\s*rows-only",
        readme,
    )
    assert m, "README scoreboard line missing"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (total, n_oracle, n_rows_only)


def test_queries_md_is_fresh():
    """The committed QUERIES.md must be byte-identical to what the
    generator emits at HEAD — its header promises the first 50 rows
    are the CURRENT round's driver window, and the r14 self-review
    caught a commit where the file predated a _FRONT_50 swap (row 1
    was the previous round's window head). Regenerate with
    `python tools/gen_queries_md.py` whenever the registry or
    _FRONT_50 changes."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", os.path.join(root, "tools", "gen_queries_md.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    committed = open(os.path.join(root, "QUERIES.md")).read()
    assert gen.render()[0] == committed, (
        "QUERIES.md is stale — run `python tools/gen_queries_md.py`"
    )


def test_ls_queries_prints_counts(capsys):
    from chyme_spark import cli
    from chyme_spark.cli import query_counts

    total, n_oracle, n_rows_only = query_counts()
    rc = cli.main(["ls-queries"])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"-- {total} registered queries ({n_oracle} DuckDB-oracle hash-checked, " in out


def test_ingest_follow_streams_new_arrivals(spark, tmp_path, capsys):
    """ingest --follow catalogs via the chyme_listing streaming source:
    first drain catalogs the existing files, a second drain after a new
    arrival appends ONLY it (stream checkpoint + exactly-once), and the
    extension filter applies inside every micro-batch."""
    import time

    src = tmp_path / "inbox"
    src.mkdir()
    (src / "a.mov").write_bytes(b"A" * 10)
    (src / "skip.log").write_bytes(b"z")
    cat = str(tmp_path / "catalog")
    args = [
        "ingest", str(src), "--filter", "ext/mov/mp4",
        "--catalog", cat, "--follow",
    ]
    assert cli.main(args) == 0
    rows = spark.read.parquet(cat).collect()
    assert [r.url.rsplit("/", 1)[-1] for r in rows] == ["a.mov"]

    time.sleep(0.05)  # distinct mtime millisecond for the arrival
    (src / "b.mp4").write_bytes(b"B" * 20)
    assert cli.main(args) == 0
    names = sorted(r.url.rsplit("/", 1)[-1] for r in spark.read.parquet(cat).collect())
    assert names == ["a.mov", "b.mp4"]

    # unchanged inbox: third drain appends nothing
    assert cli.main(args) == 0
    assert spark.read.parquet(cat).count() == 2


def test_persist_hygiene():
    """Every persist() in a query path must be released (unpersist /
    localCheckpoint hand-off) or carry an explicit bounded-retention
    marker — VERDICT r15 #5: x_pagerank's leak was fixed while
    x_cross_source_leakage's identical leak shipped with only prose;
    tools/check_persists.py makes the trade machine-checkable."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "check_persists", os.path.join(root, "tools", "check_persists.py")
    )
    chk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(chk)
    files = list(chk.EXTRA_FILES)
    for d in chk.SCAN:
        files += [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".py")
        ]
    violations = []
    for path in files:
        violations += chk.check_file(path)
    assert not violations, "\n".join(violations)
