"""End-to-end worker parity: the 6-stage machine over real file://
resources executed distributed via mapInPandas (SURVEY §2A R22-R34)."""

from __future__ import annotations

import os

from chyme_spark.catalog import with_resource_columns
from chyme_spark.runner import run_tasks
from chyme_spark.templates import Template, expand


def _mk_inputs(tmp_path, n=3):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(n):
        (src / f"clip_{i}.mov").write_bytes(b"MOV" * (10 + i))
    return src


def _templates(tmp_path):
    out_root = tmp_path / "mirror"
    t = Template(
        name="mov",
        ext="mov",
        mirror_base=f"file://{out_root}",
        image="none",
        executor="subprocess",
        extra_config={"cmd": 'for f in "$IN"/*; do wc -c < "$f" > "$OUT/$(basename $f).size"; done'},
    )
    return (t,), out_root


def test_worker_end_to_end(spark, tmp_path):
    src = _mk_inputs(tmp_path)
    urls = spark.createDataFrame(
        [(f"file://{src}/{n}",) for n in sorted(os.listdir(src))], "url string"
    )
    catalog = with_resource_columns(urls)
    templates, out_root = _templates(tmp_path)
    tasks = expand(catalog, templates)
    results = run_tasks(tasks).collect()
    assert len(results) == 3
    assert all(r.ok and r.stage == "complete" for r in results)
    assert all(r.bytes_in > 0 and r.bytes_out > 0 for r in results)
    # outputs actually landed: one .size file per input under the mirror
    produced = []
    for root, _dirs, files in os.walk(out_root):
        produced += [f for f in files if f.endswith(".size")]
    assert len(produced) == 3


def test_worker_failure_quarantines_with_stage(spark, tmp_path):
    src = _mk_inputs(tmp_path, n=1)
    urls = spark.createDataFrame([(f"file://{src}/clip_0.mov",)], "url string")
    catalog = with_resource_columns(urls)
    templates, _ = _templates(tmp_path)
    from dataclasses import replace
    bad = replace(templates[0], extra_config={"cmd": "exit 3"})
    results = run_tasks(expand(catalog, (bad,))).collect()
    assert len(results) == 1
    r = results[0]
    assert not r.ok
    assert r.stage == "execute"  # failure stage recorded (DLQ attrs parity)
    assert "exit 3" in r.error


def test_worker_unknown_executor_quarantined(spark, tmp_path):
    src = _mk_inputs(tmp_path, n=1)
    urls = spark.createDataFrame([(f"file://{src}/clip_0.mov",)], "url string")
    catalog = with_resource_columns(urls)
    templates, _ = _templates(tmp_path)
    from dataclasses import replace
    bad = replace(templates[0], executor="warp-drive")
    results = run_tasks(expand(catalog, (bad,))).collect()
    assert not results[0].ok
    assert "unknown executor" in results[0].error


def test_phony_resources_skip_transfer(spark, tmp_path):
    urls = spark.createDataFrame([("file:///nonexistent/x.mov",)], "url string")
    catalog = with_resource_columns(urls, phony=True)
    templates, _ = _templates(tmp_path)
    from dataclasses import replace
    noop = replace(templates[0], executor="noop", extra_config={})
    results = run_tasks(expand(catalog, (noop,))).collect()
    # phony -> loaders no-op, nothing downloaded, still completes
    assert results[0].ok and results[0].bytes_in == 0
