"""Streaming == batch-twin assertions (SURVEY §5.5).

D-40's append-mode sink must equal the batch tumbling aggregation
(D-38) restricted to windows the final watermark closed; D-41's deduped
stream must reproduce the batch distinct counts despite every event
being delivered twice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chyme_spark.registry import load_all
from chyme_spark.session import load_table

REGISTRY = load_all()


def test_stream_watermark_equals_closed_batch_windows(spark, sf_dir):
    stream_rows = {
        tuple(r) for r in REGISTRY["d40_stream_watermark"].fn(spark, sf_dir).collect()
    }
    assert stream_rows, "watermarked stream emitted nothing"

    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = REGISTRY["d38_tumbling_window"].fn(spark, sf_dir).select(
        "win_start", "event_type", "n_events"
    )
    batch_rows = {tuple(r) for r in batch.collect()}
    # every emitted streaming window must match its batch twin exactly
    assert stream_rows <= batch_rows
    # and all windows that closed under the final watermark must have been emitted
    closed = {
        tuple(r)
        for r in batch.filter(
            F.to_timestamp("win_start") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
        ).collect()
    }
    assert closed <= stream_rows


def test_foreach_batch_sink_equals_batch(spark, sf_dir, tmp_path):
    """foreachBatch: the exactly-once custom-sink path (the engine's
    analog of the reference's SQS ack/commit, internal/core/task.go:116-129)."""
    from chyme_spark.ops.streaming import _events_stream

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(df, epoch_id):
        # idempotent per-epoch append: parquet subdir keyed by epoch
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    q = (
        _events_stream(spark, sf_dir)
        .select("event_id", "user_id", "value")
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sunk = spark.read.parquet(out).drop("epoch")
    batch = REGISTRY  # noqa: F841 — keep import pattern consistent
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    assert sorted(map(tuple, sunk.collect())) == sorted(map(tuple, ev.collect()))


def _assert_static_join_equals_batch(spark, sf: str) -> None:
    got = {
        (r.c_mktsegment, r.n_events)
        for r in REGISTRY["x_stream_static_join"].fn(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    want = {
        (r.c_mktsegment, r.n)
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def _assert_stream_stream_join_equals_batch(spark, sf: str) -> None:
    got = {
        (r.view_id, r.click_id)
        for r in REGISTRY["x_stream_stream_join"].fn(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"), F.col("ts").alias("vt")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("ct")
    )
    want = {
        (r.view_id, r.click_id)
        for r in views.join(
            clicks,
            (F.col("vu") == F.col("cu"))
            & (F.col("ct") >= F.col("vt"))
            & (F.col("ct") <= F.col("vt") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert got == want


def test_stream_static_join_equals_batch(spark, sf_dir):
    _assert_static_join_equals_batch(spark, sf_dir)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    _assert_stream_stream_join_equals_batch(spark, sf_dir)


def test_stream_joins_equal_batch_at_sf001_oracle_scale(spark):
    """Both x_stream_* joins graduated to full DuckDB oracles in r10
    (single-batch AvailableNow determinism), but the oracle proves
    stream == SQL, not stream == Spark-batch; keep the Spark-side twin
    equality at the SAME sf0.01 the driver's oracle gate uses — 60k
    events, not just the smoke fixture (VERDICT r2 item 7)."""
    sf001 = "/root/testdata/sf0.01"
    _assert_static_join_equals_batch(spark, sf001)
    _assert_stream_stream_join_equals_batch(spark, sf001)


def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    got = {
        (r.event_type, r.n_events)
        for r in REGISTRY["d41_stream_dedup"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.event_type, r.n)
        for r in ev.groupBy("event_type").agg(F.countDistinct("event_id").alias("n")).collect()
    }
    assert got == want


def test_stream_upsert_idempotent_under_redelivery(spark, sf_dir):
    """x_stream_upsert's exactly-once contract: because the merge keeps
    the max-(ts, event_id) row per user (associative, commutative,
    idempotent), processing every event TWICE (at-least-once
    redelivery, the d41 simulation) must produce the byte-identical
    state table as processing it once — and both must equal the batch
    QUALIFY oracle the driver hash-checks."""
    import os
    import shutil
    import tempfile

    from chyme_spark.merge import latest_per_key
    from chyme_spark.ops.streaming import _events_stream

    once = {tuple(r) for r in REGISTRY["x_stream_upsert"].fn(spark, sf_dir).collect()}

    # redelivered run: same op body, stream unioned with itself
    ev = _events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    ev = ev.unionByName(
        _events_stream(spark, sf_dir).select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
    )
    base = tempfile.mkdtemp(prefix="chyme_upsert_redeliver_")
    state_dir = os.path.join(base, "state")

    def apply_batch(batch_df, batch_id):
        s = batch_df.sparkSession
        batch_df = batch_df.withColumn("__ord", F.struct(F.col("ts"), F.col("event_id")))
        merged = (
            s.read.parquet(state_dir).unionByName(batch_df)
            if os.path.exists(state_dir)
            else batch_df
        )
        merged = latest_per_key(merged, ["user_id"], "__ord")
        stage = os.path.join(base, f"stage_{batch_id}")
        merged.write.mode("overwrite").parquet(stage)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.replace(stage, state_dir)

    ckpt = tempfile.mkdtemp(prefix="chyme_upsert_redeliver_ckpt_")
    q = (
        ev.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from chyme_spark.ops.common import ts_str

    twice = {
        tuple(r)
        for r in spark.read.parquet(state_dir)
        .select(
            "user_id",
            ts_str("ts").alias("last_seen"),
            F.col("event_type").alias("last_event_type"),
            F.floor(F.col("value") * 100).cast("long").alias("last_cents"),
        )
        .collect()
    }
    assert twice == once


def test_stream_outer_join_contract(spark, sf_dir):
    """x_stream_outer_join vs the batch LEFT JOIN: (a) matched pairs are
    exactly the batch inner pairs; (b) every null-click emission is a
    genuinely unmatched view (no invented rows); (c) every unmatched
    view whose 30-minute horizon closed strictly before the final
    watermark (max event ts - 10 min) HAS been emitted — only views
    still inside the watermark horizon may legitimately be held back."""
    from datetime import timedelta

    got = REGISTRY["x_stream_outer_join"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    inner = {
        (r.view_id, r.click_id)
        for r in views.join(
            clicks,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    matched_views = {v for v, _ in inner}
    unmatched = {
        r.view_id: r.v_ts
        for r in views.collect()
        if r.view_id not in matched_views
    }

    got_matched = {(r.view_id, r.click_id) for r in got if r.matched}
    got_null = {r.view_id for r in got if not r.matched}
    assert got_matched == inner
    assert got_null <= set(unmatched)  # no invented unmatched rows
    # Completeness: Spark evicts (and null-emits) a left row only when
    # the state watermark clears its horizon, and the internal state
    # watermark lags the event-time watermark by up to the join
    # interval + the other side's delay (observed empirically: the
    # latest unmatched view, horizon closed 25 min before the final
    # watermark, is held at sf0.001). The conservative contract: every
    # unmatched view whose horizon closed more than (30 min interval +
    # 10 min click delay + 10 min view delay) before the final
    # watermark MUST have been emitted.
    max_ts = ev.agg(F.max("ts")).first()[0]
    wm = max_ts - timedelta(minutes=10)
    must_emit = {
        v
        for v, ts in unmatched.items()
        if ts + timedelta(minutes=30) + timedelta(minutes=50) < wm
    }
    assert must_emit, "fixture too small to exercise outer emission"
    missing = must_emit - got_null
    assert not missing, f"{len(missing)} closed-horizon views never emitted"
    # and emission is not vacuous: the overwhelming majority of
    # unmatched views are out
    assert len(got_null) >= 0.9 * len(unmatched)


def test_stream_upsert_kill_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill-restart proof for the foreachBatch upsert: split the events
    table into 4 source files, force one file per micro-batch, STOP the
    query after the first batch commits, then restart from the SAME
    checkpoint. The final state table must equal the batch QUALIFY
    oracle exactly — no lost updates (checkpoint replays nothing it
    committed) and no double-application damage (the max-merge is
    idempotent)."""
    import os
    import shutil
    import time

    from pyspark.sql import functions as SF

    from chyme_spark.merge import latest_per_key

    src = str(tmp_path / "src")
    ev_batch = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    ev_batch.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    base = str(tmp_path / "upsert")
    state_dir = os.path.join(base, "state")
    os.makedirs(base, exist_ok=True)

    def apply_batch(batch_df, batch_id):
        s = batch_df.sparkSession
        batch_df = batch_df.withColumn("__ord", SF.struct(SF.col("ts"), SF.col("event_id")))
        merged = (
            s.read.parquet(state_dir).unionByName(batch_df)
            if os.path.exists(state_dir)
            else batch_df
        )
        merged = latest_per_key(merged, ["user_id"], "__ord")
        stage = os.path.join(base, f"stage_{batch_id}")
        merged.write.mode("overwrite").parquet(stage)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.replace(stage, state_dir)

    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    q = start()
    # wait for at least one batch to COMMIT, then kill mid-stream
    for _ in range(100):
        if os.path.exists(state_dir) and q.lastProgress and q.lastProgress["batchId"] >= 1:
            break
        time.sleep(0.2)
    q.stop()
    assert os.path.exists(state_dir), "no batch committed before the kill"

    # restart from the SAME checkpoint; drain everything left
    q2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = {
        tuple(r)
        for r in spark.read.parquet(state_dir)
        .select("user_id", "ts", "event_id")
        .collect()
    }
    want = {
        tuple(r)
        for r in latest_per_key(
            ev_batch.withColumn("__ord", SF.struct(SF.col("ts"), SF.col("event_id"))),
            ["user_id"],
            "__ord",
        )
        .select("user_id", "ts", "event_id")
        .collect()
    }
    assert got == want


def test_transform_with_state_counts_equal_batch(spark, sf_dir):
    """transformWithStateInPandas twin of x_stream_stateful_counts must
    equal the batch aggregate exactly (integer ten-thousandths state).
    Environment-gated: the operator's Python runner needs a working
    protobuf (this container ships a broken namespace stub) — the same
    honest skip as the ffmpeg codec gate."""
    import pytest

    from chyme_spark.ops.streaming import (
        stateful_running_counts_tws,
        transform_with_state_supported,
    )

    if not transform_with_state_supported():
        pytest.skip("google.protobuf broken in container: transformWithState runner cannot start")

    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in stateful_running_counts_tws(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        (r.user_id, r.n, r.v)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("v"),
        )
        .collect()
    }
    assert got == want


def test_tws_sessions_match_apply_in_pandas_twin(spark, sf_dir):
    """The transformWithState TIMER sessionizer must emit the byte-
    identical closed-session set as the applyInPandasWithState twin
    (x_stream_session_timeout), which is itself pinned ==batch-d37-
    minus-trailing-open by tests/test_ann_and_state.py. Transitivity
    gives the timer path the full batch contract. Environment-gated on
    the protobuf runtime, same as the TWS counts test."""
    import pytest

    from chyme_spark.ops.streaming import (
        stream_tws_sessions,
        transform_with_state_supported,
    )

    if not transform_with_state_supported():
        pytest.skip("google.protobuf broken in container: transformWithState runner cannot start")

    from chyme_spark.registry import load_all

    reg = load_all()
    tws = sorted(map(tuple, stream_tws_sessions(spark, sf_dir).collect()))
    twin = sorted(
        map(tuple, reg["x_stream_session_timeout"].fn(spark, sf_dir).collect())
    )
    assert tws == twin


def test_state_partitions_scale_adaptive(monkeypatch, sf_dir):
    """The streaming state-partition count derives from input bytes:
    floored at 4 at fixture scale, capped at the session parallelism,
    env-overridable (spark_optimization_guide §2 — scale-adaptive, not
    a constant tuned for local mode or the cluster)."""
    from chyme_spark.ops import streaming as st
    from chyme_spark.session import default_parallelism

    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTITIONS", raising=False)
    n = st._state_partitions(sf_dir)
    assert 4 <= n <= max(4, default_parallelism())
    # a 2 MB fixture must not pay one state store per host core
    assert n == 4

    # big input saturates the session parallelism (cap, not unbounded)
    import os

    real_getsize = os.path.getsize
    monkeypatch.setattr(
        st.os.path, "getsize", lambda p: 10 * (1 << 40)
    )  # 10 TiB
    assert st._state_partitions(sf_dir) == default_parallelism()
    monkeypatch.setattr(st.os.path, "getsize", real_getsize)

    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "7")
    assert st._state_partitions(sf_dir) == 7


def test_scaled_state_conf_restores_session_parallelism(spark, sf_dir):
    """The per-query pin must not leak into subsequent batch queries."""
    from chyme_spark.ops import streaming as st

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with st._scaled_state_conf(spark, sf_dir):
        assert spark.conf.get(key) == str(st._state_partitions(sf_dir))
    assert spark.conf.get(key) == before
