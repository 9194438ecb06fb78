"""Semantic tests for the training-data assembly ops (ops/training.py)."""

from __future__ import annotations

from chyme_spark.registry import load_all

REGISTRY = load_all()


def test_np_cosine_equals_jvm_cosine(spark, sf_dir):
    """The numpy matmul path and the JVM higher-order-function path are
    result-identical (same rounding, same tie-break) — physical strategy
    must never change the answer."""
    jvm = REGISTRY["d44_cosine_topk"].fn(spark, sf_dir)
    np_ = REGISTRY["x_cosine_topk_np"].fn(spark, sf_dir)
    jvm_rows = {(r["qid"], r["vec_id"], r["cosine"]) for r in jvm.collect()}
    np_rows = {(r["qid"], r["vec_id"], r["cosine"]) for r in np_.collect()}
    assert jvm_rows == np_rows


def test_sequence_pack_offsets_contiguous(spark, sf_dir):
    """Within each group, offsets are the exact running sum of token
    counts (no gaps, no overlaps) and every doc appears exactly once."""
    df = REGISTRY["x_sequence_pack"].fn(spark, sf_dir)
    rows = sorted(
        ((r["grp"], r["doc_id"], r["n_tokens"], r["off"], r["pack_seq"]) for r in df.collect())
    )
    n_docs = df.count()
    assert len({(g, d) for g, d, *_ in rows}) == n_docs
    expected_off: dict[int, int] = {}
    for grp, _doc, n_tok, off, pack_seq in rows:
        assert off == expected_off.get(grp, 0), (grp, _doc)
        assert pack_seq == off // 2048
        expected_off[grp] = off + n_tok


def test_sequence_pack_group_parallelism(spark, sf_dir):
    """Packing must not collapse to a single global stream — the window
    partitions by the hash group (scale contract)."""
    df = REGISTRY["x_sequence_pack"].fn(spark, sf_dir)
    n_groups = df.select("grp").distinct().count()
    assert n_groups > 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a global-order window would show an Exchange SinglePartition
    assert "SinglePartition" not in plan


def test_neardup_survivors_one_keep_per_cluster(spark, sf_dir):
    df = REGISTRY["x_neardup_survivors"].fn(spark, sf_dir)
    rows = df.collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cluster, members in by_cluster.items():
        kept = [r for r in members if r["keep"]]
        assert len(kept) == 1, cluster
        best = max(members, key=lambda r: (r["quality"], -r["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]


def test_interval_join_bucketed_no_nested_loop(spark, sf_dir):
    """The bucketed range join must plan as an equi-join (the point),
    and must agree exactly with the naive nested-loop formulation."""
    df = REGISTRY["x_interval_join_bucketed"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan

    from pyspark.sql import functions as F
    from chyme_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    iv = (
        ev.filter(F.col("user_id") < 50)
        .groupBy(F.col("user_id").alias("iv_user"))
        .agg(F.min("ts").alias("lo"))
        .withColumn("hi", F.col("lo") + F.expr("INTERVAL 6 HOURS"))
    )
    naive = (
        ev.join(iv, (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
        .groupBy("iv_user")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("sum_value"),
            F.min("event_id").alias("first_event"),
        )
    )
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want


def test_approx_quantiles_accuracy_contract(spark, sf_dir):
    """GK-sketch quantiles must land within the value range spanned by
    the exact neighbors: p50/p90 within [min, max] and ordered."""
    approx = {r["event_type"]: r for r in REGISTRY["x_approx_quantiles"].fn(spark, sf_dir).collect()}
    exact = {r["event_type"]: r for r in REGISTRY["x_percentiles"].fn(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    from pyspark.sql import functions as F
    from chyme_spark.session import load_table

    # rank-based bracket (holds at any group size): the sketch's pXX
    # must land between the exact neighboring quantiles, because
    # approx_percentile returns an actual data value near the rank
    brackets = {
        r["event_type"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.45)").alias("p45"),
            F.expr("percentile(value, 0.55)").alias("p55"),
            F.expr("percentile(value, 0.85)").alias("p85"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    for et, a in approx.items():
        e, b = exact[et], brackets[et]
        assert e["v_min"] <= a["p50"] <= a["p90"] <= a["p99"] <= e["v_max"]
        assert b["p45"] <= a["p50"] <= b["p55"]
        assert b["p85"] <= a["p90"] <= b["p95"]


def test_skew_salted_join_equals_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F
    from chyme_spark.ops.common import dec, money
    from chyme_spark.session import load_table

    salted = REGISTRY["x_skew_salted_join"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("nkey", F.col("user_id") % 25)
    nat = load_table(spark, sf_dir, "nation")
    plain = (
        ev.join(nat, F.col("nkey") == F.col("n_nationkey"))
        .groupBy("event_type", "n_name")
        .agg(F.count("*").alias("n_rows"), money(F.sum(dec("value"))).alias("sum_value"))
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_compression_ratio_ordering_contract(spark, sf_dir):
    """Repetitive text must compress further than diverse text, and the
    ratio must be deterministic across runs."""
    import zlib

    df = REGISTRY["x_compression_ratio"].fn(spark, sf_dir)
    rows = {r["doc_id"]: r["compression_ratio"] for r in df.collect()}
    rows2 = {r["doc_id"]: r["compression_ratio"] for r in df.collect()}
    assert rows == rows2  # deterministic
    assert all(0.0 < v <= 1.5 for v in rows.values())

    rep_text, div_text = "spam " * 200, " ".join(f"w{i}" for i in range(200))
    rep = len(zlib.compress(rep_text.encode(), 6)) / len(rep_text)
    div = len(zlib.compress(div_text.encode(), 6)) / len(div_text)
    assert rep < div  # the signal the filter cuts on
