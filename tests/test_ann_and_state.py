"""Quality/equivalence assertions for the approximate + stateful ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from chyme_spark.registry import load_all
from chyme_spark.session import load_table

REGISTRY = load_all()


def test_stateful_stream_counts_equal_batch(spark, sf_dir):
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in REGISTRY["x_stream_stateful_counts"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
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
    # integer ten-thousandths state (r8): stream == batch EXACTLY — the
    # stateful op accumulates the same DECIMAL(18,4) quanta the batch
    # sum sees, so no tolerance is needed
    assert got == want


def test_ivf_ann_overlaps_brute_force(spark, sf_dir):
    ivf = REGISTRY["x_ann_ivf_topk"].fn(spark, sf_dir).collect()
    brute = REGISTRY["d44_cosine_topk"].fn(spark, sf_dir).collect()
    assert len(ivf) > 0
    ivf_pairs = {(r.qid, r.vec_id) for r in ivf}
    brute_pairs = {(r.qid, r.vec_id) for r in brute}
    # IVF with nprobe=2/16 must recover a meaningful share of the true
    # top-k (random 64-dim embeddings: clusters are weak, so demand
    # overlap, not equality)
    assert len(ivf_pairs & brute_pairs) >= len(brute_pairs) // 4
    # and every IVF hit must carry the same cosine the brute path computes
    brute_cos = {(r.qid, r.vec_id): r.cosine for r in brute}
    for r in ivf:
        if (r.qid, r.vec_id) in brute_cos:
            assert abs(r.cosine - brute_cos[(r.qid, r.vec_id)]) < 1e-9


def test_stream_session_timeout_matches_batch(spark, sf_dir):
    """Every session the stream emits as CLOSED must be exactly a d37
    batch session, and the closed set must cover every batch session
    except (at most) each user's trailing one — the only session whose
    closure legitimately depends on watermark timeout timing."""
    closed = REGISTRY["x_stream_session_timeout"].fn(spark, sf_dir).collect()
    batch = REGISTRY["d37_sessionization"].fn(spark, sf_dir).collect()
    batch_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch
    }
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_start"] > cur["session_start"]:
            last_per_user[r["user_id"]] = r
    trailing = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in last_per_user.values()
    }
    closed_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed
    }
    assert closed_keys <= batch_keys  # no invented sessions
    assert batch_keys - trailing <= closed_keys  # all non-trailing closed
    # EXACT value equality (ADVICE r6): the stream accumulates integer
    # ten-thousandths mirroring the batch DECIMAL(18,4) sum + HALF_UP
    # cent rounding, so stream == batch to the bit — no tolerance
    batch_val = {
        (r["user_id"], r["session_start"]): r["session_value"] for r in batch
    }
    for r in closed:
        assert r["session_value"] == batch_val[(r["user_id"], r["session_start"])]
