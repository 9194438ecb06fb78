"""Round-10 operator contracts.

x_linear_probe_fit: the closed-form OLS from exact integer sufficient
statistics must agree with an independent float implementation (numpy
lstsq/polyfit) to float tolerance, and degenerate groups must yield
NULL slope/r2 instead of a divide-by-zero.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from chyme_spark.registry import REGISTRY, load_all
from chyme_spark.session import load_table

load_all()


@pytest.fixture(scope="module")
def sf001() -> str:
    return "/root/testdata/sf0.001"


def test_linear_probe_fit_matches_numpy(spark, sf001):
    got = {r.lang: r for r in REGISTRY["x_linear_probe_fit"].fn(spark, sf001).collect()}
    docs = (
        load_table(spark, sf001, "documents")
        .select(
            "lang",
            F.col("n_chars").cast("long").alias("x"),
            F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias("y"),
        )
        .collect()
    )
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append((r.x, r.y))
    assert set(got) == set(by_lang)
    for lang, pts in by_lang.items():
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        pred = slope * x + intercept
        ss_res = float(np.sum((y - pred) ** 2))
        ss_tot = float(np.sum((y - y.mean()) ** 2))
        r2 = 1.0 - ss_res / ss_tot
        row = got[lang]
        assert row.n == len(pts)
        # numpy fits in floats; the op fits from exact integer moments —
        # agree to ~1e-6 relative, which is far tighter than any real
        # difference between implementations and far looser than the
        # op's own 6-dp rounding could absorb being WRONG.
        assert math.isclose(row.slope, slope, rel_tol=1e-6, abs_tol=1e-6), (lang, row.slope, slope)
        assert math.isclose(row.intercept, intercept, rel_tol=1e-6, abs_tol=1e-4), (lang, row.intercept, intercept)
        assert math.isclose(row.r2, r2, rel_tol=1e-6, abs_tol=1e-6), (lang, row.r2, r2)
        assert 0.0 <= row.r2 <= 1.0


def test_linear_probe_fit_degenerate_group_yields_null(spark, tmp_path):
    """All-equal x (zero variance) must produce NULL slope/intercept/r2
    through the NULLIF guard — same behavior the oracle's SQL has."""
    import pandas as pd

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b", "a b c", "a"],
            "lang": ["xx", "xx", "xx"],
            "source": ["s", "s", "s"],
            "n_chars": [7, 7, 7],  # zero x-variance
        }
    ).to_parquet(p)
    out = REGISTRY["x_linear_probe_fit"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n == 3
    assert row.slope is None and row.r2 is None


def test_eval_contamination_planted_duplicate(spark, tmp_path):
    """Planting an exact copy of an eval vector in the train partition
    must surface in the report: n_hits >= 1, max_cos == 1.0, and the
    closest_train_id pointing at the planted copy. Orthogonal train
    vectors must never flag (n_hits 0, max_cos 0.0). Dimensions follow
    the fixture schema (array<float> embedding)."""
    import pandas as pd

    dim = 8
    e = [0.0] * dim

    def unit(i):
        v = list(e)
        v[i] = 1.0
        return v

    rows = []
    # 16 eval vectors (vec_id < 16): unit vectors on axes 0..7, repeated
    for i in range(16):
        rows.append((i, unit(i % dim)))
    # train: an exact copy of eval vector 3, plus vectors orthogonal to
    # every eval axis... dim 8 has no free axis, so scale axis pairs the
    # evals don't match exactly (cos < 1 with every eval)
    rows.append((100, unit(3)))  # planted duplicate of eval 3
    mixed = [0.5] * dim  # cos = 0.5/|mixed| ~ 0.354 with every unit eval
    rows.append((101, mixed))
    pd.DataFrame({"vec_id": [r[0] for r in rows],
                  "embedding": [r[1] for r in rows]}).to_parquet(
        str(tmp_path / "embeddings.parquet"))
    out = {r.eval_id: r for r in
           REGISTRY["x_eval_contamination"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(16))
    hit = out[3]
    assert hit.max_cos == 1.0
    assert hit.n_hits >= 1
    assert hit.closest_train_id == 100
    # eval 0 matches no train vector above tau: unit(0) . unit(3) = 0,
    # unit(0) . mixed = 0.3536 < 0.4
    miss = out[0]
    assert miss.n_hits == 0
    assert miss.max_cos < 0.4
    assert miss.closest_train_id == 101  # best of the non-hits, tie-free


def test_winnowing_short_doc_edges(spark, tmp_path):
    """Docs shorter than k tokens yield (0, 0, 0, 0) — not the
    greatest(NULL,1)=1 window-count trap — and a doc with exactly k
    tokens yields one gram, one (clamped) window, one fingerprint."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["too short", "a b c d e", "x y z w v u t s"],
            "lang": ["xx"] * 3,
            "source": ["s"] * 3,
            "n_chars": [9, 9, 15],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           REGISTRY["x_winnowing_fingerprint"].fn(spark, str(tmp_path)).collect()}
    assert (out[1].n_grams, out[1].n_windows, out[1].n_fps, out[1].n_shared_fps) == (0, 0, 0, 0)
    assert (out[2].n_grams, out[2].n_windows, out[2].n_fps) == (1, 1, 1)
    # 8 tokens -> 4 grams -> 1 window of 4 -> 1 fingerprint
    assert (out[3].n_grams, out[3].n_windows, out[3].n_fps) == (4, 1, 1)
    assert out[2].n_shared_fps == 0 and out[3].n_shared_fps == 0
