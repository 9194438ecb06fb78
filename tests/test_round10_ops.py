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
