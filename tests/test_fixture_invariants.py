"""Fixture invariants that pinned cross-engine identities silently rely on.

ADVICE r6 (analytics.py): several oracle-pinned quotients use the
identity  Spark `div` (truncate toward zero) == DuckDB `//` (floor),
which holds ONLY for non-negative operands:

  * x_interpolate — barycentric interpolant terms
  * x_partial_agg_merge / x_markov_transitions — scaled quotients
  * the TWAP-style `CAST(sum*10000 AS BIGINT) // n` rounding pins

The operands are built from ``events.value``, so the whole identity
class rests on ``value >= 0`` in every fixture. Nothing guarded that —
a future regenerated fixture with negative values would surface as an
opaque off-by-one-ulp oracle divergence. This test makes the
precondition explicit and names the dependents, so a violation fails
HERE with a message instead of there with a hash mismatch.
"""

from __future__ import annotations

import os

import duckdb
import pytest

_SFS = ["sf0.001", "sf0.01", "sf0.1"]


@pytest.mark.parametrize("sf", _SFS)
def test_events_value_nonnegative(sf):
    path = f"/root/testdata/{sf}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    (lo,) = duckdb.sql(f"SELECT min(value) FROM '{path}'").fetchone()
    assert lo is not None and lo >= 0, (
        f"{sf}: events.value has negative values (min={lo}) — the Spark-div"
        " == DuckDB-// identity behind x_interpolate, x_partial_agg_merge,"
        " x_markov_transitions and the TWAP rounding pins no longer holds;"
        " rewrite those quotients with explicit floor() on both engines"
        " before trusting their oracles"
    )


@pytest.mark.parametrize("sf", _SFS)
def test_documents_text_nonempty(sf):
    """x_image_phash_neardup cycles byte indexes modulo the payload
    length — an EMPTY document would divide by zero, where the two
    engines disagree ('0x'::BIGINT errors in DuckDB; conv('', 16, 10)
    is 0 in Spark). The fixture guarantees non-empty text; this makes
    the precondition explicit so a regenerated fixture fails HERE."""
    path = f"/root/testdata/{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    (lo,) = duckdb.sql(f"SELECT min(strlen(text)) FROM '{path}'").fetchone()
    assert lo is not None and lo > 0, (
        f"{sf}: empty document text — guard the phash byte-cycle (i % bl)"
        " with a length filter on both engines before trusting its oracle"
    )


@pytest.mark.parametrize("sf", _SFS)
def test_documents_lang_set_is_the_five_fixture_languages(sf):
    """x_transpose_stats' oracle hardcodes the five language columns
    (de/en/es/fr/zh) because DataFrame.transpose derives column names
    from the DATA — a regenerated fixture with a different language set
    would make the Spark side grow/lose a column while the oracle kept
    the old five, an opaque schema mismatch. Fail HERE with the real
    reason instead. (x_auc_score / x_calibration_bins / x_keyness_tokens
    only need 'en' to exist, which this also guarantees.)"""
    path = f"/root/testdata/{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    langs = [r[0] for r in duckdb.sql(
        f"SELECT DISTINCT lang FROM '{path}' ORDER BY lang").fetchall()]
    assert langs == ["de", "en", "es", "fr", "zh"], (
        f"{sf}: documents.lang = {langs} — x_transpose_stats' oracle"
        " hardcodes columns de/en/es/fr/zh and must be regenerated to"
        " match before its hash check can pass"
    )
