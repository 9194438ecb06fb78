"""Every registered query runs at sf0.001 and returns a sane DataFrame.

Physical-plan assertions live here too: D-08 must actually broadcast,
scans must show pushed filters — correctness of the *plan*, not just
the rows (SURVEY §4).
"""

from __future__ import annotations

import pytest

from chyme_spark.registry import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = REGISTRY["d08_broadcast_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = REGISTRY["d03_filter"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_scan_prunes_columns(spark, sf_dir):
    df = REGISTRY["d03_filter"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema  # unused column must not be read


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
