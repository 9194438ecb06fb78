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


def load_all() -> dict[str, Query]:
    """Import every ops module so its @query decorators run; return REGISTRY."""
    from chyme_spark.ops import analytics, asof, binary, llm, pipeline, relational, scalar, streaming, subqueries, udfs, windows  # noqa: F401

    return REGISTRY
