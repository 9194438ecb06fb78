"""User-extension surface: Python UDF, vectorized pandas_udf,
grouped-map applyInPandas.

SURVEY.md §2B D-47..D-49 — the engine equivalents of the reference's
only extension points: name-keyed hook/executor/template registries
(ref ``internal/worker/hooks/hooks.go:10-35``,
``internal/core/executor.go:51-80``).

Performance contract demonstrated here deliberately:
  * D-47 is the row-at-a-time Python UDF — correct but the slow path
    (per-row serde); it exists to prove the surface and so tests can
    compare it against the native D-28 expression;
  * D-48/D-49 are the Arrow paths (pandas_udf / applyInPandas) — the
    only sanctioned way to run Python over 100 TB.

Float discipline: the pandas computations output RAW doubles (products
and min/max-normalizations are single IEEE ops, bit-identical across
engines); no rounding is applied, so the oracle hash matches exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chyme_spark.ops.relational import _URL_SQL, synthetic_urls
from chyme_spark.registry import query


@F.udf(T.StringType())
def _ext_udf(url):
    # no type hints: `str | None` trips pyspark's eval-type inference
    # into a UserWarning on every import (pyspark/sql/udf.py:134)
    """Row-at-a-time re-implementation of the extension parse (the hook
    analog, ref ``internal/worker/hooks/hooks.go:10-35``)."""
    if url is None:
        return None
    path = url.rsplit("/", 1)[-1]
    if "." not in path:
        return ""
    return path.rsplit(".", 1)[-1].lower()


@query(
    "d47_python_udf",
    oracle=f"""
    WITH catalog AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    SELECT doc_id, lower(regexp_extract(url, '\\.([A-Za-z0-9]+)$', 1)) AS ext
    FROM catalog
    """,
    doc="D-47 Python UDF (slow path, proves surface); semantics identical to native D-28 ext parse",
)
def d47_python_udf(spark: SparkSession, sf: str) -> DataFrame:
    cat = synthetic_urls(spark, sf)
    return cat.select("doc_id", _ext_udf("url").alias("ext"))


@F.pandas_udf(T.DoubleType())
def _net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    # vectorized over Arrow batches; two IEEE ops -> bit-exact vs SQL
    return price * (1.0 - discount)


@query(
    "d48_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS net_price
    FROM lineitem
    """,
    doc="D-48 vectorized scalar pandas_udf (Arrow batches) — the sanctioned Python hot path",
)
def d48_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    from chyme_spark.session import load_table

    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


def _minmax_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
    if hi > lo:
        pdf["bal_norm"] = (pdf["c_acctbal"] - lo) / (hi - lo)
    else:
        pdf["bal_norm"] = 0.5
    return pdf[["c_custkey", "c_nationkey", "c_acctbal", "bal_norm"]]


@query(
    "d49_apply_in_pandas",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CASE WHEN max(c_acctbal) OVER w > min(c_acctbal) OVER w
                THEN (c_acctbal - min(c_acctbal) OVER w)
                     / (max(c_acctbal) OVER w - min(c_acctbal) OVER w)
                ELSE 0.5 END AS bal_norm
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey)
    """,
    doc="D-49 grouped-map applyInPandas: per-nation min-max normalization; window-SQL oracle",
)
def d49_apply_in_pandas(spark: SparkSession, sf: str) -> DataFrame:
    from chyme_spark.session import load_table

    cust = load_table(spark, sf, "customer")
    return cust.groupBy("c_nationkey").applyInPandas(
        _minmax_normalize,
        schema="c_custkey long, c_nationkey int, c_acctbal double, bal_norm double",
    )
