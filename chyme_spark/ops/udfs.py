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


@query(
    "x_python_udtf",
    # the 4th Python-extension kind (UDTF, Spark 3.5+/4.x): one input
    # row -> N output rows with per-row Python logic. Surface demo like
    # d47 (row-at-a-time = slow path); production fan-out stays in
    # explode/mapInPandas.
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents WHERE doc_id < 20)
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token,
           CAST(strlen(toks[i]) AS BIGINT) AS token_len
    FROM t CROSS JOIN LATERAL unnest(generate_series(1, len(toks))) AS u(i)
    """,
    doc="Python UDTF (table function): tokenize one doc row into (pos, token, len) rows — the UDTF extension surface, lateral-joined",
)
def x_python_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """UDTF surface proof (the generator analog of the reference's
    template fan-out, 1 resource -> N tasks, ref
    ``internal/tasker/template.go:26-35``). Bounded to 20 docs because a
    row-at-a-time Python UDTF is the demo path, not the 100 TB path —
    the same fan-out at scale is ``posexplode`` (see D-33/d45)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, token string, token_len bigint")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for pos, tok in enumerate(text.lower().split(" ")):
                yield pos, tok, len(tok)

    from chyme_spark.session import load_table

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 20)
    return docs.lateralJoin(
        Tokenize(F.col("text").outer())
    ).select("doc_id", "pos", "token", "token_len")


@F.pandas_udf(T.LongType())
def _lower_median(v: pd.Series) -> int:
    # exact discrete lower median: sorted[(n-1)//2] — matches DuckDB
    # quantile_disc(x, 0.5) (probed: n=2 -> first, n=4 -> second,
    # n=5 -> third). Integer in, integer out: no interpolation, no
    # float hash hazard.
    s = v.sort_values().to_numpy()
    return int(s[(len(s) - 1) // 2])


@query(
    "x_pandas_grouped_agg",
    # The third Pandas-UDF shape (after D-48 SCALAR and D-49
    # GROUPED_MAP): a GROUPED_AGG pandas_udf — a custom aggregate the
    # built-in functions cannot express (exact discrete order statistic
    # chosen here), evaluated per group over Arrow batches. Spark feeds
    # the WHOLE group to the UDF (no partial aggregation), so group
    # cardinality must be bounded — |event_type| groups of fact-share
    # size each; for high-cardinality keys prefer approx_percentile or
    # the x_rolling_median two-pass exact pattern.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_disc(CAST(floor(value * 100) AS BIGINT), 0.5)
                AS BIGINT) AS median_cents
    FROM events GROUP BY event_type
    """,
    doc="GROUPED_AGG pandas_udf: exact discrete lower-median per group over Arrow batches — the custom-aggregate Python surface",
)
def x_pandas_grouped_agg(spark: SparkSession, sf: str) -> DataFrame:
    from chyme_spark.session import load_table

    ev = load_table(spark, sf, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    # Spark forbids mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the count comes
    # from a separate JVM aggregate joined back on the 5-row key
    med = ev.groupBy("event_type").agg(_lower_median("cents").alias("median_cents"))
    cnt = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    return cnt.join(med, "event_type").select("event_type", "n", "median_cents")
