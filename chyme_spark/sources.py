"""Sources & sinks — the engine's load/store surface.

The reference's I/O surface is the S3 blob store wrapper (list /
download / upload / delete, single-object and prefix variants, ref
``pkg/aws/s3.go:28-39``) plus JSON documents on the SQS wire (ref
``pkg/aws/sqs.go:46``). The engine generalizes both: columnar formats
(parquet/orc) as the default, line formats (json/csv) for interchange,
``binaryFile`` for opaque blobs, and any ``scheme://`` the Hadoop
filesystem layer resolves (s3a, file, hdfs) — write targets are the
upload path, reads are the download path.

Malformed-record policy: the reference silently skips corrupt queue
messages (ref ``internal/core/task.go:98-101``); here PERMISSIVE mode
captures them in a ``_corrupt_record`` column and
:func:`split_corrupt` routes them to the quarantine table instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv", "binaryFile")

CORRUPT_COL = "_corrupt_record"


# Formats/sources needing jars or services absent from this container,
# gated with actionable errors (the engine-level analog of the
# reference's pluggable loader registry, ref internal/core/loader.go:26-91)
_GATED_FORMATS = {
    "delta": "Delta Lake needs the delta-spark jars on the classpath "
    "(spark.jars.packages=io.delta:delta-spark_2.13:<ver> and the Delta "
    "catalog extensions); emulate MERGE with chyme_spark.merge meanwhile",
    "iceberg": "Apache Iceberg needs iceberg-spark-runtime jars and a catalog conf",
    "hudi": "Apache Hudi needs hudi-spark-bundle jars",
    "kafka": "Kafka source/sink needs spark-sql-kafka-0-10 jars and brokers; "
    "the file-source streaming path (ops/streaming.py) is the in-container equivalent",
    "jdbc": "JDBC needs a driver jar and a reachable database",
}


def _check_format(fmt: str) -> None:
    if fmt in _GATED_FORMATS:
        raise NotImplementedError(f"{fmt}: {_GATED_FORMATS[fmt]}")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Bulk store (ref upload ``internal/core/loader.go:199-286``).

    ``partition_by`` is the scale lever: a 100 TB table partitioned by a
    low-cardinality column (date, template, lang) turns downstream
    equality filters into partition pruning — entire directories are
    skipped at planning time.
    """
    _check_format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Load (ref download ``internal/core/loader.go:148-195``).

    Always pass an explicit schema for line formats in production —
    inference costs an extra full scan and can silently widen types.
    """
    _check_format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """PERMISSIVE JSON read that captures malformed lines instead of
    dropping them (fixes the reference's silent skip,
    ``internal/core/task.go:98-101``)."""
    full_schema = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantine rows)."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    # Spark requires caching a PERMISSIVE frame before referencing the
    # corrupt column in a filter (it is populated at parse time)
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad
