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


# ---------------------------------------------------------------------------
# chyme_listing: the recursive object lister as a first-class Spark data
# source (Python Data Source API, Spark 4). Parity: the reference's BFS
# lister + errgroup per-prefix fan-out (ref pkg/aws/s3.go:63-80, 311-338)
# becomes `spark.read.format("chyme_listing").options(...)` — planning
# (one driver page of top-level entries -> InputPartitions), execution
# (per-prefix recursion on executors), and schema all inside Spark's own
# source machinery instead of a hand-rolled helper.
# ---------------------------------------------------------------------------

try:  # Python Data Source API needs pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _PrefixPartition(InputPartition):
        def __init__(self, prefix: str, is_file: bool):
            self.prefix = prefix
            self.is_file = is_file

    class ListingReader(DataSourceReader):
        def __init__(self, options: dict):
            self.root = options.get("path") or options.get("root")
            if not self.root:
                raise ValueError("chyme_listing requires option 'path'")
            self.max_depth = int(options["depth"]) if options.get("depth") else None

        def partitions(self):
            # driver touches ONE non-recursive page (the reference's
            # first ListObjectsV2 call); every subtree becomes its own
            # input partition so recursion runs on executors
            from pyarrow import fs as pafs

            root = self.root if "://" in self.root else f"file://{self.root}"
            fs, base = pafs.FileSystem.from_uri(root)
            infos = fs.get_file_info(pafs.FileSelector(base.rstrip("/"), recursive=False))
            scheme = root.split("://", 1)[0]
            parts = [
                _PrefixPartition(f"{scheme}://{i.path}", i.type == pafs.FileType.File)
                for i in infos
                if i.type in (pafs.FileType.File, pafs.FileType.Directory)
            ]
            return parts or [_PrefixPartition(root, False)]

        def read(self, partition):
            from pyarrow import fs as pafs

            root = self.root if "://" in self.root else f"file://{self.root}"
            scheme = root.split("://", 1)[0]
            base_depth = root.split("://", 1)[1].rstrip("/").count("/")

            def mtime_ms(i):
                return i.mtime_ns // 1_000_000 if i.mtime_ns is not None else None

            fs, path = pafs.FileSystem.from_uri(partition.prefix)
            if partition.is_file:
                info = fs.get_file_info(path)
                yield (partition.prefix, info.size, mtime_ms(info))
                return
            for i in fs.get_file_info(pafs.FileSelector(path, recursive=True)):
                if i.type != pafs.FileType.File:
                    continue
                depth = i.path.count("/") - base_depth - 1
                if self.max_depth is not None and depth > self.max_depth:
                    continue
                yield (f"{scheme}://{i.path}", i.size, mtime_ms(i))

    class ListingStreamReader(SimpleDataSourceStreamReader):
        """Streaming face of the lister: each micro-batch emits the
        files that ARRIVED since the last offset — the reference's
        perpetual ingest/tasker poll loop (ref ``cmd/tasker.go:85-99``)
        as a first-class streaming source instead of a sleep loop.

        Offset = ``{"m": <max mtime_ms>, "at": [urls at that mtime]}``:
        a file is new iff its mtime is past the watermark, or equal to
        it but not in the boundary set — so same-millisecond arrivals
        are neither dropped nor duplicated. The offset stays O(files in
        one millisecond), not O(history).

        Incremental listing: the reader memoizes each directory's
        ``(mtime_ns, file rows, subdirs)``. A micro-batch walks the
        directory TREE; a directory whose mtime is unchanged since the
        memo reuses its memoized children without a listing call, paying
        only one batched stat for fresh subdir mtimes — so a batch over
        an unchanged tree costs O(directories) stats and ZERO file
        listings instead of O(files). The reference's poll loop re-lists
        everything every tick (ref ``cmd/tasker.go:85-99``); at 100 M
        objects that full re-list is the bottleneck this prunes away.

        Safety rules that keep the memo exact:

        * a memo is trusted only once the directory's mtime is older
          than ``_SLACK_NS`` — directory timestamps have coarse
          granularity, so a file landing in the same clock tick as the
          listing could otherwise be missed forever;
        * a directory entry without an mtime (object stores synthesize
          prefix entries; pyarrow reports ``mtime_ns None``) is never
          memoized — those subtrees fall back to a real listing;
        * in-place modification of an existing file does not bump the
          parent directory mtime and is NOT an arrival — object-store
          parity (S3 objects are immutable; the reference likewise keys
          on object creation).

        A fresh reader (query restart) starts with a cold memo: the
        first batch is a full listing and the offset filter keeps
        exactly-once delivery, so the memo is a pure I/O optimization
        with no correctness footprint.
        """

        _SLACK_NS = 2_000_000_000  # trust memos only past this age (2 s)

        def __init__(self, options: dict):
            self.root = options.get("path") or options.get("root")
            if not self.root:
                raise ValueError("chyme_listing requires option 'path'")
            self.max_depth = int(options["depth"]) if options.get("depth") else None
            # dir path -> (mtime_ns, [file rows], [(subdir path, mtime_ns)])
            self._memo: dict[str, tuple[int, list, list]] = {}
            self.n_dir_lists = 0  # instrumentation: non-recursive listings issued
            self.n_dir_stats = 0  # instrumentation: batched stat calls issued

        def _list(self):
            import time

            from pyarrow import fs as pafs

            root = self.root if "://" in self.root else f"file://{self.root}"
            scheme = root.split("://", 1)[0]
            fs, base = pafs.FileSystem.from_uri(root)
            base = base.rstrip("/")
            base_depth = base.count("/")
            now_ns = time.time_ns()

            def list_dir(path):
                """One non-recursive listing -> (file rows, subdirs with mtimes)."""
                self.n_dir_lists += 1
                files, subs = [], []
                for i in fs.get_file_info(pafs.FileSelector(path, recursive=False)):
                    if i.type == pafs.FileType.File:
                        if (
                            self.max_depth is not None
                            and (i.path.count("/") - base_depth - 1) > self.max_depth
                        ):
                            continue
                        mt = i.mtime_ns // 1_000_000 if i.mtime_ns is not None else 0
                        files.append((f"{scheme}://{i.path}", i.size, mt))
                    elif i.type == pafs.FileType.Directory:
                        subs.append((i.path, i.mtime_ns))
                return files, subs

            self.n_dir_stats += 1
            root_info = fs.get_file_info(base)
            stack = [(base, root_info.mtime_ns)]
            while stack:
                path, mtime = stack.pop()
                memo = self._memo.get(path)
                if (
                    memo is not None
                    and mtime is not None
                    and memo[0] == mtime
                    and mtime + self._SLACK_NS < now_ns
                ):
                    files, subs = memo[1], memo[2]
                    if subs:  # refresh subdir mtimes: one batched stat, no listing
                        self.n_dir_stats += 1
                        fresh = fs.get_file_info([p for p, _ in subs])
                        subs = [
                            (i.path, i.mtime_ns)
                            for i in fresh
                            if i.type == pafs.FileType.Directory
                        ]
                else:
                    files, subs = list_dir(path)
                    if mtime is not None:
                        self._memo[path] = (mtime, files, subs)
                yield from files
                for sub in subs:
                    # a subtree whose shallowest files already exceed the
                    # depth bound is pruned without ever being listed
                    if (
                        self.max_depth is not None
                        and (sub[0].count("/") - base_depth) > self.max_depth
                    ):
                        continue
                    stack.append(sub)

        def initialOffset(self) -> dict:
            return {"m": -1, "at": []}

        def read(self, start: dict):
            rows = [
                r
                for r in self._list()
                if r[2] > start["m"] or (r[2] == start["m"] and r[0] not in start["at"])
            ]
            if not rows:
                return iter([]), start
            m = max(r[2] for r in rows + [(None, None, start["m"])])
            at = [r[0] for r in rows if r[2] == m] + (start["at"] if m == start["m"] else [])
            return iter(rows), {"m": m, "at": sorted(at)}

        def readBetweenOffsets(self, start: dict, end: dict):
            # replay for recovery: everything past `start` up to `end`
            return iter(
                r
                for r in self._list()
                if (r[2] > start["m"] or (r[2] == start["m"] and r[0] not in start["at"]))
                and (r[2] < end["m"] or (r[2] == end["m"] and r[0] in end["at"]))
            )

    class ListingDataSource(DataSource):
        """``spark.read.format("chyme_listing").option("path", root)``
        -> ``(url string, size long, mtime long)``; also a streaming
        source (``spark.readStream.format("chyme_listing")``) emitting
        newly-arrived files per micro-batch.

        Options: ``path`` (required), ``depth`` (optional recursion
        bound, reference ``--recursion`` parity). Register once per
        session with :func:`register_listing_source`.
        """

        @classmethod
        def name(cls) -> str:
            return "chyme_listing"

        def schema(self) -> str:
            return "url string, size long, mtime long"

        def reader(self, schema):
            return ListingReader(self.options)

        def simpleStreamReader(self, schema):
            return ListingStreamReader(self.options)

    def register_listing_source(spark: SparkSession) -> None:
        spark.dataSource.register(ListingDataSource)

except ImportError:  # pragma: no cover — pyspark < 4.0
    ListingDataSource = None  # type: ignore[assignment]

    def register_listing_source(spark: SparkSession) -> None:
        raise NotImplementedError("chyme_listing needs pyspark >= 4.0 (Python Data Source API)")
