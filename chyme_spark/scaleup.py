"""Deterministic 10x scale-up of a testdata directory (bench sf1).

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, seed 42, read-only).
The 2x bench gate at sf0.1 cannot see a scale CLIFF — an operator whose
cost curve bends far above the data ratio (accidental quadratic
candidate generation, a build side that stops fitting, a skew hotspot).
This module manufactures an sf1-equivalent dataset by replicating the
sf0.1 tables FACTOR times with disjoint key spaces:

  * every copy i shifts each synthetic key family (orderkey, custkey,
    partkey, suppkey, doc_id, vec_id, event_id) by ``i * span`` where
    span = max(key)+1 over the source — referential integrity holds
    WITHIN each copy, so per-key join fan-outs and group sizes match
    the source distribution exactly while global cardinality is 10x;
  * ``documents.text`` gets a per-copy suffix so whole-document hashes
    differ across copies (dedup ops keep realistic survivor rates)
    while n-gram content stays overwhelmingly shared (duplicate-gram
    ops see a heavy-duplication regime — the harder case);
  * nation/region are fixed dimensions and copy through unchanged;
  * NO randomness anywhere: same input -> byte-identical output, the
    bench's round-over-round comparability requirement.

This is a bench utility, not a correctness surface: oracle parity runs
at sf0.01 against the driver's own data only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_DONE_MARKER = "_CHYME_SCALEUP_DONE"


def _src_fingerprint(src_dir: str) -> str:
    """Content key for the cache stamp: sha256 over every source table's
    parquet part listing (name, size). Catches a driver-regenerated
    testdata dir (new seed/schema -> new part sizes) without reading the
    data; path+factor alone would silently reuse a stale scale-up
    (VERDICT r7 #7: key the cache on source content, not just path)."""
    import hashlib

    h = hashlib.sha256()
    for name in TABLES:
        p = os.path.join(src_dir, f"{name}.parquet")
        entries = []
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                entries.append(f"{f}:{os.path.getsize(os.path.join(p, f))}")
        elif os.path.exists(p):
            entries.append(f"{name}:{os.path.getsize(p)}")
        h.update(f"{name}=[{','.join(entries)}]\n".encode())
    return h.hexdigest()


def _span(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).first()[0]) + 1


def _write_replicated(df: DataFrame, factor: int, shift, dest: str) -> None:
    """Write FACTOR shifted copies of df to dest, one append per copy.

    A single factor-way unionByName write holds every branch's scan +
    parquet writer state in one job — at factor 20 that OOMed a 128 GiB
    heap (r8 bench probe). Copy-at-a-time appends bound memory at ONE
    copy regardless of factor; the resulting dataset is identical, just
    split across more files (which is also the more realistic layout)."""
    shift(df, 0).write.mode("overwrite").parquet(dest)
    for i in range(1, factor):
        shift(df, i).write.mode("append").parquet(dest)


def ensure_scaled(
    spark: SparkSession, src_dir: str, dest_dir: str, factor: int = 10
) -> str:
    """Materialize ``factor``x-scaled copies of the src tables under
    dest_dir (idempotent: a done-marker skips regeneration)."""
    marker = os.path.join(dest_dir, _DONE_MARKER)
    # gen= bumps when the shift rules themselves change (e.g. r10's
    # customer-name regeneration), forcing cached dirs to rebuild.
    stamp = f"factor={factor} src={src_dir} gen=2 fp={_src_fingerprint(src_dir)}\n"
    if os.path.exists(marker):
        # the marker records WHAT was generated; a different factor or
        # source must regenerate, not silently reuse the stale dataset
        # (round-6 review: bench would mislabel 10x data as 20x)
        with open(marker) as f:
            if f.read() == stamp:
                return dest_dir
    os.makedirs(dest_dir, exist_ok=True)

    t = {n: spark.read.parquet(os.path.join(src_dir, f"{n}.parquet")) for n in TABLES}
    spans = {
        "order": _span(t["orders"], "o_orderkey"),
        "cust": _span(t["customer"], "c_custkey"),
        "part": _span(t["part"], "p_partkey"),
        "supp": _span(t["supplier"], "s_suppkey"),
        "doc": _span(t["documents"], "doc_id"),
        "vec": _span(t["embeddings"], "vec_id"),
        "event": _span(t["events"], "event_id"),
    }

    def k(col: str, span: int, i: int):
        return (F.col(col) + F.lit(i * span)).alias(col)

    shifts = {
        "region": lambda df, i: df,
        "nation": lambda df, i: df,
        "customer": lambda df, i: df.select(
            k("c_custkey", spans["cust"], i),
            # Regenerate the name from the SHIFTED key (the TPC-H
            # generator rule: 'Customer#' + 9-digit zero-padded key).
            # Copying names verbatim gave every name FACTOR exact
            # replicas, which makes x_record_linkage's OUTPUT quadratic
            # in the factor — the probe then measures replica blowup,
            # not the algorithm's near-dup scaling (r10).
            F.format_string(
                "Customer#%09d", F.col("c_custkey") + F.lit(i * spans["cust"])
            ).alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "supplier": lambda df, i: df.select(
            k("s_suppkey", spans["supp"], i), "s_name", "s_nationkey", "s_acctbal",
        ),
        "part": lambda df, i: df.select(
            k("p_partkey", spans["part"], i),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        ),
        "orders": lambda df, i: df.select(
            k("o_orderkey", spans["order"], i),
            k("o_custkey", spans["cust"], i),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "lineitem": lambda df, i: df.select(
            k("l_orderkey", spans["order"], i),
            k("l_partkey", spans["part"], i),
            k("l_suppkey", spans["supp"], i),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "events": lambda df, i: df.select(
            k("event_id", spans["event"], i),
            "ts",
            k("user_id", spans["cust"], i),
            "event_type", "value", "props",
        ),
        "documents": lambda df, i: df.select(
            k("doc_id", spans["doc"], i),
            (
                F.col("text")
                if i == 0
                else F.concat(F.col("text"), F.lit(f" copyseq{i}"))
            ).alias("text"),
            "lang", "source",
            (F.col("n_chars") + F.lit(0 if i == 0 else len(f" copyseq{i}"))).alias(
                "n_chars"
            ),
        ),
        "embeddings": lambda df, i: df.select(
            k("vec_id", spans["vec"], i), "embedding", "label",
        ),
    }

    for name in TABLES:
        dest = os.path.join(dest_dir, f"{name}.parquet")
        _write_replicated(
            t[name], 1 if name in ("region", "nation") else factor,
            shifts[name], dest,
        )

    with open(marker, "w") as f:
        f.write(stamp)
    return dest_dir
