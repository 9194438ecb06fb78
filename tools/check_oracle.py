"""Local mimic of the driver's t2 correctness gate.

Runs every registered query at a given scale factor in BOTH PySpark and
DuckDB, then compares row count, sorted column names, and an
order-insensitive value hash (columns sorted by name, values
canonicalized, rows sorted, sha256 over the lot).

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips; normalize -0.0 and integral floats
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, Decimal):
        return canon(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--diff", action="store_true", help="print first differing rows")
    ap.add_argument("--vanilla", action="store_true",
                    help="dress rehearsal: bare SparkSession (none of session.py's "
                         "conf), queries via __spark_entry__'s wrappers — exactly "
                         "what the grading driver builds")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from chyme_spark.registry import load_all
    from chyme_spark.session import TABLES, get_spark

    registry = load_all()
    names = args.names or list(registry)
    if args.vanilla:
        import importlib.util

        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
        spec = importlib.util.spec_from_file_location(
            "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
        )
        entry_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry_mod)
        wrapped = entry_mod.queries()

        class _Q:
            def __init__(self, fn, oracle):
                self.fn, self.oracle = fn, oracle

        registry = {n: _Q(wrapped[n], registry[n].oracle) for n in registry}
    else:
        spark = get_spark("check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    failures: list[str] = []
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"rows-only {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(q.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            # Driver-canonicalizer lint: the grading driver compares via
            # pandas (duckdb fetchdf), which renders HUGEINT as float64
            # ("5.0" vs Spark's "5") and mangles DECIMAL / nested types.
            # This local checker reads fetchall() Python ints, so without
            # this DESCRIBE lint a HUGEINT oracle passes here but fails
            # the driver (round-2 d37_sessionization post-mortem).
            otypes = con.execute(f"DESCRIBE {q.oracle}").fetchall()
            bad_types = [
                (c, t)
                for c, t, *_ in otypes
                if "HUGEINT" in t.upper()
                or t.upper().startswith("DECIMAL")
                or any(k in t.upper() for k in ("[]", "STRUCT", "MAP("))
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if bad_types:
            problems.append(
                "oracle output types unsafe for the driver's pandas "
                f"canonicalizer (cast them): {bad_types}"
            )
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                if args.diff:
                    so = sorted(range(len(scols)), key=lambda i: scols[i])
                    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                    sset = sorted("\x1f".join(canon(r[i]) for i in so) for r in srows)
                    oset = sorted("\x1f".join(canon(r[i]) for i in oo) for r in orows)
                    for a, b in zip(sset, oset):
                        if a != b:
                            print(f"  spark : {a.replace(chr(31), ' | ')}")
                            print(f"  duckdb: {b.replace(chr(31), ' | ')}")
                            break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail" + (f": {failures}" if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
