"""Full driver-style parity sweep at a given SF (default sf0.01).

Usage: python scripts/oracle_parity.py [sf_dir] [query_name ...]
With query names given, checks only those; otherwise the full sweep.
Prints per-query PASS/FAIL with row counts; exit 1 on any failure.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")  # black-hole resolver guard

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402


def normalize(rows, cols):
    """Typed, repr-level row canonicalization.

    Deliberately as strict as the driver's typed value-hash: no float
    re-rounding, no -0.0 fixup, and the Python type is part of the key so
    a DuckDB HUGEINT/Decimal vs Spark int64 mismatch FAILS here exactly
    like it fails the driver gate (the round-5 compare_counts_full lesson).
    """
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple((type(r[i]).__name__, repr(r[i])) for i in idx) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.python.worker.idleTimeoutSeconds", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    oracles = entry.oracle_sql()
    queries = entry.queries()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in only}
    failures = 0
    for name in sorted(queries):
        sdf = queries[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:24s} rows-only  n={len(srows)}")
            continue
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_schema = sorted(sdf.columns) == sorted(dcols)
        got, want = normalize(srows, sdf.columns), normalize(drows, dcols)
        ok = ok_schema and got == want
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
            diff = [(g, w) for g, w in zip(got, want) if g != w][:2]
            print(f"{name:24s} {status}  n={len(srows)}/{len(drows)} schema_ok={ok_schema} first_diff={diff}")
        else:
            print(f"{name:24s} {status}  n={len(srows)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
