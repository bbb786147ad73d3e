"""Per-query wall times, driver-style (collect() per query, one session,
sorted order, shared per-sf caches warm exactly as in a driver gate run).

Usage: python scripts/query_times_r07.py [sf_dir] [out.json] [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/query_times.json"
    only = set(sys.argv[3:])
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
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    qs = entry.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.perf_counter()
        out = qs[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)
        rows[name] = len(out)
    total = round(sum(times.values()), 3)
    blob = {"sf_dir": sf_dir, "total": total, "times": times, "rows": rows}
    with open(out_path, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps({"total": total, "slowest": sorted(times.items(), key=lambda kv: -kv[1])[:12]}))
    spark.stop()


if __name__ == "__main__":
    main()
