"""Dump .explain('formatted') for the round-7-touched queries.

Usage: python scripts/dump_plans_r07.py <suffix> <out_dir> [sf_dir]
(suffix = 'before' run from the round-start worktree, 'after' from HEAD).
Plans only — nothing is executed beyond tiny first()/collect() calls some
query constructors make (IVF train sample, minmer reference row).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402

QUERIES = [
    "lsh_candidates",
    "near_dup_pairs",
    "exact_dup_pairs",
    "exact_dup_clusters",
    "simhash_pairs",
    "neardup_exact",
    "weighted_jaccard",
    "ann_lsh",
    "ann_ivf",
    "cosine_dup_pairs",
    "cc_neardup",
    "cc_chain",
]


def main() -> None:
    suffix = sys.argv[1]
    out_dir = Path(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    out_dir.mkdir(parents=True, exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.idleTimeoutSeconds", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(name, "done", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
