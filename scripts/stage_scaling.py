"""Stage-level scaling evidence for the north-rule throughput stage.

Times ONLY the signature (MinHash sketching) stage — the stage the north
rule's files/sec criterion names — at local[N] vs local[4N], with the scan
input persist-materialized in memory and the python worker pool warmed, so
the measurement is the stage's compute scaling and not scan/disk/cold-start
artifacts. Levels run in separate JVMs, INTERLEAVED (N, 4N, N, 4N, ...)
with best-of-k per level, per BENCH/BASELINE.md methodology.

Usage: python scripts/stage_scaling.py [N] [synth_n_base] [repeats]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.environ["FS_REPO"])
cpus = int(os.environ["FS_CPUS"])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(4 * cpus, 32)))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .config("spark.python.worker.idleTimeoutSeconds", "0")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from finchspark.config import PipelineConfig
from finchspark.kernels import SketchParams
from finchspark.operators.signature import build_signatures
cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=128, final_size=128, kmer_length=21))
docs = spark.read.parquet(os.environ["FS_CORPUS"]).persist()
n = docs.count()  # materialize the scan in memory
# warm: full pass so every worker slot reaches its allocator high-water
build_signatures(docs, cfg, key_cols=("doc_id",), content_col="content").count()
best = None
for _ in range(int(os.environ.get("FS_INNER", "2"))):
    t0 = time.perf_counter()
    build_signatures(docs, cfg, key_cols=("doc_id",), content_col="content").count()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "sec": round(best, 3), "n_files": n}))
spark.stop()
"""


def run_once(cpus: int, corpus: str) -> dict:
    env = dict(
        os.environ,
        FS_CPUS=str(cpus),
        FS_CORPUS=corpus,
        FS_REPO=str(REPO),
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    synth = int(sys.argv[2]) if len(sys.argv) > 2 else 90000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    corpus = f"/tmp/finchspark_synth_{synth}_42.parquet"
    if not os.path.exists(corpus):
        sys.path.insert(0, str(REPO))
        from finchspark.sources.synth import write_synth_parquet

        write_synth_parquet(corpus, n_base=synth)
    lows, highs = [], []
    for _ in range(repeats):
        lows.append(run_once(n, corpus))
        highs.append(run_once(4 * n, corpus))
    t_lo = min(r["sec"] for r in lows)
    t_hi = min(r["sec"] for r in highs)
    print(
        json.dumps(
            {
                "stage": "signatures",
                "n_cores_low": n,
                "n_cores_high": 4 * n,
                "sec_low": t_lo,
                "sec_high": t_hi,
                "sec_low_all": [r["sec"] for r in lows],
                "sec_high_all": [r["sec"] for r in highs],
                "n_files": lows[0]["n_files"],
                "files_per_sec_low": round(lows[0]["n_files"] / t_lo, 1),
                "files_per_sec_high": round(lows[0]["n_files"] / t_hi, 1),
                "scaling_efficiency": round((t_lo / t_hi) / 4.0, 3),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
