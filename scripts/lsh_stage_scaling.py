"""Isolate the LSH+verify stage's 1->4 scaling and attribute its gap.

The round-4 job-level run (2.33M files, BENCH/BASELINE.md) measured the
whole job at 0.845 efficiency 1->4 but the LSH+verify stage at 0.64. This
script times ONLY that stage (candidate_pairs -> verify_pairs -> count)
over pre-materialized signatures, at local[N] vs local[4N], with
`spark.local.dir` switchable onto tmpfs — every byte the stage shuffles
(exploded band rows + signature arrays to the verify join) goes through
spark.local.dir, and on this box that is ONE shared disk at every core
count, while on a real cluster shuffle disks are per-node. If the tmpfs
run recovers the efficiency, the gap is the box's shared disk, not the
stage's plan.

Usage: python scripts/lsh_stage_scaling.py [N] [n_base] [repeats] [shm01]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_CHILD = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.environ["FS_REPO"])
cpus = int(os.environ["FS_CPUS"])
builder_cfg = {
    "spark.sql.shuffle.partitions": str(max(4 * cpus, 32)),
    "spark.sql.adaptive.enabled": "true",
    "spark.driver.memory": "48g",
    "spark.sql.files.maxPartitionBytes": str(16 << 20),
    "spark.python.worker.idleTimeoutSeconds": "0",
    "spark.ui.enabled": "false",
}
if os.environ.get("FS_SHM") == "1":
    d = f"/dev/shm/finchspark_shuffle_{os.getpid()}"
    os.makedirs(d, exist_ok=True)
    builder_cfg["spark.local.dir"] = d
from pyspark.sql import SparkSession, functions as F
b = SparkSession.builder.master(f"local[{cpus}]")
for k, v in builder_cfg.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from finchspark.config import PipelineConfig
from finchspark.kernels import SketchParams
from finchspark.operators.lsh import candidate_pairs
from finchspark.operators.verify import verify_pairs
cfg = PipelineConfig(
    sketch=SketchParams(kmers_to_sketch=128, final_size=128, kmer_length=21),
    jaccard_threshold=0.5,
)
sigs = spark.read.parquet(os.environ["FS_SIGS"])
t0 = time.perf_counter()
cands, _ = candidate_pairs(sigs, cfg.lsh, key_col="doc_id")
v = verify_pairs(cands, sigs, cfg, key_col="doc_id")
n = v.filter(F.col("jaccard") >= cfg.jaccard_threshold).count()
sec = time.perf_counter() - t0
print(json.dumps({"sec": round(sec, 3), "n_pairs": n}))
spark.stop()
if os.environ.get("FS_SHM") == "1":
    import shutil
    shutil.rmtree(d, ignore_errors=True)
"""


def run_once(sigs_path: str, cpus: int, shm: bool) -> dict:
    env = dict(
        os.environ,
        FS_REPO=str(REPO),
        FS_CPUS=str(cpus),
        FS_SIGS=sigs_path,
        FS_SHM="1" if shm else "0",
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True,
        text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 1_400_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    shm = (sys.argv[4] if len(sys.argv) > 4 else "1") == "1"

    corpus = f"/tmp/finchspark_synth_{n_base}_s32_42"
    sigs_path = f"/tmp/finchspark_sigs_{n_base}_42.parquet"
    if not os.path.isdir(corpus) or not os.listdir(corpus):
        from finchspark.sources.synth import write_synth_parquet_sharded

        write_synth_parquet_sharded(corpus, n_base=n_base, n_shards=32)
    if not os.path.isdir(sigs_path):
        # build signatures ONCE at full width — identical input for every
        # timed level; the stage under test starts from this parquet
        env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
        code = (
            "import sys, os; sys.path.insert(0, os.environ['FS_REPO'])\n"
            "from pyspark.sql import SparkSession\n"
            "spark = (SparkSession.builder.master('local[32]')"
            ".config('spark.sql.shuffle.partitions','32')"
            ".config('spark.driver.memory','48g')"
            ".config('spark.sql.files.maxPartitionBytes', str(16 << 20))"
            ".config('spark.ui.enabled','false').getOrCreate())\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            "from finchspark.config import PipelineConfig\n"
            "from finchspark.kernels import SketchParams\n"
            "from finchspark.operators.signature import build_signatures\n"
            "cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=128,"
            " final_size=128, kmer_length=21), jaccard_threshold=0.5)\n"
            f"docs = spark.read.parquet('{corpus}')\n"
            "build_signatures(docs, cfg, key_cols=('doc_id',),"
            f" content_col='content').write.parquet('{sigs_path}')\n"
        )
        env["FS_REPO"] = str(REPO)
        t0 = time.time()
        subprocess.run([sys.executable, "-c", code], env=env, check=True)
        print(f"# signatures built in {time.time() - t0:.0f}s", file=sys.stderr)

    lows, highs = [], []
    for _ in range(repeats):
        lows.append(run_once(sigs_path, n, shm))
        highs.append(run_once(sigs_path, 4 * n, shm))
    t_lo = min(r["sec"] for r in lows)
    t_hi = min(r["sec"] for r in highs)
    print(
        json.dumps(
            {
                "stage": "lsh_verify",
                "shuffle_dir": "tmpfs" if shm else "disk",
                "n_cores_low": n,
                "n_cores_high": 4 * n,
                "sec_low": t_lo,
                "sec_high": t_hi,
                "sec_low_all": [r["sec"] for r in lows],
                "sec_high_all": [r["sec"] for r in highs],
                "scaling_efficiency": round((t_lo / t_hi) / 4.0, 3),
                "n_pairs": lows[0]["n_pairs"],
                "outputs_agree": len(
                    {r["n_pairs"] for r in lows + highs}
                ) == 1,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
