"""MULTI-EXECUTOR two-cluster-size scaling evidence (north_rule).

The north rule asks for N vs 4N EXECUTORS. `scripts/job_scaling.py`
evidences CPU scaling with local[N] threads in one JVM; this harness runs
the same full pipeline under `local-cluster[N,1,<mem>]` — N real executor
JVMs (separate processes, network-stack shuffle, per-executor python
worker pools), the closest thing to a multi-executor cluster a single box
can host — at N and 4N executors, interleaved, best-of-k per level.

Usage: python scripts/cluster_scaling.py [N] [n_base] [repeats] [exec_mem_mb]
Defaults: N=2, n_base=1_400_000 (~5 GB content / ~2.3M files), repeats=2,
exec_mem_mb=4096.
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


def run_once(corpus: str, n_exec: int, mem_mb: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CORPUS=corpus,
        SPARK_GRAFT_CPUS=str(n_exec),  # sizes shuffle partitions
        SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},1,{mem_mb}]",
        SPARK_GRAFT_EXEC_MEM=f"{mem_mb - 512}m",
        SPARK_GRAFT_NO_WRITE="1",
        SPARK_GRAFT_REPS="1",
        SPARK_HOME=os.path.dirname(__import__("pyspark").__file__),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 1_400_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    mem_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 4096

    corpus = f"/tmp/finchspark_synth_{n_base}_s32_42"
    if not os.path.isdir(corpus) or not os.listdir(corpus):
        from finchspark.sources.synth import write_synth_parquet_sharded

        t0 = time.time()
        n_docs = write_synth_parquet_sharded(corpus, n_base=n_base, n_shards=32)
        print(f"# corpus built: {n_docs} docs in {time.time() - t0:.0f}s", file=sys.stderr)

    lows, highs = [], []
    for rep in range(repeats):
        lows.append(run_once(corpus, n, mem_mb))
        print(f"# rep {rep} {n} executors: {lows[-1]['value']}s", file=sys.stderr)
        highs.append(run_once(corpus, 4 * n, mem_mb))
        print(f"# rep {rep} {4 * n} executors: {highs[-1]['value']}s", file=sys.stderr)
    lo = min(lows, key=lambda r: r["value"])
    hi = min(highs, key=lambda r: r["value"])
    t_lo, t_hi = lo["value"], hi["value"]
    n_files = lo["queries"]["n_files"]
    stage_keys = ("signatures", "lsh_verify", "connected_components")
    print(
        json.dumps(
            {
                "level": "executors",
                "master_low": f"local-cluster[{n},1,{mem_mb}]",
                "master_high": f"local-cluster[{4 * n},1,{mem_mb}]",
                "corpus": corpus,
                "n_files": n_files,
                "sec_low": t_lo,
                "sec_high": t_hi,
                "sec_low_all": [r["value"] for r in lows],
                "sec_high_all": [r["value"] for r in highs],
                "files_per_sec_low": round(n_files / t_lo, 1),
                "files_per_sec_high": round(n_files / t_hi, 1),
                "scaling_efficiency": round((t_lo / t_hi) / 4.0, 3),
                "stage_sec_low": {k: lo["queries"][k] for k in stage_keys},
                "stage_sec_high": {k: hi["queries"][k] for k in stage_keys},
                "n_pairs": lo["queries"]["n_pairs"],
                "outputs_agree": all(
                    r["queries"]["n_pairs"] == lo["queries"]["n_pairs"]
                    and r["queries"]["n_clustered_nodes"]
                    == lo["queries"]["n_clustered_nodes"]
                    for r in lows + highs
                ),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
