"""JOB-LEVEL two-parallelism-level scaling evidence (north_rule) on a
corpus large enough to amortize fixed per-stage costs.

`scripts/scaling.py` measures the same thing on seconds-scale corpora,
where ~6-8 s of fixed cost per Spark job (driver scheduling, AQE planning,
persist barriers) caps the measurable job-level efficiency regardless of
how well the stages scale (BENCH/BASELINE.md round-3 analysis). This
script closes that gap: it builds a multi-GB sharded synthetic corpus
(FIXTURES.md §B, parallel writers, deterministic) and runs the FULL
pipeline (signatures -> LSH+verify -> CC) at local[N] and local[4N] in
separate JVMs, interleaved (N, 4N, N, 4N, ...), best-of-k per level, with
in-memory stage barriers (SPARK_GRAFT_NO_WRITE=1: one shared local disk is
a per-node resource on a real cluster and must not confound CPU scaling).

Usage: python scripts/job_scaling.py [N] [n_base] [repeats] [n_shards]
Defaults: N=1, n_base=1_400_000 (~5 GB content / ~2.3M files), repeats=2.
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


def run_once(corpus: str, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CORPUS=corpus,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_NO_WRITE="1",
        # one rep per JVM: interleaving happens at this script's level, and
        # a single rep at this corpus size is minutes-scale, far above the
        # VM's fixed-cost noise floor
        SPARK_GRAFT_REPS="1",
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 1_400_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_shards = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    corpus = f"/tmp/finchspark_synth_{n_base}_s{n_shards}_42"
    if not os.path.isdir(corpus) or not os.listdir(corpus):
        from finchspark.sources.synth import write_synth_parquet_sharded

        t0 = time.time()
        n_docs = write_synth_parquet_sharded(
            corpus, n_base=n_base, n_shards=n_shards
        )
        print(
            f"# corpus built: {n_docs} docs in {time.time() - t0:.0f}s at "
            f"{corpus}",
            file=sys.stderr,
        )

    lows, highs = [], []
    for _ in range(repeats):
        lows.append(run_once(corpus, n))
        highs.append(run_once(corpus, 4 * n))
    lo = min(lows, key=lambda r: r["value"])
    hi = min(highs, key=lambda r: r["value"])
    t_lo, t_hi = lo["value"], hi["value"]
    n_files = lo["queries"]["n_files"]
    stage_keys = ("signatures", "lsh_verify", "connected_components")
    stage_lo = {k: min(r["queries"][k] for r in lows) for k in stage_keys}
    stage_hi = {k: min(r["queries"][k] for r in highs) for k in stage_keys}
    print(
        json.dumps(
            {
                "level": "job",
                "corpus": corpus,
                "n_files": n_files,
                "n_cores_low": n,
                "n_cores_high": 4 * n,
                "sec_low": t_lo,
                "sec_high": t_hi,
                "sec_low_all": [r["value"] for r in lows],
                "sec_high_all": [r["value"] for r in highs],
                "files_per_sec_low": round(n_files / t_lo, 1),
                "files_per_sec_high": round(n_files / t_hi, 1),
                "scaling_efficiency": round((t_lo / t_hi) / 4.0, 3),
                "stage_sec_low": stage_lo,
                "stage_sec_high": stage_hi,
                "stage_efficiency": {
                    k: round((stage_lo[k] / stage_hi[k]) / 4.0, 3)
                    for k in stage_keys
                },
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
