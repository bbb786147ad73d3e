"""Benchmark: near-duplicate pipeline throughput on the driver test data.

Prints ONE JSON line:
  {"metric": "neardup_pipeline", "value": <end-to-end sec>, "unit": "sec",
   "queries": {...per-stage sec + files_per_sec...}, "sf": <sf>}

The sandbox VM throttles transiently and severely (identical work varies
3-20x between consecutive runs — see BENCH/BASELINE.md), so the pipeline is
run SPARK_GRAFT_REPS times (default 3) inside one session and each stage
reports its best rep — the same interleaved best-of-k methodology every
comparative number in BENCH/BASELINE.md uses. Outputs are asserted
identical across reps.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_REPS (default 3: interleaved best-of-k per stage),
     SPARK_GRAFT_CORPUS (optional: path to a pre-built corpus parquet —
       file or sharded directory — with the FIXTURES.md §B schema; takes
       precedence over SPARK_GRAFT_SYNTH),
     SPARK_GRAFT_SYNTH (optional: n_base for the deterministic synthetic
       source-code corpus, FIXTURES.md §B — e.g. 30000 ≈ 50k files; the
       corpus parquet is generated once and cached under /tmp),
     SPARK_GRAFT_NO_WRITE=1 (optional: stage barriers via in-memory persist
       instead of parquet round-trips — used by the scaling measurement so
       a single shared local disk, a per-node resource on a real cluster,
       does not confound the CPU-scaling signal).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # the sandbox resolv.conf points at a black-hole nameserver; pin the
    # local address so no Spark component ever waits on a resolver timeout
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # SPARK_GRAFT_MASTER overrides the master URL — used by the
    # multi-executor scaling evidence (scripts/cluster_scaling.py passes
    # local-cluster[N,1,mem]: real separate executor JVMs with network
    # shuffle, not threads). Default stays local[cpus].
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    spark = (
        SparkSession.builder.master(master)
        .appName("finchspark-bench")
        .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "4g"))
        # real multi-executor masters spawn fresh python workers that do not
        # inherit the driver's sys.path (a spark-submit deployment ships the
        # package via --py-files, scripts/make_pyfiles.py); for the
        # local-cluster harness the repo dir on the executor PYTHONPATH is
        # the equivalent
        .config("spark.executorEnv.PYTHONPATH", repo_dir)
        # 4 tasks per core, not 1: with shuffle.partitions == cores the
        # reduce side of the LSH+verify stage runs as ONE wave of fat tasks
        # and any imbalance gates the whole stage (measured on the 2.33M-file
        # corpus at 8 cores: 88.5 s with 8 partitions vs 46.3 s with 32,
        # same window — a 1.9x stage speedup from granularity alone). AQE
        # coalesces the excess away at small scale, so over-partitioning is
        # the safe side; this mirrors the standard 2-4x-tasks-per-core
        # guidance for a real cluster.
        .config("spark.sql.shuffle.partitions", str(max(4 * cpus, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # size input splits so a bench corpus (tens-hundreds of MB) fans out
        # across all cores — the default 128 MB split gave a 300 MB corpus
        # only 3 scan tasks, capping any speedup at 3x regardless of
        # parallelism (at 100 TB the default is fine; the knob matters at
        # bench scale, cf. spark.sql.files.maxPartitionBytes guidance)
        .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
        # a VM throttle window can stretch a stage past the 60 s python
        # worker idle timeout, killing the warmed pool mid-bench; each
        # respawned worker then pays the pandas/pyarrow import again on the
        # critical path (observed: ~75 worker spawns in one bench run).
        # Workers are a bounded resource here (one pool per bench process),
        # so keep them alive for the process lifetime.
        .config("spark.python.worker.idleTimeoutSeconds", "0")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from finchspark.config import PipelineConfig
    from finchspark.kernels import SketchParams
    from finchspark.operators.ann import cosine_topk_lsh
    from finchspark.operators.cc import connected_components
    from finchspark.operators.lsh import candidate_pairs, exact_dup_pairs_sha
    from finchspark.operators.signature import build_signatures
    from finchspark.operators.verify import verify_pairs

    cfg = PipelineConfig(
        sketch=SketchParams(kmers_to_sketch=128, final_size=128, kmer_length=21),
        jaccard_threshold=0.5,
    )

    corpus = os.environ.get("SPARK_GRAFT_CORPUS")
    synth_n = os.environ.get("SPARK_GRAFT_SYNTH")
    if corpus:
        # pre-built corpus path (file or sharded directory) with the
        # FIXTURES.md §B schema — used by scripts/job_scaling.py for the
        # multi-GB job-level scaling corpora that the per-run synth cache
        # below is too slow to build single-process
        docs = spark.read.parquet(corpus)
        content_col = "content"
        sf = os.path.basename(corpus.rstrip("/"))
    elif synth_n:
        from finchspark.sources.synth import write_synth_parquet

        n_base = int(synth_n)
        cache = f"/tmp/finchspark_synth_{n_base}_42.parquet"
        if not os.path.exists(cache):
            write_synth_parquet(cache, n_base=n_base)
        docs = spark.read.parquet(cache)
        content_col = "content"
        sf = f"synth{n_base}"
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        content_col = "text"
    # at driver SFs the whole corpus is one parquet row group -> one scan
    # task; a real 100 TB scan has thousands of tasks. Fan the content
    # across all cores so the measured stage has the many-task shape — and
    # so every pooled python worker re-touches its full-size arrays every
    # rep: the FIFO idle-worker pool otherwise rotates each single-task rep
    # onto a worker whose arena is cold, billing one worker's first-touch
    # faults (severe on this VM, see BENCH/BASELINE.md) to every rep.
    if docs.rdd.getNumPartitions() < cpus:
        docs = docs.repartition(cpus)
    n_files = docs.count()
    total_bytes = docs.select(
        F.sum(F.octet_length(content_col)).alias("b")
    ).first()["b"]
    timings: dict[str, float] = {}

    # Warm the Python worker pool before timing: each (core, task) worker
    # pays import + allocator high-water faults exactly once per JOB LIFETIME
    # (spark.python.worker.reuse), so on a long-running cluster that cost is
    # noise, but on a seconds-scale bench it dominates the first stage and
    # hides the steady-state rate the north rule asks about. A tiny
    # signature job over ~cpus batches forces every worker slot through
    # import+first-batch; SPARK_GRAFT_NO_WARMUP=1 restores cold-start
    # numbers.
    if os.environ.get("SPARK_GRAFT_NO_WARMUP") != "1":
        # enough rows that every worker slot processes a full-size sub-batch
        # (MAX_CHUNK_BYTES) and reaches its allocator high-water mark — a
        # 64-row warmup leaves the first real batches paying the faults
        warm = docs.limit(4096 * cpus).repartition(cpus)
        build_signatures(
            warm, cfg, key_cols=("doc_id",), content_col=content_col
        ).count()

    no_write = os.environ.get("SPARK_GRAFT_NO_WRITE") == "1"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def run_pipeline() -> tuple[dict[str, float], float, int, int]:
        t: dict[str, float] = {}
        persisted = []

        def _materialize(df, path):
            if no_write:
                df = df.persist()
                df.count()
                persisted.append(df)
                return df
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

        with tempfile.TemporaryDirectory() as tmp:
            t_start = time.perf_counter()
            t0 = time.perf_counter()
            sigs = build_signatures(
                docs, cfg, key_cols=("doc_id",), content_col=content_col
            )
            sigs = _materialize(sigs, f"{tmp}/signatures")
            t["signatures"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            cands, _ = candidate_pairs(sigs, cfg.lsh, key_col="doc_id")
            verified = verify_pairs(cands, sigs, cfg, key_col="doc_id")
            pairs = verified.filter(F.col("jaccard") >= cfg.jaccard_threshold)
            pairs = _materialize(pairs, f"{tmp}/pairs")
            n_pairs = pairs.count()
            t["lsh_verify"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            edges = pairs.select(
                F.col("key_a").alias("src"), F.col("key_b").alias("dst")
            ).unionByName(
                exact_dup_pairs_sha(sigs, "doc_id").select(
                    F.col("key_a").alias("src"), F.col("key_b").alias("dst")
                )
            )
            comps = connected_components(edges)
            n_comp = comps.count()
            t["connected_components"] = time.perf_counter() - t0
            pipeline_sec = time.perf_counter() - t_start

        t0 = time.perf_counter()
        cosine_topk_lsh(emb, k=5, query_mod=10).count()
        t["ann_lsh"] = time.perf_counter() - t0

        for df in persisted:
            df.unpersist()
        return t, pipeline_sec, n_pairs, n_comp

    # interleaved best-of-k inside one session (BENCH/BASELINE.md
    # methodology): per-stage best across reps; outputs must agree
    runs = [run_pipeline() for _ in range(reps)]
    timings.update(
        {k: min(r[0][k] for r in runs) for k in runs[0][0]}
    )
    pipeline_sec = min(r[1] for r in runs)
    n_pairs, n_comp = runs[0][2], runs[0][3]
    assert all(r[2] == n_pairs and r[3] == n_comp for r in runs), (
        "nondeterministic pipeline outputs across bench reps"
    )

    timings["files_per_sec"] = round(n_files / pipeline_sec, 1)
    timings["sig_mb_per_sec"] = round(
        total_bytes / 1e6 / timings["signatures"], 2
    )
    timings["n_files"] = n_files
    timings["n_pairs"] = n_pairs
    timings["n_clustered_nodes"] = n_comp
    out = {
        "metric": "neardup_pipeline",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "queries": {k: (round(v, 3) if isinstance(v, float) else v) for k, v in timings.items()},
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
