"""Round-7 optimization profiler: isolate each bench stage with the noop
sink (guide §1.4), capture explain("formatted") (guide §7.2), and count the
Spark jobs each operator launches (fixed-cost attribution at bench scale).

Methodology mirrors bench.py exactly (same session config, same data, same
operators) but times sub-steps separately so the expensive piece of each
stage is named instead of guessed. Run:

    python scripts/profile_r07.py [stage ...]

Stages: signatures, candidates, verify, exact_sha, cc, ann, all.
Writes explain output to plans/r07/profile_<name>.txt.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, reps=REPS):
    """Best-of-reps wall time + job count for one materialization."""
    times = []
    njobs = None
    for i in range(reps):
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        after = set(tracker.getJobIdsForGroup(None) or [])
        njobs = len(after - before)
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "stage": name,
                "best": round(min(times), 3),
                "all": [round(t, 3) for t in times],
                "jobs_last_rep": njobs,
            }
        ),
        flush=True,
    )
    return min(times)


def dump_plan(df, name):
    import contextlib
    import io

    os.makedirs("plans/r07", exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(f"plans/r07/profile_{name}.txt", "w") as f:
        f.write(buf.getvalue())


def main():
    which = set(sys.argv[1:]) or {"all"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("finchspark-profile-r07")
        .config("spark.executor.memory", "4g")
        .config("spark.sql.shuffle.partitions", str(max(4 * cpus, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if docs.rdd.getNumPartitions() < cpus:
        docs = docs.repartition(cpus)
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()

    # warm the python worker pool like bench.py does
    warm = docs.limit(4096 * cpus).repartition(cpus)
    build_signatures(warm, cfg, key_cols=("doc_id",), content_col="text").count()

    sigs_df = build_signatures(docs, cfg, key_cols=("doc_id",), content_col="text")
    if "all" in which or "signatures" in which:
        dump_plan(sigs_df, "signatures")
        timed(spark, "signatures_noop", lambda: noop(sigs_df))

    # materialize signatures once (like bench parquet round-trip) for the
    # downstream stages
    sigs = sigs_df.persist()
    sigs.count()

    cands, _ = candidate_pairs(sigs, cfg.lsh, key_col="doc_id")
    if "all" in which or "candidates" in which:
        dump_plan(cands, "candidates")
        timed(spark, "candidates_noop", lambda: noop(cands))

    verified = verify_pairs(cands, sigs, cfg, key_col="doc_id")
    pairs = verified.filter(F.col("jaccard") >= cfg.jaccard_threshold)
    if "all" in which or "verify" in which:
        dump_plan(pairs, "verify")
        timed(spark, "lsh_verify_noop", lambda: noop(pairs))

    pairs_m = pairs.persist()
    pairs_m.count()

    sha = exact_dup_pairs_sha(sigs, "doc_id")
    if "all" in which or "exact_sha" in which:
        dump_plan(sha, "exact_sha")
        timed(spark, "exact_sha_noop", lambda: noop(sha))

    edges = pairs_m.select(
        F.col("key_a").alias("src"), F.col("key_b").alias("dst")
    ).unionByName(
        sha.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
    )
    if "all" in which or "cc" in which:
        timed(spark, "cc_count", lambda: connected_components(edges).count())

    if "all" in which or "ann" in which:
        ann = cosine_topk_lsh(emb, k=5, query_mod=10)
        dump_plan(ann, "ann_lsh")
        timed(spark, "ann_lsh_count", lambda: cosine_topk_lsh(emb, k=5, query_mod=10).count())

    spark.stop()


if __name__ == "__main__":
    main()
