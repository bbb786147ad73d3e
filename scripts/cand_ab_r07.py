"""A/B/C the candidate-pair stage: in-group expansion (current) vs the
alias self-join with an explicit SHUFFLE_MERGE hint (prevents the AQE
broadcast conversion that duplicated the subtree) vs the unhinted round-6
join. Noop-sink, interleaved reps, one session.

Usage: python scripts/cand_ab_r07.py [sf_dir|corpus_dir] [cpus] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def smj_hint_pairs(signatures, lsh, key_col="doc_id"):
    from finchspark.operators.lsh import explode_bands

    bands = explode_bands(signatures, key_col)
    w = Window.partitionBy("band_id", "band_hash")
    sized = bands.withColumn("bucket_size", F.count(F.lit(1)).over(w))
    member = sized.filter(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= lsh.bucket_cap)
    ).select("band_id", "band_hash", F.col(key_col).alias("k"))
    a, b = member.alias("a"), member.alias("b")
    return (
        a.hint("merge")
        .join(
            b.hint("merge"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"))
        .distinct()
    )


def unhinted_pairs(signatures, lsh, key_col="doc_id"):
    from finchspark.operators.lsh import explode_bands

    bands = explode_bands(signatures, key_col)
    w = Window.partitionBy("band_id", "band_hash")
    sized = bands.withColumn("bucket_size", F.count(F.lit(1)).over(w))
    member = sized.filter(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= lsh.bucket_cap)
    ).select("band_id", "band_hash", F.col(key_col).alias("k"))
    a, b = member.alias("a"), member.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"))
        .distinct()
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(4 * cpus, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.executor.memory", "4g")
        .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
        .config("spark.python.worker.idleTimeoutSeconds", "0")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from finchspark.config import PipelineConfig
    from finchspark.kernels import SketchParams
    from finchspark.operators.lsh import candidate_pairs
    from finchspark.operators.signature import build_signatures

    cfg = PipelineConfig(
        sketch=SketchParams(kmers_to_sketch=128, final_size=128, kmer_length=21),
        jaccard_threshold=0.5,
    )
    if os.path.isdir(src) and any(
        f.startswith("part-") or f.startswith("shard") for f in os.listdir(src)
    ):
        docs = spark.read.parquet(src)
        content = "content"
    else:
        docs = spark.read.parquet(f"{src}/documents.parquet")
        content = "text"
    if docs.rdd.getNumPartitions() < cpus:
        docs = docs.repartition(cpus)
    sigs = build_signatures(
        docs, cfg, key_cols=("doc_id",), content_col=content
    ).select("doc_id", "bands").persist()
    sigs.count()

    variants = {
        "ingroup": lambda: candidate_pairs(sigs, cfg.lsh, key_col="doc_id")[0],
        "smj_hint": lambda: smj_hint_pairs(sigs, cfg.lsh, key_col="doc_id"),
        "unhinted": lambda: unhinted_pairs(sigs, cfg.lsh, key_col="doc_id"),
    }
    counts = {
        name: fn().count() for name, fn in variants.items()
    }
    assert len(set(counts.values())) == 1, f"variant outputs differ: {counts}"
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"cand:{name}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "src": src,
                "n_pairs": counts["ingroup"],
                "best": {k: min(v) for k, v in times.items()},
                "all": times,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
