"""spark-submit entrypoint for the near-duplicate pipeline.

Usage (cluster):
  python scripts/make_pyfiles.py                       # builds dist/finchspark.zip
  spark-submit --master <master> --py-files dist/finchspark.zip \
      scripts/submit_pipeline.py \
      --input /path/to/documents_parquet \
      --output /path/to/run_dir \
      --key-col doc_id --content-col content \
      [--resume] [--kmer-length 21] [--sketch-size 128] \
      [--jaccard-threshold 0.8] [--bands 16] [--rows 4] [--max-dist 0.05]

The run directory holds the stage checkpoints (signatures / pairs /
components) with params-hash validation: re-running with --resume reuses
completed stages; re-running with a changed config hard-fails
(`finchspark.plans.checkpoint`). The final outputs are written under
<output>/components and <output>/pairs.
"""
from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="finchspark near-duplicate pipeline")
    ap.add_argument("--input", required=True, help="parquet path of the documents table")
    ap.add_argument("--output", required=True, help="run directory (checkpoints + results)")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--kmer-length", type=int, default=21)
    ap.add_argument("--sketch-size", type=int, default=128)
    ap.add_argument("--hash-seed", type=int, default=0)
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--bucket-cap", type=int, default=2000)
    ap.add_argument("--max-dist", type=float, default=None)
    ap.add_argument("--resume", action="store_true", help="reuse completed stage checkpoints")
    ap.add_argument(
        "--pairwise",
        action="store_true",
        help="finch's true pairwise dist surface (D4): O(n^2) ordered "
        "(query, reference) distances over a SMALL sketch set, written as "
        "a finch-shaped SketchDistance JSON array to <output>/distances.json "
        "(hard-fails beyond --pairwise-max-inputs docs; large corpora use "
        "the default LSH pipeline)",
    )
    ap.add_argument("--pairwise-max-inputs", type=int, default=10_000)
    ap.add_argument(
        "--collapse-exact",
        action="store_true",
        help="collapse byte-identical docs to one representative before "
        "sketching (star-stitched components; see plans.pipeline docstring "
        "for the measured tradeoff)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("finchspark-neardup").getOrCreate()

    from finchspark.config import LshConfig, PipelineConfig
    from finchspark.kernels import SketchParams
    from finchspark.plans.checkpoint import TableStore
    from finchspark.plans.pipeline import near_duplicates

    cfg = PipelineConfig(
        sketch=SketchParams(
            kmers_to_sketch=args.sketch_size,
            final_size=args.sketch_size,
            kmer_length=args.kmer_length,
            hash_seed=args.hash_seed,
        ),
        lsh=LshConfig(n_bands=args.bands, n_rows=args.rows, bucket_cap=args.bucket_cap),
        jaccard_threshold=args.jaccard_threshold,
        max_dist=args.max_dist,
    )
    if args.pairwise:
        import json
        from pathlib import Path

        from finchspark.operators.signature import build_signatures
        from finchspark.operators.verify import pairwise_distances

        docs = spark.read.parquet(args.input)
        sigs = build_signatures(
            docs, cfg, key_cols=(args.key_col,), content_col=args.content_col
        ).persist()
        dists = pairwise_distances(
            sigs,
            cfg,
            key_col=args.key_col,
            max_distance=args.max_dist if args.max_dist is not None else 1.0,
            max_inputs=args.pairwise_max_inputs,
        )
        rows = dists.orderBy("key_a", "key_b").collect()
        out = [
            {
                "containment": r["containment"],
                "jaccard": r["jaccard"],
                "mashDistance": r["mash_distance"],
                "commonHashes": r["common_hashes"],
                "totalHashes": r["total_hashes"],
                "query": str(r["key_a"]),
                "reference": str(r["key_b"]),
            }
            for r in rows
        ]
        Path(args.output).mkdir(parents=True, exist_ok=True)
        (Path(args.output) / "distances.json").write_text(json.dumps(out))
        print(
            f"finchspark: {len(out)} pairwise distances -> "
            f"{args.output}/distances.json",
            file=sys.stderr,
        )
        return 0

    store = TableStore(args.output, cfg.params_hash())
    if not args.resume:
        # a fresh run must not silently reuse old stages
        import shutil

        for stage in ("signatures", "pairs", "components"):
            shutil.rmtree(f"{args.output}/{stage}", ignore_errors=True)
            shutil.rmtree(f"{args.output}/collapsed_{stage}", ignore_errors=True)

    docs = spark.read.parquet(args.input)
    res = near_duplicates(
        docs,
        cfg,
        key_col=args.key_col,
        content_col=args.content_col,
        store=store,
        collapse_exact=args.collapse_exact,
    )
    n_pairs = res.pairs.count()
    n_nodes = res.components.count()
    overflow = res.bucket_overflow.count()
    print(
        f"finchspark: {n_pairs} near-dup pairs, {n_nodes} clustered docs, "
        f"{overflow} capped LSH buckets; run dir {args.output}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
