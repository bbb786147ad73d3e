"""Incremental streaming near-duplicate detection (SURVEY.md §2.7).

Extends `ingest.signatures_stream` from "sketch new files" to the full
production loop: every micro-batch of new documents is sketched, banded,
and joined against the ACCUMULATED signature store, so verified near-dup
pairs stream out as documents arrive — old documents are never re-sketched
and old×old pairs are never recomputed.

Exactly-once pair semantics (at the logical level): a pair (x, y) is
emitted by precisely one micro-batch — the one in which its later member
arrives — because `candidate_pairs_incremental` only generates pairs with
at least one new member (see `operators/lsh.py`). Equivalence with the batch
LSH→verify stage over the same corpus (same config ⇒ same verified pair
set, for any split of the corpus into micro-batches, in any order) is
property-tested in `tests/test_streaming.py`; the batch pipeline's
SimHash short-doc fallback and sha256 exact-dup safety net remain batch
compactions over the store, exactly as in the bounded pipeline.

Physical caveats (same as `ingest.signatures_stream`): micro-batch progress
is tracked by the Structured Streaming checkpoint, so a restart resumes at
the failed epoch; the parquet appends themselves are transactional only on
a table format that makes them so (Iceberg/Delta) — a mid-epoch crash
between the pairs append and the store append can duplicate that epoch's
rows on parquet.

Clustering: pass `components_path` for a CONTINUOUSLY-MAINTAINED component
map — each epoch's verified pairs are contracted into the previous map via
`cc.connected_components_incremental` (provably identical to a full
recompute; per-epoch cost bounded by the delta, not the corpus) and written
as a new `v=<n>` version, with the previous version retained as the
crash-restart point. Without it, clustering stays a periodic batch
compaction (`operators.cc.connected_components` over the pairs table).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import PipelineConfig
from ..operators.lsh import candidate_pairs_incremental
from ..operators.signature import build_signatures
from ..operators.verify import verify_pairs


def _latest_components(spark, components_path: str):
    """(DataFrame | None, latest version int) for the versioned component
    map under `components_path` (one `v=<n>` subdir per completed epoch)."""
    if not os.path.isdir(components_path):
        return None, -1
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(components_path)
        if d.startswith("v=")
    )
    if not versions:
        return None, -1
    v = versions[-1]
    return spark.read.parquet(f"{components_path}/v={v}"), v


def neardup_stream(
    stream_df: DataFrame,
    config: PipelineConfig,
    store_path: str,
    pairs_path: str,
    checkpoint_path: str,
    key_cols: tuple[str, ...] = ("doc_id",),
    content_col: str = "content",
    filters=None,
    available_now: bool = True,
    components_path: str | None = None,
) -> StreamingQuery:
    """Start the incremental near-dup query.

    Per micro-batch: build signatures for the new documents → generate
    candidates (new × store∪new) → exact-verify → append pairs with
    `jaccard >= config.jaccard_threshold` to `pairs_path` → append the new
    signatures to `store_path`. The pairs action runs BEFORE the store
    append so the store-side read of this epoch never observes this epoch's
    own rows twice.

    `stream_df`: any streaming DataFrame carrying key_cols + content_col.
    With `available_now=True` the query drains what is currently available
    and stops (incremental-compaction mode); False = continuous.
    """
    key_col = key_cols[0]

    def _emit(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new_sigs = build_signatures(
            batch_df,
            config,
            key_cols=key_cols,
            content_col=content_col,
            filters=filters,
        ).persist()
        try:
            if os.path.isdir(store_path) and any(
                f.endswith(".parquet") for f in os.listdir(store_path)
            ):
                all_sigs = spark.read.parquet(store_path).unionByName(new_sigs)
            else:
                all_sigs = new_sigs
            cands = candidate_pairs_incremental(
                new_sigs, all_sigs, config.lsh, key_col
            )
            pairs = verify_pairs(cands, all_sigs, config, key_col=key_col)
            kept = pairs.filter(
                F.col("jaccard") >= config.jaccard_threshold
            ).persist()
            (
                kept.withColumn("epoch_id", F.lit(int(epoch_id)))
                .write.mode("append")
                .parquet(pairs_path)
            )
            if components_path is not None:
                # continuously-maintained clustering: contract-and-merge the
                # epoch's pairs into the versioned component map — per-epoch
                # compute bounded by the delta (cc.connected_components_
                # incremental docstring proves exact equality with a full
                # recompute). Versioned `v=<n>` dirs instead of overwrite:
                # Spark cannot overwrite a path it is reading, and the last
                # completed version doubles as the crash-restart point. On
                # Iceberg this becomes a MERGE into one table.
                from ..operators.cc import (
                    connected_components,
                    connected_components_incremental,
                )

                edges = kept.select(
                    F.col("key_a").alias("src"), F.col("key_b").alias("dst")
                )
                prev, v = _latest_components(spark, components_path)
                comp = (
                    connected_components(edges)
                    if prev is None
                    else connected_components_incremental(prev, edges)
                )
                comp.write.mode("overwrite").parquet(
                    f"{components_path}/v={v + 1}"
                )
                # retain current + previous version only
                import shutil

                for d in os.listdir(components_path):
                    if d.startswith("v=") and int(d.split("=", 1)[1]) < v:
                        shutil.rmtree(
                            os.path.join(components_path, d), ignore_errors=True
                        )
            new_sigs.write.mode("append").parquet(store_path)
            kept.unpersist()
        finally:
            new_sigs.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
