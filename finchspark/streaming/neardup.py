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
`cc.connected_components_incremental_delta` (provably identical to a full
recompute; per-epoch compute bounded by the delta, not the corpus).
Storage is snapshot + delta: a full `v=<n>` snapshot every
`compact_every` epochs, and between snapshots a `d=<n>` delta holding
ONLY the changed rows (new nodes + relabelled members of touched
components) — so per-epoch WRITE volume is also delta-bounded, not
O(corpus). `latest_components` folds the deltas over the newest snapshot
(later epoch wins per node); the retained previous-snapshot chain is the
crash-restart point. On Iceberg the delta write becomes a MERGE into one
table. Without `components_path`, clustering stays a periodic batch
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


def _versions(components_path: str) -> list[tuple[int, str]]:
    """Sorted [(version, kind)] for `v=<n>` snapshots / `d=<n>` deltas.

    Only FULLY COMMITTED versions count: a directory qualifies iff it
    contains Spark's `_SUCCESS` marker. A crash mid-write leaves a partial
    directory (often just `_temporary/`); without this check a restart
    would pick the partial dir as the newest version and either fail
    schema inference or — worse, under a committer that promotes files
    eagerly — silently read a truncated component map. Incomplete
    directories are left in place (the next write to the same version
    number uses mode("overwrite") and replaces them)."""
    if not os.path.isdir(components_path):
        return []
    out = []
    for d in os.listdir(components_path):
        if d.startswith(("v=", "d=")) and os.path.exists(
            os.path.join(components_path, d, "_SUCCESS")
        ):
            out.append((int(d.split("=", 1)[1]), d[0]))
    return sorted(out)


def latest_components(spark, components_path: str):
    """(DataFrame | None, latest version int) for the snapshot+delta
    component map under `components_path`: the newest `v=<n>` snapshot
    with every later `d=<m>` delta folded over it in epoch order (a
    delta's rows override the accumulated map per node)."""
    vs = _versions(components_path)
    if not vs:
        return None, -1
    snaps = [n for n, kind in vs if kind == "v"]
    base = max(snaps)
    cur = spark.read.parquet(f"{components_path}/v={base}")
    for n, kind in vs:
        if kind == "d" and n > base:
            delta = spark.read.parquet(f"{components_path}/d={n}")
            cur = cur.join(
                delta.select("node"), "node", "left_anti"
            ).unionByName(delta)
    return cur, vs[-1][0]


_latest_components = latest_components  # backward-compat alias


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
    compact_every: int = 8,
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
        kept = None
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
                # epoch's pairs into the snapshot+delta component map —
                # per-epoch compute AND write volume bounded by the delta
                # (cc.connected_components_incremental_delta docstring).
                # Versioned dirs instead of in-place overwrite: Spark cannot
                # overwrite a path it is reading, and the retained
                # previous-snapshot chain is the crash-restart point. On
                # Iceberg this becomes a MERGE into one table.
                from ..operators.cc import (
                    connected_components,
                    connected_components_incremental_delta,
                )

                edges = kept.select(
                    F.col("key_a").alias("src"), F.col("key_b").alias("dst")
                )
                prev, v = latest_components(spark, components_path)
                snaps = [n for n, k in _versions(components_path) if k == "v"]
                last_snap = max(snaps, default=-1)
                if prev is None:
                    connected_components(edges).write.mode("overwrite").parquet(
                        f"{components_path}/v={v + 1}"
                    )
                else:
                    full, changed = connected_components_incremental_delta(
                        prev, edges
                    )
                    if v + 1 - last_snap >= compact_every:
                        # compaction epoch: full snapshot, then drop
                        # everything before the PREVIOUS snapshot (that
                        # chain stays readable as the restart point)
                        full.write.mode("overwrite").parquet(
                            f"{components_path}/v={v + 1}"
                        )
                        import shutil

                        for n, kind in _versions(components_path):
                            if n < last_snap:
                                shutil.rmtree(
                                    os.path.join(
                                        components_path, f"{kind}={n}"
                                    ),
                                    ignore_errors=True,
                                )
                    else:
                        changed.write.mode("overwrite").parquet(
                            f"{components_path}/d={v + 1}"
                        )
            new_sigs.write.mode("append").parquet(store_path)
        finally:
            # both caches released even when an append throws — foreachBatch
            # retries in a long-lived session would otherwise accumulate
            # leaked cached partitions epoch over epoch
            if kept is not None:
                kept.unpersist()
            new_sigs.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
