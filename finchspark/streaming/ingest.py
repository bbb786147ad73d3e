"""Incremental signature ingest via Structured Streaming (SURVEY.md §2.7).

The signature stage is per-row (no cross-row state), so incremental ingest
is exactly the shape the package docstring promises: `spark.readStream` →
`build_signatures` per micro-batch → append to the signatures table, with
candidate generation + clustering run as periodic batch compactions over the
growing table. Implemented with `foreachBatch` so every micro-batch reuses
the SAME batch operator the bounded pipeline uses (one code path, one
semantics), and progress is tracked by the streaming checkpoint — a restart
resumes from the last committed micro-batch without re-sketching old files
(the streaming analogue of `plans.checkpoint.TableStore` resumability).

A continuously-maintained clustering (streaming CC) would need
`applyInPandasWithState` over band keys and remains future work: the
reference defines no semantics to match for it.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..config import PipelineConfig
from ..operators.signature import build_signatures


def signatures_stream(
    stream_df: DataFrame,
    config: PipelineConfig,
    output_path: str,
    checkpoint_path: str,
    key_cols: tuple[str, ...] = ("doc_id",),
    content_col: str = "content",
    filters=None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query appending signature rows for every new
    document micro-batch.

    `stream_df` is any streaming DataFrame with key_cols + content_col
    (e.g. `spark.readStream.schema(...).parquet(dir)`). With
    `available_now=True` the query drains everything currently available and
    stops — the incremental-compaction mode; pass False for a continuous
    query. Exactly-once per micro-batch is inherited from the foreachBatch
    checkpoint; the parquet append itself is idempotent per epoch only if
    the sink dedups, so production sinks should be transactional tables
    (Iceberg/Delta) — the parquet form here mirrors TableStore.
    """

    def _emit(batch_df: DataFrame, epoch_id: int) -> None:
        (
            build_signatures(
                batch_df,
                config,
                key_cols=key_cols,
                content_col=content_col,
                filters=filters,
            )
            .write.mode("append")
            .parquet(output_path)
        )

    writer = (
        stream_df.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
