"""Count-moment diagnostics over candidate pairs + the minmer count matrix.

Spark surfaces for the reference's two count-level comparison verbs:

- `compare_counts_pairs` — `Sketch.compare_counts`
  (`lib/src/python.rs:489-559` / SURVEY §2 D7): per (reference, query) pair,
  intersection size, two-pointer stop positions, summed counts at common
  hashes, and population variance/skewness/excess-kurtosis of the QUERY
  counts at common hashes. Batched through one `mapInArrow` over Arrow list
  columns via `kernels.distance.compare_counts_many` — one tagged radix
  sort + bincounts for the whole batch, zero per-pair Python. Candidate-
  bounded exactly like `verify_pairs` (never all-pairs).

- `minmer_count_hist` — `Sketch.compare_matrix` / `minmer_matrix`
  (`lib/src/python.rs:560-615`, `lib/src/distance.rs:344-364` / SURVEY §2
  D6): the (n_sketches × |ref|) count matrix aligned to one reference
  sketch's hash positions, surfaced as its per-sketch value histogram
  (count value → number of reference positions holding it, zeros included
  so the row width |ref| is pinned). The histogram is the position-free
  projection of the matrix — positions follow murmur hash order, which no
  SQL oracle can reproduce, while the multiset of row values is exactly
  checkable (and the matrix itself is covered positionally by
  tests/test_ops.py::test_compare_matrix_minmer). The reference row is
  collected once on the driver (one sketch, bounded by the sketch size) and
  shipped as a broadcast-sized closure constant; each Arrow batch computes
  its sketches' matrix rows independently — embarrassingly parallel, no
  shuffle beyond the final histogram aggregation.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import i64_to_u64_shifted
from ..kernels.distance import compare_counts_many, minmer_matrix
from .verify import _list_to_segments


def compare_counts_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    key_col: str = "doc_id",
) -> DataFrame:
    """pairs(key_a, key_b) × signatures → count-moment rows with key_a the
    REFERENCE and key_b the QUERY (`db_sketch.compare_counts(query)` arg
    order, `python.rs:495`): (key_a, key_b, common, ref_pos, query_pos,
    ref_count, query_count, var, skew, kurt). Moments are population
    moments over the query's counts at common hashes; nan when undefined
    (common == 0, or zero variance for skew/kurt), matching the reference's
    0/0 float arithmetic."""
    sigs = signatures.select(key_col, "hashes", "counts")
    key_type = pairs.schema["key_a"].dataType
    out_schema = T.StructType(
        [
            T.StructField("key_a", key_type),
            T.StructField("key_b", key_type),
            T.StructField("common", T.LongType()),
            T.StructField("ref_pos", T.LongType()),
            T.StructField("query_pos", T.LongType()),
            T.StructField("ref_count", T.LongType()),
            T.StructField("query_count", T.LongType()),
            T.StructField("var", T.DoubleType()),
            T.StructField("skew", T.DoubleType()),
            T.StructField("kurt", T.DoubleType()),
        ]
    )
    joined = (
        pairs.select("key_a", "key_b")
        .join(
            sigs.select(
                F.col(key_col).alias("key_a"),
                F.col("hashes").alias("hashes_a"),
                F.col("counts").alias("counts_a"),
            ),
            "key_a",
        )
        .join(
            sigs.select(
                F.col(key_col).alias("key_b"),
                F.col("hashes").alias("hashes_b"),
                F.col("counts").alias("counts_b"),
            ),
            "key_b",
        )
        .select("key_a", "key_b", "hashes_a", "counts_a", "hashes_b", "counts_b")
    )

    def compute(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            va, oa = _list_to_segments(batch.column(2))
            ca, _ = _list_to_segments(batch.column(3))
            vb, ob = _list_to_segments(batch.column(4))
            cb, _ = _list_to_segments(batch.column(5))
            out = compare_counts_many(
                i64_to_u64_shifted(va), oa, ca, i64_to_u64_shifted(vb), ob, cb
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1)]
                + [pa.array(a, pa.int64()) for a in out[:5]]
                + [pa.array(a, pa.float64()) for a in out[5:]],
                [f.name for f in out_schema.fields],
            )

    return joined.mapInArrow(compute, out_schema)


def minmer_count_hist(
    signatures: DataFrame,
    ref_key,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-sketch value histogram of the minmer count matrix against the
    sketch of `ref_key`: (key, count, n_positions) where count is a matrix
    entry value (including 0 for reference hashes the sketch lacks) and
    n_positions how many of the reference's |ref| positions hold it —
    so sum(n_positions) == |ref| for every sketch row."""
    ref_row = (
        signatures.filter(F.col(key_col) == ref_key)
        .select("hashes")
        .first()
    )
    if ref_row is None:
        raise ValueError(f"reference key {ref_key!r} not found in signatures")
    ref_u = i64_to_u64_shifted(np.asarray(ref_row["hashes"], dtype=np.int64))

    key_type = signatures.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("key", key_type),
            T.StructField("count", T.LongType()),
            T.StructField("n_positions", T.LongType()),
        ]
    )

    def compute(batches):
        for batch in batches:
            ns = batch.num_rows
            if ns == 0:
                continue
            va, oa = _list_to_segments(batch.column(1))
            ca, _ = _list_to_segments(batch.column(2))
            ua = i64_to_u64_shifted(va)
            m = minmer_matrix(
                ref_u,
                [ua[oa[s] : oa[s + 1]] for s in range(ns)],
                [ca[oa[s] : oa[s + 1]] for s in range(ns)],
            )
            # per-row value histogram, vectorized: one np.unique over
            # (sketch, value) composite keys for the whole batch
            pid = np.repeat(np.arange(ns, dtype=np.int64), m.shape[1])
            flat = m.ravel().astype(np.int64)
            comp = pid * (flat.max() + 1 if flat.size else 1) + flat
            uq, inv_first, cnt = np.unique(
                comp, return_index=True, return_counts=True
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0).take(pa.array(pid[inv_first])),
                    pa.array(flat[inv_first], pa.int64()),
                    pa.array(cnt.astype(np.int64), pa.int64()),
                ],
                ["key", "count", "n_positions"],
            )

    return signatures.select(key_col, "hashes", "counts").mapInArrow(
        compute, out_schema
    )
