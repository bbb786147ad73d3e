"""G3 info stats: character-class profile of retained sketch k-mers.

The reference's `finch info` computes a %GC over the RETAINED sketch k-mers
weighted by their abundance counts (`cli/src/main.rs:146-187`: per kmer,
count G/C vs A/C/G/T occurrences scaled by the kmer's count). For text/code
payloads the nucleotide classes generalize to character classes; this
operator reports the count-weighted fraction of alpha / digit / whitespace /
other bytes over each document's retained k-mers — the same aggregate, same
weighting, byte classes instead of bases.

Fully vectorized per Arrow batch: one shingle-hash pass, one segmented
count-distinct (which also yields each retained hash's first occurrence
index, i.e. where its k-mer bytes live in the batch blob), then 4 class
prefix-sum arrays over the blob turn every k-mer's class histogram into two
lookups. No per-row Python.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..kernels import blob_shingle_hashes
from ..kernels.segment import segment_count_distinct
from .signature import _string_blob

_CLASSES = ("alpha", "digit", "space", "other")


def _class_lut() -> np.ndarray:
    lut = np.full(256, 3, dtype=np.int64)  # other
    for lo, hi, c in ((ord("a"), ord("z"), 0), (ord("A"), ord("Z"), 0), (ord("0"), ord("9"), 1)):
        lut[lo : hi + 1] = c
    # whitespace class == RE2's \s set [\t\n\f\r ] so SQL twins agree
    for ws in b" \t\n\r\x0c":
        lut[ws] = 2
    return lut


_LUT = _class_lut()


def char_class_profile(
    df: DataFrame,
    config: PipelineConfig,
    key_cols: tuple[str, ...] = ("doc_id",),
    content_col: str = "content",
) -> DataFrame:
    """Per-document count-weighted char-class fractions over retained k-mers.

    Output: key_cols…, n_retained, frac_alpha, frac_digit, frac_space,
    frac_other (fractions of the k*sum(counts) weighted k-mer bytes; all
    zero for documents with no shingles). Retention follows the mash
    bottom-k rule of `config.sketch` — with a sketch size above the
    document's distinct-shingle count the profile covers ALL its k-mers,
    which is what makes the result SQL-verifiable.
    """
    params = config.sketch
    k = params.kmer_length
    seed = params.hash_seed
    size = min(params.kmers_to_sketch, params.final_size)
    n_key = len(key_cols)
    sel = df.select(*key_cols, F.col(content_col).alias("__content"))
    out_schema = T.StructType(
        [sel.schema[c] for c in key_cols]
        + [T.StructField("n_retained", T.LongType())]
        + [T.StructField(f"frac_{c}", T.DoubleType()) for c in _CLASSES]
    )

    def compute(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            blob, byte_off = _string_blob(batch.column(n_key))
            hashes, doc_off = blob_shingle_hashes(blob, byte_off, k, seed)
            n_kmers = np.diff(doc_off)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_kmers)
            gd, _, gcounts, rank, first_idx = segment_count_distinct(
                doc_idx, hashes, n, return_first_idx=True
            )
            keep = rank < size
            kd, kc, kf = gd[keep], gcounts[keep], first_idx[keep]
            # shingle start byte in the blob: occurrence index is per-doc
            # sequential, so byte = doc_byte_start + (occ - doc_occ_start)
            pos = byte_off[:-1][kd] + (kf - doc_off[:-1][kd])
            # class prefix sums: per-kmer class histogram = P[c, p+k]-P[c, p]
            cls = _LUT[blob]
            P = np.zeros((4, len(blob) + 1), dtype=np.int64)
            for c in range(4):
                np.cumsum(cls == c, out=P[c, 1:])
            weighted = np.zeros((4, n), dtype=np.float64)
            for c in range(4):
                per_kmer = P[c, pos + k] - P[c, pos]
                weighted[c] = np.bincount(kd, weights=per_kmer * kc, minlength=n)
            total = weighted.sum(axis=0)  # == k * sum(counts) per doc
            n_retained = np.bincount(kd, minlength=n).astype(np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                fracs = np.where(total > 0, weighted / np.maximum(total, 1), 0.0)
            arrays = [batch.column(i) for i in range(n_key)]
            arrays.append(pa.array(n_retained, pa.int64()))
            arrays += [pa.array(fracs[c], pa.float64()) for c in range(4)]
            names = list(key_cols) + ["n_retained"] + [f"frac_{c}" for c in _CLASSES]
            yield pa.RecordBatch.from_arrays(arrays, names)

    return sel.mapInArrow(compute, out_schema)
