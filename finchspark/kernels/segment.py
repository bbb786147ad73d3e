"""Segmented (per-document) sketch kernels over whole Arrow batches.

These compute, for EVERY document in a batch at once, the same result as
`sketch.count_distinct` + `bottom_k` / `scaled_keep` — with one lexsort over
the batch's entire shingle-hash stream instead of a per-document Python loop.
This is what keeps the signature UDF O(1) Python ops per Arrow batch
(north_rule: vectorized pandas/Arrow UDFs, never per-row Python).

Layout convention: a "segmented array" is (values..., offsets) where
``values[offsets[i]:offsets[i+1]]`` belongs to document i — the exact layout
of an Arrow ListArray, so results feed `pa.ListArray.from_arrays` zero-copy.
"""
from __future__ import annotations

import numpy as np

U64_MAX = 0xFFFFFFFFFFFFFFFF
_U32_MAX = np.int64(0xFFFFFFFF)


def segment_count_distinct(
    doc_idx: np.ndarray, hashes: np.ndarray, n_docs: int, return_first_idx: bool = False
) -> tuple[np.ndarray, ...]:
    """Per-document distinct (hash, count), hashes ascending within each doc.

    Returns (doc_of_group, group_hashes, group_counts, rank_in_doc) where
    groups are ordered by (doc, hash) and `rank_in_doc` is each group's
    0-based position among its document's sorted distinct hashes. With
    `return_first_idx`, appends each group's FIRST original occurrence index
    into the input stream (stable sorts keep original order within a group)
    — used to recover the shingle bytes of a retained hash (G3 info stats).
    """
    if len(hashes) == 0:
        z = np.empty(0, np.int64)
        out = (z, np.empty(0, np.uint64), z, z)
        return out + (z,) if return_first_idx else out
    order = None
    d = h = None
    if not return_first_idx:
        # C fast path: when docs are already contiguous ascending (the
        # signature-stage layout), an in-segment radix sort replaces the two
        # full argsort+gather passes — no permutation arrays materialized.
        # Skipped when first-occurrence indices are requested (diagnostics).
        from . import cmurmur

        doc_idx = np.asarray(doc_idx, dtype=np.int64)
        if cmurmur.available() and bool(np.all(doc_idx[1:] >= doc_idx[:-1])):
            off = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(np.bincount(doc_idx, minlength=n_docs), out=off[1:])
            h_sorted = np.ascontiguousarray(hashes, dtype=np.uint64).copy()
            if cmurmur.segment_sort_u64_c(h_sorted, off):
                d = doc_idx
                h = h_sorted
    if h is None:
        # two stable radix argsorts == lexsort((hashes, doc_idx)), measurably
        # faster than numpy's generic lexsort on 64-bit keys
        perm1 = np.argsort(hashes, kind="stable")
        perm2 = np.argsort(doc_idx[perm1], kind="stable")
        order = perm1[perm2]
        d = doc_idx[order]
        h = hashes[order]
    new_group = np.empty(len(h), dtype=bool)
    new_group[0] = True
    new_group[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    group_starts = np.nonzero(new_group)[0]
    counts = np.diff(np.append(group_starts, len(h))).astype(np.int64)
    counts = np.minimum(counts, _U32_MAX)  # u32 saturating_add parity
    gd = d[group_starts]
    gh = h[group_starts]
    # rank of each group within its doc
    new_doc = np.empty(len(gd), dtype=bool)
    new_doc[0] = True
    new_doc[1:] = gd[1:] != gd[:-1]
    doc_first_group = np.nonzero(new_doc)[0]
    rank = np.arange(len(gd), dtype=np.int64) - np.repeat(
        doc_first_group, np.diff(np.append(doc_first_group, len(gd)))
    )
    if return_first_idx:
        return gd, gh, counts, rank, order[group_starts]
    return gd, gh, counts, rank


def _emit(
    gd: np.ndarray,
    gh: np.ndarray,
    counts: np.ndarray,
    keep: np.ndarray,
    n_docs: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    kd, kh, kc = gd[keep], gh[keep], counts[keep]
    per_doc = np.bincount(kd, minlength=n_docs).astype(np.int64)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(per_doc, out=offsets[1:])
    return kh, kc, offsets


def segment_bottom_k(
    doc_idx: np.ndarray, hashes: np.ndarray, n_docs: int, size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch form of the Mash bottom-k sketch (`mash.rs:34-63` semantics) for
    every doc at once. Returns (hashes, counts, offsets) segmented arrays."""
    gd, gh, counts, rank = segment_count_distinct(doc_idx, hashes, n_docs)
    return _emit(gd, gh, counts, rank < size, n_docs)


def segment_scaled(
    doc_idx: np.ndarray,
    hashes: np.ndarray,
    n_docs: int,
    size: int,
    scale: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch form of the scaled sketch (`scaled.rs:37-61` semantics)."""
    gd, gh, counts, rank = segment_count_distinct(doc_idx, hashes, n_docs)
    max_hash = np.uint64(U64_MAX // int(1.0 / scale))
    keep = (gh <= max_hash) | (rank < size)
    return _emit(gd, gh, counts, keep, n_docs)


def segment_unique_counts(
    doc_idx: np.ndarray, hashes: np.ndarray, n_docs: int
) -> np.ndarray:
    """Per-document distinct-hash count (pre-sketch), one bincount."""
    gd, _, _, _ = segment_count_distinct(doc_idx, hashes, n_docs)
    return np.bincount(gd, minlength=n_docs).astype(np.int64)
