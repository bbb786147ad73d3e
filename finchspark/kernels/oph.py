"""Densified one-permutation MinHash (OPH) → LSH band hashes.

The reference's bottom-k sketch is a single-permutation KMV sketch, so classic
b×r MinHash banding (which needs a fixed-length signature vector) does not
apply directly. Candidate generation therefore uses densified
one-permutation hashing over the SAME murmur3 hash stream (SURVEY.md §7.3):

- bucket each shingle hash into m = b*r bins by its top bits,
- per-bin minimum forms the signature vector (one pass, O(1) per shingle),
- empty bins are filled by "rotation densification" (Shrivastava & Li,
  ICML 2014): borrow the value of the nearest non-empty bin to the right
  (cyclic), offset by distance × a large odd constant so different emptiness
  patterns don't spuriously collide,
- each band of r consecutive signature slots is hashed (murmur3 over the raw
  8r bytes) into one 64-bit band key.

Bottom-k sketches remain the verification truth; OPH only generates
candidates, and its recall at the configured (b, r, threshold) is validated
empirically against the ≥0.99 gate in tests.
"""
from __future__ import annotations

import numpy as np

from .murmur3 import murmur3_x64_128_low64

_ROT_C = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant
_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def oph_signatures(
    hashes: np.ndarray, doc_offsets: np.ndarray, m: int
) -> np.ndarray:
    """(n_docs, m) uint64 densified OPH signature matrix.

    `hashes`/`doc_offsets` as produced by `batch_shingle_hashes`. Documents
    with zero shingles yield an all-_EMPTY row (callers must exclude them from
    banding — they would otherwise all collide).
    """
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    n_docs = len(doc_offsets) - 1
    sig = np.full((n_docs, m), _EMPTY, dtype=np.uint64)
    if len(hashes):
        hashes = np.asarray(hashes, dtype=np.uint64)
        shift = np.uint64(64 - int(m).bit_length() + 1)
        bins = (hashes >> shift).astype(np.int64)
        doc_idx = np.repeat(
            np.arange(n_docs, dtype=np.int64), np.diff(doc_offsets)
        )
        np.minimum.at(sig, (doc_idx, bins), hashes)

    # rotation densification, vectorized by pointer doubling over bin axis
    filled = sig != _EMPTY
    dist = np.where(filled, np.int64(0), np.int64(1 << 40))
    val = sig.copy()
    step = 1
    while step < m:
        cand_val = np.roll(val, -step, axis=1)
        cand_dist = np.roll(dist, -step, axis=1) + step
        take = cand_dist < dist
        val = np.where(take, cand_val, val)
        dist = np.where(take, cand_dist, dist)
        step <<= 1
    dense = val + dist.astype(np.uint64) * _ROT_C
    out = np.where(dist < np.int64(1 << 40), dense, _EMPTY)
    return out


def band_hashes(sig: np.ndarray, n_bands: int, n_rows: int, seed: int = 0) -> np.ndarray:
    """(n_docs, n_bands) int64-ready uint64 band keys from an OPH signature
    matrix: murmur3 over each band's raw little-endian bytes."""
    n_docs, m = sig.shape
    if n_bands * n_rows != m:
        raise ValueError("n_bands * n_rows must equal signature length")
    if n_docs == 0:
        return np.zeros((0, n_bands), dtype=np.uint64)
    band_bytes = (
        np.ascontiguousarray(sig)
        .view(np.uint8)
        .reshape(n_docs, n_bands, 8 * n_rows)
        .reshape(n_docs * n_bands, 8 * n_rows)
    )
    return murmur3_x64_128_low64(band_bytes, seed).reshape(n_docs, n_bands)
