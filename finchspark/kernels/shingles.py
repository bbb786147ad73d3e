"""Shingling: byte k-grams for code/text payloads + canonical DNA k-mers.

Production path: fixed-width byte k-grams over UTF-8 `content` with NO
canonicalization (reverse-complement is DNA-specific; for code payloads the
reference's `extra_count` strand counter is always 0 — see SURVEY.md §1.3).

Parity path (tests only): canonical DNA k-mers exactly like the reference's
needletail-driven normalization (`lib/src/sketch_schemes/mash.rs:72-79`):
uppercase, non-ACGT masked to N, windows containing N skipped, canonical
k-mer = lexicographic min(kmer, revcomp(kmer)), flag set when the reverse
complement was chosen.
"""
from __future__ import annotations

import numpy as np

from .murmur3 import murmur3_sliding_low64, murmur3_x64_128_low64


def shingle_hashes(content: bytes, k: int, seed: int = 0) -> np.ndarray:
    """All k-gram hashes (in order of occurrence) of one byte string."""
    if len(content) < k:
        return np.empty(0, dtype=np.uint64)
    arr = np.frombuffer(content, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)
    return murmur3_x64_128_low64(np.ascontiguousarray(windows), seed)


def blob_shingle_hashes(
    blob: np.ndarray, byte_offsets: np.ndarray, k: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every k-gram of every document in ONE vectorized murmur call,
    reading documents directly from a concatenated uint8 blob + byte offsets
    (the native Arrow string/binary column layout, so the signature UDF can
    consume Arrow buffers zero-copy).

    Returns (hashes, doc_offsets) where ``hashes[doc_offsets[i]:doc_offsets[i+1]]``
    are document i's shingle hashes in occurrence order. Documents shorter
    than k contribute zero hashes.
    """
    byte_offsets = np.asarray(byte_offsets, dtype=np.int64)
    n_docs = len(byte_offsets) - 1
    lens = np.diff(byte_offsets)
    n_kmers = np.maximum(lens - k + 1, 0)
    doc_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_kmers, out=doc_offsets[1:])
    total = int(doc_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), doc_offsets

    # hash EVERY window of the concatenated blob in one sequential-memory
    # sliding kernel (boundary-crossing windows included — ~(k-1)/avg_len
    # wasted work), then select the in-document ones with a u64 gather.
    # Measured much faster than gathering (n, k) window rows.
    all_hashes = murmur3_sliding_low64(blob, k, seed)
    # window start index in blob for each emitted shingle
    # = doc_byte_start[d] + (local shingle index within doc)
    local = np.arange(total, dtype=np.int64) - np.repeat(doc_offsets[:-1], n_kmers)
    starts = np.repeat(byte_offsets[:-1], n_kmers) + local
    return all_hashes[starts], doc_offsets


def batch_shingle_hashes(
    contents: list[bytes], k: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """`blob_shingle_hashes` over a Python list of byte strings."""
    n_docs = len(contents)
    lens = np.fromiter((len(c) for c in contents), dtype=np.int64, count=n_docs)
    byte_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=byte_offsets[1:])
    blob = (
        np.frombuffer(b"".join(contents), dtype=np.uint8)
        if byte_offsets[-1]
        else np.empty(0, dtype=np.uint8)
    )
    return blob_shingle_hashes(blob, byte_offsets, k, seed)


# --------------------------- DNA parity path ---------------------------------

_COMP = np.full(256, ord("N"), dtype=np.uint8)
for _a, _b in [("A", "T"), ("T", "A"), ("G", "C"), ("C", "G")]:
    _COMP[ord(_a)] = ord(_b)

_NORM = np.full(256, ord("N"), dtype=np.uint8)
for _c in "ACGT":
    _NORM[ord(_c)] = ord(_c)
    _NORM[ord(_c.lower())] = ord(_c)


def dna_canonical_kmers(seq: bytes, k: int) -> list[tuple[bytes, int]]:
    """Yield (canonical_kmer, is_revcomp) per valid window, reference-style.

    Windows containing non-ACGT bases are skipped (needletail masks them to N
    and `canonical_kmers` skips N-containing windows). Test-only path; not
    vectorized on purpose (clarity over speed, inputs are tiny fixtures).
    """
    arr = _NORM[np.frombuffer(seq, dtype=np.uint8)]
    n = len(arr)
    if n < k:
        return []
    rc = _COMP[arr][::-1]
    out: list[tuple[bytes, int]] = []
    for i in range(n - k + 1):
        fwd = arr[i : i + k].tobytes()
        if b"N" in fwd:
            continue
        rev = rc[n - k - i : n - i].tobytes()
        if rev < fwd:
            out.append((rev, 1))
        else:
            out.append((fwd, 0))
    return out
