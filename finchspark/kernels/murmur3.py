"""Vectorized MurmurHash3-x64-128 (low 64 bits), matching the reference hash.

The reference engine hashes every k-length shingle with MurmurHash3-x64-128 and
keeps the low (first) 64-bit lane (`lib/src/sketch_schemes/hashing.rs:9-12` in
onecodex/finch-rs; default seed 0, `lib/src/sketch_schemes/mod.rs:73-83`).

This module reimplements the public MurmurHash3 algorithm (Austin Appleby,
public domain) as pure numpy uint64 arithmetic over a matrix of fixed-width
shingles, so one call hashes an entire Arrow batch worth of shingles without
per-row Python. All multiplies/adds wrap mod 2^64 exactly like the C/Rust
implementations because numpy unsigned arithmetic wraps silently.
"""
from __future__ import annotations

import numpy as np

_U64 = np.uint64
_C1 = _U64(0x87C37B91114253D5)
_C2 = _U64(0x4CF5AD432745937F)
_F1 = _U64(0xFF51AFD7ED558CCD)
_F2 = _U64(0xC4CEB9FE1A85EC53)
_M5 = _U64(5)
_N1 = _U64(0x52DCE729)
_N2 = _U64(0x38495AB5)
_33 = _U64(33)

U64_MAX = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r_ = _U64(r)
    return (x << r_) | (x >> _U64(64 - r))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _33)
    k = k * _F1
    k = k ^ (k >> _33)
    k = k * _F2
    k = k ^ (k >> _33)
    return k


def _le_u64(bytes_mat: np.ndarray) -> np.ndarray:
    """(n, 8) uint8 -> (n,) uint64 little-endian."""
    out = bytes_mat[:, 7].astype(np.uint64)
    for b in range(6, -1, -1):
        out = (out << _U64(8)) | bytes_mat[:, b].astype(np.uint64)
    return out


def murmur3_x64_128_low64(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash each row of an (n, L) uint8 matrix; return (n,) uint64 (h1 lane).

    Equivalent to ``murmurhash3_x64_128(row, seed).0`` in the Rust
    murmurhash3 crate used by the reference.
    """
    if mat.ndim != 2:
        raise ValueError("expected (n, L) uint8 matrix")
    n, length = mat.shape
    if mat.dtype != np.uint8:
        mat = mat.astype(np.uint8)
    nblocks = length // 16
    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = np.full(n, seed, dtype=np.uint64)

    if nblocks:
        body = np.ascontiguousarray(mat[:, : nblocks * 16])
        # little-endian platform assumed (x86/arm64); view reads LE u64 lanes
        kvals = body.view("<u8").reshape(n, nblocks, 2)
        for blk in range(nblocks):
            k1 = kvals[:, blk, 0] * _C1
            k1 = _rotl64(k1, 31) * _C2
            h1 = h1 ^ k1
            h1 = _rotl64(h1, 27) + h2
            h1 = h1 * _M5 + _N1
            k2 = kvals[:, blk, 1] * _C2
            k2 = _rotl64(k2, 33) * _C1
            h2 = h2 ^ k2
            h2 = _rotl64(h2, 31) + h1
            h2 = h2 * _M5 + _N2

    tail_len = length % 16
    if tail_len:
        tail = np.zeros((n, 16), dtype=np.uint8)
        tail[:, :tail_len] = mat[:, nblocks * 16 :]
        if tail_len > 8:
            k2 = _le_u64(tail[:, 8:16]) * _C2
            k2 = _rotl64(k2, 33) * _C1
            h2 = h2 ^ k2
        k1 = _le_u64(tail[:, 0:8]) * _C1
        k1 = _rotl64(k1, 31) * _C2
        h1 = h1 ^ k1

    ln = _U64(length)
    h1 = h1 ^ ln
    h2 = h2 ^ ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    return h1


def hash_one(item: bytes, seed: int = 0) -> int:
    """Scalar convenience wrapper (tests / tiny inputs)."""
    mat = np.frombuffer(item, dtype=np.uint8).reshape(1, -1) if item else np.zeros((1, 0), np.uint8)
    return int(murmur3_x64_128_low64(mat, seed)[0])


def murmur3_sliding_low64(blob: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Hashes of ALL length-k sliding windows of `blob` (len(blob)-k+1 of
    them), identical values to hashing each window with
    `murmur3_x64_128_low64`.

    Dispatch: the optional C kernel (`kernels.cmurmur`, compiled on first
    use, bit-parity-tested) touches each window's bytes once with the mix
    state in registers; without a compiler this falls back to the numpy
    sliding form below — unaligned little-endian u64 lanes read straight off
    the blob, all mixing in place (no (n, k) window matrix, no per-row
    gather).
    """
    from . import cmurmur

    got = cmurmur.sliding_low64_c(np.ascontiguousarray(blob), k, seed)
    if got is not None:
        return got
    return _murmur3_sliding_low64_numpy(blob, k, seed)


def _murmur3_sliding_low64_numpy(blob: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Pure-numpy sliding form (fallback + parity reference for the C path)."""
    n = len(blob) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    if blob.dtype != np.uint8:
        blob = blob.astype(np.uint8)

    # unaligned LE u64 at EVERY byte offset, via a (len, 8) byte-stride-1
    # sliding view reinterpreted as u64 — one strided copy per lane instead
    # of 16 shift/or passes. Zero-pad so the last windows can load 8 bytes.
    padded = np.concatenate([blob, np.zeros(7, dtype=np.uint8)])
    swv = np.lib.stride_tricks.sliding_window_view(padded, 8)
    u64_at = swv.view(np.uint64).reshape(-1)  # u64_at[j] = LE64(blob[j:j+8])

    def lane(offset: int) -> np.ndarray:
        """LE u64 of window bytes [offset, offset+8) (zero-padded past k)."""
        nbytes = min(8, k - offset)
        vals = u64_at[offset : offset + n].copy()
        if nbytes < 8:
            vals &= _U64((1 << (8 * nbytes)) - 1)
        return vals

    # all mixing below is IN-PLACE with one shared scratch buffer: the kernel
    # is memory-bandwidth bound at executor fan-out, so temporaries are the
    # enemy (each numpy temp = an extra first-touch page-faulted pass)
    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = np.full(n, seed, dtype=np.uint64)
    scratch = np.empty(n, dtype=np.uint64)

    def rotl_ip(x: np.ndarray, r: int) -> None:
        np.right_shift(x, _U64(64 - r), out=scratch)
        x <<= _U64(r)
        x |= scratch

    def fmix_ip(x: np.ndarray) -> None:
        np.right_shift(x, _33, out=scratch)
        x ^= scratch
        x *= _F1
        np.right_shift(x, _33, out=scratch)
        x ^= scratch
        x *= _F2
        np.right_shift(x, _33, out=scratch)
        x ^= scratch

    def mix_k1_ip(k1: np.ndarray) -> None:
        k1 *= _C1
        rotl_ip(k1, 31)
        k1 *= _C2
        np.bitwise_xor(h1, k1, out=h1)

    def mix_k2_ip(k2: np.ndarray) -> None:
        k2 *= _C2
        rotl_ip(k2, 33)
        k2 *= _C1
        np.bitwise_xor(h2, k2, out=h2)

    nblocks = k // 16
    for blk in range(nblocks):
        mix_k1_ip(lane(16 * blk))
        rotl_ip(h1, 27)
        h1 += h2
        h1 *= _M5
        h1 += _N1
        mix_k2_ip(lane(16 * blk + 8))
        rotl_ip(h2, 31)
        h2 += h1
        h2 *= _M5
        h2 += _N2
    tail_len = k % 16
    if tail_len:
        if tail_len > 8:
            mix_k2_ip(lane(16 * nblocks + 8))
        mix_k1_ip(lane(16 * nblocks))
    kk = _U64(k)
    h1 ^= kk
    h2 ^= kk
    h1 += h2
    h2 += h1
    fmix_ip(h1)
    fmix_ip(h2)
    h1 += h2
    return h1


# --- order-preserving u64 <-> i64 bridge (Spark LongType is signed) ----------
_SHIFT = np.uint64(1 << 63)


def u64_to_i64_shifted(uh: np.ndarray) -> np.ndarray:
    """Order-preserving bijection uint64 -> int64 (flip the sign bit).

    Spark-side sorts/joins on LongType then agree with unsigned hash order.
    """
    return (np.asarray(uh, dtype=np.uint64) ^ _SHIFT).view(np.int64)


def i64_to_u64_shifted(ih: np.ndarray) -> np.ndarray:
    return (np.asarray(ih, dtype=np.int64).view(np.uint64)) ^ _SHIFT
