"""Optional C fast path for the sliding MurmurHash3-x64-128 shingle kernel.

The numpy sliding form (`murmur3.murmur3_sliding_low64`) needs ~25 full
vector passes over n-element u64 arrays per batch — memory-bandwidth bound.
The same public-domain algorithm (Austin Appleby) as a scalar C loop touches
each window's bytes once and keeps the mixing state in registers, which is
how the reference gets its per-core throughput. This module compiles that
loop with the system C compiler ON FIRST USE (no pip/apt; plain
`cc -O3 -shared`), caches the shared object under /tmp keyed by a source
hash, and exposes it via ctypes. Everything is optional:

- no compiler / failed compile / FINCHSPARK_NO_CKERNEL=1 → callers fall back
  to the numpy form (identical values, bit-parity-tested in
  tests/test_murmur3.py);
- the ctypes call releases the GIL, so Arrow-UDF worker processes overlap
  I/O and hashing naturally.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <stdint.h>
#include <string.h>

static inline uint64_t rotl64(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t fmix64(uint64_t k) {
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33;
    k *= 0xc4ceb9fe1a85ec53ULL;
    k ^= k >> 33;
    return k;
}

/* low64 lane of murmur3-x64-128 for every length-klen sliding window of
   blob; out has nwin entries, window w starts at blob + w. */
void sliding_low64(const uint8_t* blob, int64_t nwin, int64_t klen,
                   uint64_t seed, uint64_t* out) {
    const uint64_t c1 = 0x87c37b91114253d5ULL;
    const uint64_t c2 = 0x4cf5ad432745937fULL;
    const int64_t nblocks = klen / 16;
    const int tail = (int)(klen % 16);
    for (int64_t w = 0; w < nwin; w++) {
        const uint8_t* data = blob + w;
        uint64_t h1 = seed, h2 = seed;
        for (int64_t b = 0; b < nblocks; b++) {
            uint64_t k1, k2;
            memcpy(&k1, data + 16 * b, 8);
            memcpy(&k2, data + 16 * b + 8, 8);
            k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
            h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729ULL;
            k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
            h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5ULL;
        }
        if (tail) {
            const uint8_t* t = data + nblocks * 16;
            uint64_t k1 = 0, k2 = 0;
            switch (tail) {
                case 15: k2 ^= ((uint64_t)t[14]) << 48; /* fallthrough */
                case 14: k2 ^= ((uint64_t)t[13]) << 40; /* fallthrough */
                case 13: k2 ^= ((uint64_t)t[12]) << 32; /* fallthrough */
                case 12: k2 ^= ((uint64_t)t[11]) << 24; /* fallthrough */
                case 11: k2 ^= ((uint64_t)t[10]) << 16; /* fallthrough */
                case 10: k2 ^= ((uint64_t)t[9]) << 8;   /* fallthrough */
                case 9:  k2 ^= ((uint64_t)t[8]);
                         k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
                         /* fallthrough */
                case 8:  k1 ^= ((uint64_t)t[7]) << 56;  /* fallthrough */
                case 7:  k1 ^= ((uint64_t)t[6]) << 48;  /* fallthrough */
                case 6:  k1 ^= ((uint64_t)t[5]) << 40;  /* fallthrough */
                case 5:  k1 ^= ((uint64_t)t[4]) << 32;  /* fallthrough */
                case 4:  k1 ^= ((uint64_t)t[3]) << 24;  /* fallthrough */
                case 3:  k1 ^= ((uint64_t)t[2]) << 16;  /* fallthrough */
                case 2:  k1 ^= ((uint64_t)t[1]) << 8;   /* fallthrough */
                case 1:  k1 ^= ((uint64_t)t[0]);
                         k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
            }
        }
        h1 ^= (uint64_t)klen; h2 ^= (uint64_t)klen;
        h1 += h2; h2 += h1;
        h1 = fmix64(h1); h2 = fmix64(h2);
        h1 += h2;
        out[w] = h1;
    }
}

#include <stdlib.h>

static void insertion_sort_u64(uint64_t* a, int64_t n) {
    for (int64_t i = 1; i < n; i++) {
        uint64_t v = a[i];
        int64_t j = i - 1;
        while (j >= 0 && a[j] > v) { a[j + 1] = a[j]; j--; }
        a[j + 1] = v;
    }
}

/* LSD radix sort of one segment using caller-provided scratch (>= n). */
static void radix_sort_u64(uint64_t* a, int64_t n, uint64_t* scratch) {
    uint64_t* src = a;
    uint64_t* dst = scratch;
    for (int pass = 0; pass < 8; pass++) {
        int shift = pass * 8;
        int64_t count[256] = {0};
        for (int64_t i = 0; i < n; i++)
            count[(src[i] >> shift) & 0xff]++;
        /* all keys share this byte: skip the copy pass */
        int hot = -1;
        for (int b = 0; b < 256; b++)
            if (count[b]) { if (hot >= 0) { hot = -2; break; } hot = b; }
        if (hot >= 0) continue;
        int64_t pos = 0;
        int64_t starts[256];
        for (int b = 0; b < 256; b++) { starts[b] = pos; pos += count[b]; }
        for (int64_t i = 0; i < n; i++)
            dst[starts[(src[i] >> shift) & 0xff]++] = src[i];
        uint64_t* t = src; src = dst; dst = t;
    }
    if (src != a) memcpy(a, src, (size_t)n * 8);
}

/* in-place ascending sort of vals within every [offsets[d], offsets[d+1]) */
int segment_sort_u64(uint64_t* vals, const int64_t* offsets, int64_t n_docs) {
    int64_t max_len = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t len = offsets[d + 1] - offsets[d];
        if (len > max_len) max_len = len;
    }
    uint64_t* scratch = NULL;
    if (max_len > 96) {
        scratch = (uint64_t*)malloc((size_t)max_len * 8);
        if (!scratch) return -1;
    }
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t lo = offsets[d];
        int64_t len = offsets[d + 1] - lo;
        if (len <= 96) insertion_sort_u64(vals + lo, len);
        else radix_sort_u64(vals + lo, len, scratch);
    }
    free(scratch);
    return 0;
}

/* unweighted SimHash64 per segment: bit b of out[d] set when more than half
   of the doc's hashes have bit b set (strict majority, matching the numpy
   vote 2*set - total > 0). Empty docs yield 0. */
void simhash64_segments(const uint64_t* hashes, const int64_t* offsets,
                        int64_t n_docs, uint64_t* out) {
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t lo = offsets[d], hi = offsets[d + 1];
        int64_t total = hi - lo;
        if (total <= 0) { out[d] = 0; continue; }
        int64_t votes[64] = {0};
        for (int64_t i = lo; i < hi; i++) {
            uint64_t h = hashes[i];
            for (int b = 0; b < 64; b++)
                votes[b] += (int64_t)((h >> b) & 1u);
        }
        uint64_t sig = 0;
        for (int b = 0; b < 64; b++)
            if (2 * votes[b] - total > 0) sig |= ((uint64_t)1) << b;
        out[d] = sig;
    }
}
"""

_lib = None
_tried = False


def _compiler() -> str | None:
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if not cc:
            continue
        try:
            subprocess.run(
                [cc, "--version"], capture_output=True, check=True, timeout=10
            )
            return cc
        except Exception:
            continue
    return None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("FINCHSPARK_NO_CKERNEL"):
        return None
    cc = _compiler()
    if cc is None:
        return None
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    # cache under a per-uid 0700 directory and refuse to dlopen anything we
    # don't own: a fixed world-writable path could be pre-planted by another
    # local user (the source hash is public) for arbitrary code execution
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"finchspark-{os.getuid()}"
    )
    so_path = os.path.join(cache_dir, f"cmurmur_{tag}.so")
    try:
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        st = os.stat(cache_dir)
        if st.st_uid != os.getuid() or (st.st_mode & 0o077):
            return None
        if not os.path.exists(so_path):
            with tempfile.TemporaryDirectory(dir=cache_dir) as td:
                src = os.path.join(td, "cmurmur.c")
                with open(src, "w") as f:
                    f.write(_SRC)
                tmp_so = os.path.join(td, "cmurmur.so")
                subprocess.run(
                    [cc, "-O3", "-fPIC", "-shared", "-o", tmp_so, src],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp_so, so_path)
        if os.stat(so_path).st_uid != os.getuid():
            return None
        lib = ctypes.CDLL(so_path)
        lib.sliding_low64.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        ]
        lib.sliding_low64.restype = None
        lib.segment_sort_u64.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.segment_sort_u64.restype = ctypes.c_int
        lib.simhash64_segments.argtypes = [
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        ]
        lib.simhash64_segments.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def sliding_low64_c(blob: np.ndarray, k: int, seed: int = 0) -> np.ndarray | None:
    """C sliding murmur; returns None when the fast path is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(blob) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    blob = np.ascontiguousarray(blob, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    lib.sliding_low64(blob, n, k, seed, out)
    return out


def segment_sort_u64_c(vals: np.ndarray, offsets: np.ndarray) -> bool:
    """In-place ascending sort of each [offsets[d], offsets[d+1]) segment.
    Returns False when the fast path is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return False
    if len(vals) == 0:
        return True
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    rc = lib.segment_sort_u64(vals, offsets, len(offsets) - 1)
    return rc == 0


def simhash64_segments_c(
    hashes: np.ndarray, offsets: np.ndarray
) -> np.ndarray | None:
    """Unweighted per-segment SimHash64; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs and len(hashes):
        lib.simhash64_segments(
            np.ascontiguousarray(hashes, dtype=np.uint64), offsets, n_docs, out
        )
    return out
