"""Vectorized murmur3 vs an independent scalar transcription of the public
MurmurHash3-x64-128 spec, plus the order-preserving i64 bridge."""
import numpy as np
import pytest

from finchspark.kernels import (
    hash_one,
    i64_to_u64_shifted,
    murmur3_x64_128_low64,
    u64_to_i64_shifted,
)

M = (1 << 64) - 1


def _scalar_murmur3_x64_128(data: bytes, seed: int) -> tuple[int, int]:
    """Straight-line scalar MurmurHash3-x64-128 (Appleby's public algorithm)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & M
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & M
        k ^= k >> 33
        return k

    length = len(data)
    h1 = h2 = seed
    nblocks = length // 16
    for b in range(nblocks):
        k1 = int.from_bytes(data[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * c1) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * c2) & M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16 :]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * c2) & M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * c1) & M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2


@pytest.mark.parametrize("length", [1, 2, 4, 7, 8, 9, 15, 16, 17, 21, 31, 32, 33, 64, 100])
@pytest.mark.parametrize("seed", [0, 42, 0xDEADBEEF])
def test_vector_matches_scalar(length, seed):
    rng = np.random.default_rng(length * 1000 + seed % 997)
    mat = rng.integers(0, 256, size=(50, length), dtype=np.uint8)
    got = murmur3_x64_128_low64(mat, seed)
    for row in range(50):
        expect = _scalar_murmur3_x64_128(mat[row].tobytes(), seed)[0]
        assert int(got[row]) == expect


def test_hash_one_known_kmers():
    # relative order assertion matching the reference unit test setup
    # (`lib/src/sketch_schemes/mash.rs:115-134`, seed 42): cc < ca < ac
    h = {k: hash_one(k.encode(), 42) for k in ("cc", "ca", "ac")}
    assert h["cc"] < h["ca"] < h["ac"]


def test_i64_bridge_roundtrip_and_order():
    rng = np.random.default_rng(7)
    u = rng.integers(0, 1 << 64, size=1000, dtype=np.uint64)
    i = u64_to_i64_shifted(u)
    assert i.dtype == np.int64
    back = i64_to_u64_shifted(i)
    assert np.array_equal(back, u)
    order_u = np.argsort(u, kind="stable")
    order_i = np.argsort(i, kind="stable")
    assert np.array_equal(order_u, order_i)
