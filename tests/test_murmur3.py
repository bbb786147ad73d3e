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


def test_c_kernel_bit_parity_with_numpy():
    """The optional C sliding kernel must be bit-identical to the numpy
    sliding form (which is itself golden-tested against the reference)
    across alphabet sizes, k values incl. block/tail boundaries, and seeds."""
    import numpy as np

    from finchspark.kernels import cmurmur
    from finchspark.kernels.murmur3 import _murmur3_sliding_low64_numpy

    if not cmurmur.available():
        import pytest

        pytest.skip("no C compiler available")
    rng = np.random.default_rng(13)
    for n in (1, 7, 64, 1000, 50_000):
        blob = rng.integers(0, 256, n).astype(np.uint8)
        for k in (1, 7, 8, 9, 15, 16, 17, 21, 31, 32, 33, 40):
            if n < k:
                continue
            for seed in (0, 42):
                got = cmurmur.sliding_low64_c(blob, k, seed)
                want = _murmur3_sliding_low64_numpy(blob, k, seed)
                assert np.array_equal(got, want), (n, k, seed)


def test_dispatch_matches_scalar_golden():
    import numpy as np

    from finchspark.kernels.murmur3 import hash_one, murmur3_sliding_low64

    blob = np.frombuffer(b"the quick brown fox jumps over the lazy dog", np.uint8)
    got = murmur3_sliding_low64(blob, 21, 0)
    for i in (0, 5, len(got) - 1):
        assert int(got[i]) == hash_one(bytes(blob[i : i + 21]), 0)


def test_c_segment_sort_parity():
    import numpy as np

    from finchspark.kernels import cmurmur

    if not cmurmur.available():
        import pytest

        pytest.skip("no C compiler")
    rng = np.random.default_rng(2)
    lens = [0, 1, 5, 96, 97, 500, 10_000, 3]
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    vals = rng.integers(0, 2**63, off[-1]).astype(np.uint64)
    # duplicate-heavy tail segment to exercise the skip-pass branch
    vals[off[-2]:off[-1]] = vals[off[-2]]
    got = vals.copy()
    assert cmurmur.segment_sort_u64_c(got, off)
    for i in range(len(lens)):
        seg = np.sort(vals[off[i]:off[i+1]])
        assert np.array_equal(got[off[i]:off[i+1]], seg), i


def test_c_simhash_parity():
    import numpy as np

    from finchspark.kernels import cmurmur
    from finchspark.kernels.simhash import simhash64

    if not cmurmur.available():
        import pytest

        pytest.skip("no C compiler")
    rng = np.random.default_rng(4)
    lens = [0, 1, 17, 1000, 2]
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    hashes = rng.integers(0, 2**64, off[-1], dtype=np.uint64)
    got = cmurmur.simhash64_segments_c(hashes, off)
    for i in range(len(lens)):
        assert int(got[i]) == simhash64(hashes[off[i]:off[i+1]]), i


def test_segment_count_distinct_c_vs_numpy():
    """The contiguous-doc C fast path must equal the argsort path exactly."""
    import numpy as np

    from finchspark.kernels import cmurmur
    from finchspark.kernels.segment import segment_count_distinct

    rng = np.random.default_rng(9)
    n_docs = 40
    lens = rng.integers(0, 400, n_docs)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    hashes = rng.integers(0, 50, len(doc_idx)).astype(np.uint64)  # many dups
    want = segment_count_distinct(doc_idx, hashes, n_docs, return_first_idx=True)[:4]
    got = segment_count_distinct(doc_idx, hashes, n_docs)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
    if cmurmur.available():
        # shuffled doc order must fall back to the argsort path, same result
        perm = rng.permutation(len(doc_idx))
        got2 = segment_count_distinct(doc_idx[perm], hashes[perm], n_docs)
        for g, w in zip(got2, want):
            assert np.array_equal(g, w)
