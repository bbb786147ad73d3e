"""Property tests (hypothesis) mirroring the reference's proptest suites, plus
invariants of the batch kernels."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from finchspark.kernels import (
    SketchParams,
    batch_shingle_hashes,
    hamming64,
    oph_signatures,
    raw_distance,
    raw_distance_walk,
    shingle_hashes,
    simhash64,
    simhash64_batch,
    sketch_hashes,
)

u64s = st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=64)


@given(q=u64s, r=u64s)
@settings(max_examples=200)
def test_raw_distance_commutes(q, r):
    # mirrors `lib/src/distance.rs:176-185`. NB: the reference proptest draws
    # full-range random u64s, so the two lists essentially never share a value
    # and the property is only ever exercised with common == 0. With actual
    # overlaps, containment (= common / ref-consumed) is directional BY DESIGN
    # (`distance.rs:118`); jaccard/common/total are the symmetric components.
    qa = np.unique(np.array(q, dtype=np.uint64))
    ra = np.unique(np.array(r, dtype=np.uint64))
    fwd = raw_distance(qa, ra, 0.0)
    rev = raw_distance(ra, qa, 0.0)
    assert fwd[1:] == rev[1:]
    if len(np.intersect1d(qa, ra)) == 0:
        # the regime the reference proptest actually covers: full equality
        assert fwd == rev


@given(q=u64s, r=u64s, scale_pow=st.integers(min_value=0, max_value=18))
@settings(max_examples=200)
def test_raw_distance_vectorized_matches_walk(q, r, scale_pow):
    qa = np.unique(np.array(q, dtype=np.uint64))
    ra = np.unique(np.array(r, dtype=np.uint64))
    scale = 10.0**-scale_pow if scale_pow else 0.0
    assert raw_distance(qa, ra, scale) == raw_distance_walk(qa, ra, scale)


@given(
    pairs=st.lists(st.tuples(u64s, u64s), min_size=0, max_size=8),
    scale_pow=st.integers(min_value=0, max_value=18),
)
@settings(max_examples=100)
def test_raw_distance_many_matches_scalar(pairs, scale_pow):
    import numpy as np

    from finchspark.kernels.distance import raw_distance_many

    scale = 10.0**-scale_pow if scale_pow else 0.0
    qs = [np.unique(np.array(q, dtype=np.uint64)) for q, _ in pairs]
    rs = [np.unique(np.array(r, dtype=np.uint64)) for _, r in pairs]
    qoff = np.cumsum([0] + [len(x) for x in qs])
    roff = np.cumsum([0] + [len(x) for x in rs])
    qv = np.concatenate(qs) if qs else np.empty(0, np.uint64)
    rv = np.concatenate(rs) if rs else np.empty(0, np.uint64)
    cont, jac, common, total = raw_distance_many(qv, qoff, rv, roff, scale)
    for i, (q, r) in enumerate(zip(qs, rs)):
        expect = raw_distance(q, r, scale)
        assert (cont[i], jac[i], common[i], total[i]) == expect, i


@given(st.binary(min_size=500, max_size=2000))
@settings(max_examples=50)
def test_pure_scaled_only_below_max_hash(data):
    # mirrors `lib/src/sketch_schemes/scaled.rs:202-213`
    hashes = shingle_hashes(data, 4, seed=42)
    p = SketchParams(sketch_type="scaled", kmers_to_sketch=0, scale=0.01, hash_seed=42)
    kc = sketch_hashes(hashes, p)
    assert np.all(kc.hashes <= np.uint64((2**64 - 1) // 100))


@given(st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=20))
@settings(max_examples=50)
def test_batch_shingles_match_per_doc(contents):
    k = 5
    hashes, offsets = batch_shingle_hashes(contents, k, seed=0)
    for i, c in enumerate(contents):
        expect = shingle_hashes(c, k, seed=0)
        got = hashes[offsets[i] : offsets[i + 1]]
        assert np.array_equal(got, expect)


@given(st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=12))
@settings(max_examples=30)
def test_simhash_batch_matches_scalar(contents):
    k = 4
    hashes, offsets = batch_shingle_hashes(contents, k, seed=0)
    batch = simhash64_batch(hashes, offsets)
    for i in range(len(contents)):
        scalar = simhash64(hashes[offsets[i] : offsets[i + 1]])
        assert int(batch[i]) == scalar


def test_simhash_similar_docs_close():
    a = b"def compute_totals(rows):\n    return sum(r.total for r in rows)\n" * 8
    b = a.replace(b"total", b"value")
    c = bytes(reversed(a))
    ha, off = batch_shingle_hashes([a, b, c], 8, seed=0)
    sims = simhash64_batch(ha, off)
    d_ab = hamming64(sims[:1], sims[1:2])[0]
    d_ac = hamming64(sims[:1], sims[2:3])[0]
    assert d_ab < d_ac


def test_oph_identical_docs_identical_sigs():
    a = b"x = 1\ny = 2\nz = x + y\n" * 10
    hashes, offsets = batch_shingle_hashes([a, a, b"completely different body"], 8, 0)
    sig = oph_signatures(hashes, offsets, 64)
    assert np.array_equal(sig[0], sig[1])
    assert not np.array_equal(sig[0], sig[2])


def test_oph_empty_doc_sentinel():
    hashes, offsets = batch_shingle_hashes([b"", b"abcdefghij"], 8, 0)
    sig = oph_signatures(hashes, offsets, 16)
    assert np.all(sig[0] == np.uint64(0xFFFFFFFFFFFFFFFF))
    assert not np.all(sig[1] == np.uint64(0xFFFFFFFFFFFFFFFF))


def test_oph_similar_docs_share_bands():
    from finchspark.kernels import band_hashes

    base = (b"for i in range(100):\n    out.append(transform(i, mode='fast'))\n" * 6)
    variant = base.replace(b"fast", b"slow")
    other = bytes([(i * 37 + 11) % 256 for i in range(400)])
    hashes, offsets = batch_shingle_hashes([base, variant, other], 8, 0)
    sig = oph_signatures(hashes, offsets, 64)
    bands = band_hashes(sig, n_bands=16, n_rows=4)
    shared_sim = int((bands[0] == bands[1]).sum())
    shared_diff = int((bands[0] == bands[2]).sum())
    assert shared_sim >= 1
    assert shared_diff == 0
