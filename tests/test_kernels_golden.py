"""Golden-parity tests: kernels vs vectors transcribed from the reference's
unit/integration tests (onecodex/finch-rs). Each golden file records its
reference file:line provenance."""
import json
from pathlib import Path

import numpy as np
import pytest

from finchspark.kernels import (
    FilterParams,
    KmerCounts,
    SketchParams,
    bottom_k,
    cardinality,
    count_distinct,
    dna_canonical_kmers,
    filter_abundance,
    filter_strands,
    guess_filter_threshold,
    hash_one,
    hist_dense,
    mash_distance,
    merge_sketches,
    raw_distance,
    raw_distance_walk,
    scaled_keep,
    sketch_hashes,
)
from finchspark.sources.fasta import read_fasta

GOLDEN = Path(__file__).parent / "golden"


def load(name):
    return json.loads((GOLDEN / name).read_text())


def _sketch_from_pushes(pushes, seed):
    kmers = [p[0].encode() for p in pushes]
    extras = np.array([p[1] for p in pushes], dtype=np.int64)
    hashes = np.array([hash_one(k, seed) for k in kmers], dtype=np.uint64)
    return count_distinct(hashes, extras, kmers)


def test_mash_bottomk_golden():
    g = load("mash_bottomk.json")
    kc = _sketch_from_pushes(g["pushes"], g["seed"])
    kc = bottom_k(kc, g["size"])
    assert [k.decode() for k in kc.kmers] == g["expected"]["kmer_order"]
    assert kc.counts.tolist() == g["expected"]["counts"]
    assert kc.extra_counts.tolist() == g["expected"]["extra_counts"]
    assert np.all(np.diff(kc.hashes.astype(np.uint64)) > 0)


def test_scaled_keepall_golden():
    g = load("scaled_keepall.json")
    for scale in g["scales"]:
        kc = _sketch_from_pushes(g["pushes"], g["seed"])
        kc = scaled_keep(kc, g["size"], scale)
        assert [k.decode() for k in kc.kmers] == g["expected"]["kmer_order"]
        assert kc.counts.tolist() == g["expected"]["counts"]
        assert kc.extra_counts.tolist() == g["expected"]["extra_counts"]


def test_scaled_eviction_golden():
    g = load("scaled_eviction.json")
    kc = _sketch_from_pushes(g["pushes"], g["seed"])
    kc = scaled_keep(kc, g["size"], g["scale"])
    assert len(kc) == g["expected"]["n_survivors"]
    assert g["expected"]["evicted_kmer"].encode() not in kc.kmers


def test_scaled_pure_empty_golden():
    g = load("scaled_pure_empty.json")
    kc = _sketch_from_pushes(g["pushes"], g["seed"])
    kc = scaled_keep(kc, g["size"], g["scale"])
    assert len(kc) == g["expected"]["n_survivors"]


@pytest.mark.parametrize("fn", [raw_distance, raw_distance_walk])
@pytest.mark.parametrize("golden", ["raw_distance.json", "raw_distance_scaled.json"])
def test_raw_distance_golden(fn, golden):
    g = load(golden)
    for case in g["cases"]:
        q = np.array([int(x) for x in case["q"]], dtype=np.uint64)
        r = np.array([int(x) for x in case["r"]], dtype=np.uint64)
        cont, jac, common, total = fn(q, r, case["scale"])
        e = case["expected"]
        assert cont == pytest.approx(e[0])
        assert jac == pytest.approx(e[1])
        assert common == e[2]
        assert total == e[3]


def test_self_distance_golden():
    g = load("self_distance.json")
    kc = _sketch_from_pushes(g["pushes"], g["seed"])
    kc = scaled_keep(kc, g["size"], g["scale"])
    cont, jac, common, _ = raw_distance(kc.hashes, kc.hashes, g["scale"])
    assert jac == g["expected"]["jaccard"]
    assert cont == g["expected"]["containment"]
    assert common == g["expected"]["common"]


def test_guess_threshold_golden():
    g = load("guess_threshold.json")
    for case in g["cases"]:
        got = guess_filter_threshold(np.array(case["counts"], dtype=np.int64), case["level"])
        assert got == case["expected"], case


def _kc(hashes, counts, extra=None):
    h = np.array([int(x) for x in hashes], dtype=np.uint64)
    c = np.array(counts, dtype=np.int64)
    e = np.array(extra, dtype=np.int64) if extra is not None else np.zeros(len(h), np.int64)
    return KmerCounts(h, c, e)


def test_filter_abundance_golden():
    g = load("filter_abundance.json")
    for case in g["cases"]:
        kc = _kc(case["hashes"], case["counts"])
        out = filter_abundance(kc, case["low"], case["high"])
        assert [str(x) for x in out.hashes] == case["expected_hashes"]


def test_filter_strands_golden():
    g = load("filter_strands.json")
    for case in g["cases"]:
        kc = _kc(case["hashes"], case["counts"], case["extra"])
        out = filter_strands(kc, case["ratio"])
        assert [str(x) for x in out.hashes] == case["expected_hashes"]


def test_hist_golden():
    g = load("hist.json")
    for case in g["cases"]:
        h = hist_dense(np.array(case["counts"], dtype=np.int64))
        assert len(h) == case["expected_len"]
        for idx, val in case["expected_at"].items():
            assert h[int(idx)] == val


def test_cli_sketch_query_fa_golden():
    """The authoritative end-to-end parity check: canonical DNA shingling +
    murmur3 seed 0 + bottom-10 must reproduce the reference CLI's exact
    10 k-mers in hash order (`cli/tests/test_cli.rs:84-149`), for both mash
    and scaled sketch types."""
    g = load("cli_sketch_query_fa.json")
    records = read_fasta(Path(__file__).parent / "data" / "query.fa")
    assert len(records) == 3
    kmers: list[bytes] = []
    extras: list[int] = []
    for _, seq in records:
        for km, is_rc in dna_canonical_kmers(seq, g["k"]):
            kmers.append(km)
            extras.append(is_rc)
    hashes = np.array([hash_one(k, g["seed"]) for k in kmers], dtype=np.uint64)
    kc = count_distinct(hashes, np.array(extras, np.int64), kmers)

    got_mash = bottom_k(kc, g["n_hashes"])
    assert [k.decode() for k in got_mash.kmers] == g["expected_kmers_in_hash_order"]

    got_scaled = scaled_keep(kc, g["n_hashes"], g["scale"])
    assert [k.decode() for k in got_scaled.kmers[: g["n_hashes"]]] == (
        g["expected_kmers_in_hash_order"]
    )


def test_filter_pipeline_updates_low_cutoff():
    # `FilterParams::filter_counts` mutates abun_filter.0 with the guessed
    # cutoff when stricter (`lib/src/filtering.rs:56-87`)
    from finchspark.kernels import filter_counts

    kc = _kc(["1", "2", "3", "4"], [1, 10, 10, 9])
    fp = FilterParams(filter_on=True, err_filter=0.1)
    out = filter_counts(fp, kc)
    assert fp.abun_filter_low == 8
    assert [int(x) for x in out.hashes] == [2, 3, 4]


def test_merge_sketches_clip_rules():
    # merge semantics + clip (`lib/src/python.rs:24-100`)
    h, c, e = merge_sketches(
        [1, 5, 9], [1, 2, 3], [0, 1, 0], [5, 7], [10, 1], [1, 0], size=None, scale=None
    )
    assert h.tolist() == [1, 5, 7, 9]
    assert c.tolist() == [1, 12, 1, 3]
    assert e.tolist() == [0, 2, 0, 0]
    # size-only clip
    h, c, _ = merge_sketches([1, 5, 9], [1, 2, 3], [0, 0, 0], [5, 7], [10, 1], [0, 0], 2, None)
    assert h.tolist() == [1, 5]
    # scale clip: max_hash = U64::MAX // 100
    big = (2**64 - 1) // 100 + 5
    h, _, _ = merge_sketches([1, big], [1, 1], [0, 0], [2], [1], [0], None, 0.01)
    assert h.tolist() == [1, 2]
    # scale+size: big hash survives while idx < size
    h, _, _ = merge_sketches([1, big], [1, 1], [0, 0], [2], [1], [0], 3, 0.01)
    assert h.tolist() == [1, 2, big]


def test_cardinality_f32_semantics():
    # KMV estimate with reference f32 arithmetic (`lib/src/statistics.rs:8-23`)
    assert cardinality(np.array([], dtype=np.uint64)) == 0
    h = np.array([2**62, 2**63, 2**64 - 2], dtype=np.uint64)
    got = cardinality(h)
    expect = int(np.float32(2) / np.float32(np.float32(2**64 - 2) / np.float32(2**64 - 1)))
    assert got == expect


def test_mash_distance_formula():
    assert mash_distance(1.0, 21) == 0.0
    assert mash_distance(0.0, 21) == 1.0
    import math

    j = 0.5
    assert mash_distance(j, 21) == pytest.approx(-math.log(2 * j / (1 + j)) / 21)


def test_sketch_hashes_end_to_end_mash_vs_scaled():
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 1 << 64, size=5000, dtype=np.uint64)
    p = SketchParams(sketch_type="mash", kmers_to_sketch=128, final_size=128)
    kc = sketch_hashes(hashes, p)
    assert len(kc) == 128
    assert np.all(np.diff(kc.hashes.astype(np.uint64)) > 0)
    ps = SketchParams(sketch_type="scaled", kmers_to_sketch=0, scale=0.01)
    kcs = sketch_hashes(hashes, ps)
    assert np.all(kcs.hashes <= np.uint64((2**64 - 1) // 100))
