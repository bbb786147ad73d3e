"""Segmented filter pipeline == scalar filter_counts per doc, on randomized
sketches (the scalar kernel is the op-for-op reference transcription)."""
from dataclasses import replace

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finchspark.kernels import FilterParams, KmerCounts, filter_counts
from finchspark.kernels.segfilter import (
    segment_filter_counts,
    segment_guess_thresholds,
)
from finchspark.kernels.sketch import bottom_k, guess_filter_threshold


def _scalar_pipeline(hashes, counts, extras, offsets, filters, final_size):
    fh, fc, fe, per = [], [], [], []
    for i in range(len(offsets) - 1):
        sl = slice(offsets[i], offsets[i + 1])
        kc = KmerCounts(hashes[sl], counts[sl], extras[sl])
        out = filter_counts(replace(filters), kc)
        if final_size is not None:
            out = bottom_k(out, final_size)
        fh.append(out.hashes)
        fc.append(out.counts)
        fe.append(out.extra_counts)
        per.append(len(out))
    off = np.zeros(len(offsets), dtype=np.int64)
    np.cumsum(per, out=off[1:])
    return (
        np.concatenate(fh) if fh else np.empty(0, np.uint64),
        np.concatenate(fc) if fc else np.empty(0, np.int64),
        np.concatenate(fe) if fe else np.empty(0, np.int64),
        off,
    )


def _random_batch(rng, n_docs, max_len, max_count):
    lens = [rng.integers(0, max_len + 1) for _ in range(n_docs)]
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    hashes = np.sort(rng.integers(0, 2**63, total).astype(np.uint64))
    # re-sort within segments (distinct ascending per doc like real sketches)
    for i in range(n_docs):
        seg = np.unique(hashes[offsets[i] : offsets[i + 1]])
        pad = rng.integers(0, 2**63, offsets[i + 1] - offsets[i] - len(seg))
        seg = np.unique(np.concatenate([seg, pad.astype(np.uint64)]))[
            : offsets[i + 1] - offsets[i]
        ]
        while len(seg) < offsets[i + 1] - offsets[i]:
            seg = np.unique(
                np.concatenate(
                    [seg, rng.integers(0, 2**63, 4).astype(np.uint64)]
                )
            )[: offsets[i + 1] - offsets[i]]
        hashes[offsets[i] : offsets[i + 1]] = np.sort(seg)
    counts = rng.integers(1, max_count + 1, total).astype(np.int64)
    extras = np.array(
        [rng.integers(0, c + 1) for c in counts], dtype=np.int64
    )
    return hashes, counts, extras, offsets


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize(
    "filters,final_size",
    [
        (FilterParams(filter_on=True, err_filter=0.21), 16),
        (FilterParams(filter_on=True, err_filter=0.5, abun_filter_low=2), 8),
        (FilterParams(filter_on=True, abun_filter_low=2, abun_filter_high=5), None),
        (FilterParams(filter_on=True, strand_filter=0.25, err_filter=0.1), 32),
        (FilterParams(filter_on=False), 4),
        (FilterParams(filter_on=True), None),
    ],
)
def test_segment_filter_matches_scalar(seed, filters, final_size):
    rng = np.random.default_rng(seed)
    h, c, e, off = _random_batch(rng, n_docs=17, max_len=60, max_count=40)
    gh, gc, ge, goff = segment_filter_counts(h, c, e, off, filters, final_size)
    wh, wc, we, woff = _scalar_pipeline(h, c, e, off, filters, final_size)
    assert np.array_equal(goff, woff)
    assert np.array_equal(gh, wh)
    assert np.array_equal(gc, wc)
    assert np.array_equal(ge, we)


@settings(max_examples=60, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=60), max_size=80),
    level=st.floats(min_value=0.01, max_value=1.0),
)
def test_segment_guess_threshold_matches_scalar(counts, level):
    c = np.array(counts, dtype=np.int64)
    off = np.array([0, len(c)], dtype=np.int64)
    got = segment_guess_thresholds(c, off, level)[0]
    want = guess_filter_threshold(c, level)
    assert got == want


def test_guess_threshold_multiple_docs_independent():
    rng = np.random.default_rng(7)
    segs = [rng.integers(1, 30, rng.integers(0, 50)).astype(np.int64) for _ in range(25)]
    counts = np.concatenate(segs)
    off = np.zeros(len(segs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=off[1:])
    got = segment_guess_thresholds(counts, off, 0.21)
    for i, s in enumerate(segs):
        assert got[i] == guess_filter_threshold(s, 0.21), i


def test_matrix_guard_fallback_matches():
    import finchspark.kernels.segfilter as sf

    rng = np.random.default_rng(11)
    segs = [rng.integers(1, 500, 40).astype(np.int64) for _ in range(8)]
    counts = np.concatenate(segs)
    off = np.zeros(9, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=off[1:])
    want = sf.segment_guess_thresholds(counts, off, 0.3)
    old = sf._MAX_HIST_CELLS
    try:
        sf._MAX_HIST_CELLS = 64  # force the per-doc fallback branch
        got = sf.segment_guess_thresholds(counts, off, 0.3)
    finally:
        sf._MAX_HIST_CELLS = old
    assert np.array_equal(got, want)


def test_guess_thresholds_no_recursion_when_cells_budget_tiny(monkeypatch):
    """When n_docs alone exceeds the histogram cell budget (cap clamps to 1
    with no outlier doc to peel off), the kernel must fall back to the scalar
    loop instead of recursing on identical arguments forever."""
    import numpy as np

    from finchspark.kernels import segfilter
    from finchspark.kernels.sketch import guess_filter_threshold

    monkeypatch.setattr(segfilter, "_MAX_HIST_CELLS", 2)
    counts = np.array([1, 1, 2, 1, 1, 3, 3], dtype=np.int64)
    offsets = np.array([0, 2, 4, 7], dtype=np.int64)
    got = segfilter.segment_guess_thresholds(counts, offsets, 0.2)
    want = [
        guess_filter_threshold(counts[s:e], 0.2)
        for s, e in zip(offsets[:-1], offsets[1:])
    ]
    assert got.tolist() == want
