"""Segmented filter pipeline: F1–F4 for EVERY document in a batch at once.

Batch form of `kernels.sketch.filter_counts` + the mash final_size truncation
(`FilterParams::filter_counts`, `lib/src/filtering.rs:56-87`): strand-ratio
filter → dynamic error-depth cutoff (`guess_filter_threshold`,
`filtering.rs:147-195`) → abundance range filter → bottom-`final_size`
truncate. Zero per-document Python: the per-doc depth histograms live in one
(n_docs × max_depth) matrix, the reference's cumulative walk becomes a row
cumsum + first-True argmax, and the lagging sliding-window minimum scan
becomes a flat segmented min with last-tie-wins semantics.

Semantics notes (all transcribed from the reference, golden/property-tested
against the scalar kernel):
- the cumulative walk's weight at bin b equals b while unbroken, so the break
  point is the first b with sum(j*hist[j], j<=b) > level*total; no break ⇒
  wgt = the doc's own max depth (the walk runs over the doc's dense hist);
- the window scan compares the CURRENT window sum s BEFORE sliding, records
  index j = window_end+1, and uses `<=` (ties → latest) — i.e. threshold =
  w + t* + 1 with t* = last argmin over window sums S[0..wgt-w-1], or w when
  the loop body never runs;
- the guessed cutoff REPLACES abun_filter_low when stricter
  (`filtering.rs:76-81`) — realized here as max(cutoff, low).

The histogram matrix is (n_docs × batch max depth); content shingle depths
are tiny (almost always 1), and the signature stage's byte-bounded
sub-batching caps n_docs, so the matrix stays small. A pathological batch
(one shingle repeated millions of times) is guarded by _MAX_HIST_CELLS with
a per-doc scalar fallback for only the offending docs.
"""
from __future__ import annotations

import numpy as np

from .sketch import FilterParams, guess_filter_threshold

_MAX_HIST_CELLS = 1 << 26  # 64M int64 cells ≈ 512 MB hard guard


def _segment_pos(keep: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """0-based position among kept entries within each segment."""
    c = np.cumsum(keep, dtype=np.int64)
    base = np.zeros(len(offsets) - 1, dtype=np.int64)
    nonzero = offsets[:-1] > 0
    base[nonzero] = c[offsets[:-1][nonzero] - 1]
    return c - np.repeat(base, np.diff(offsets)) - 1


def segment_guess_thresholds(
    counts: np.ndarray, offsets: np.ndarray, filter_level: float
) -> np.ndarray:
    """Per-document `guess_filter_threshold` over segmented count arrays.

    Returns an int64 array of length n_docs (1 for empty docs, matching the
    scalar kernel's `wgt_cutoff == 0 → 1` path... empty hist ⇒ wgt 0 ⇒ 1).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    n_docs = len(offsets) - 1
    out = np.ones(n_docs, dtype=np.int64)
    if len(counts) == 0 or n_docs == 0:
        return out
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))

    maxd = int(counts.max())
    if maxd <= 0:
        return out
    if n_docs * maxd > _MAX_HIST_CELLS:
        # scalar fallback only for docs whose max depth is extreme; the rest
        # still go through the matrix path
        doc_max = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(doc_max, doc_idx, counts)
        cap = max(1, _MAX_HIST_CELLS // max(n_docs, 1))
        big = doc_max > cap
        if not big.any():
            # n_docs alone exceeds the cell budget (cap clamped with no
            # outlier doc to peel off) — recursing would loop forever on
            # identical arguments, so do the whole batch scalar instead
            for d in range(n_docs):
                seg = counts[offsets[d] : offsets[d + 1]]
                if len(seg):
                    out[d] = guess_filter_threshold(seg, filter_level)
            return out
        for d in np.nonzero(big)[0]:
            seg = counts[offsets[d] : offsets[d + 1]]
            out[d] = guess_filter_threshold(seg, filter_level)
        small_mask = ~big[doc_idx]
        if not small_mask.any():
            return out
        sub = segment_guess_thresholds(
            counts[small_mask],
            _rebuild_offsets(doc_idx[small_mask], n_docs),
            filter_level,
        )
        out[~big] = sub[~big]
        return out

    # H[doc, depth-1] = #hashes of doc with that depth (dense per-doc hist)
    H = np.bincount(doc_idx * maxd + (counts - 1), minlength=n_docs * maxd).reshape(
        n_docs, maxd
    )
    doc_nonempty = H.any(axis=1)
    doc_maxd = np.where(
        doc_nonempty, maxd - np.argmax(H[:, ::-1] != 0, axis=1), 0
    ).astype(np.int64)

    depths = np.arange(maxd, dtype=np.int64)
    total = (H * (depths + 1)).sum(axis=1).astype(np.float64)
    cutoff_amt = filter_level * total
    # cumulative walk: first bin b with sum(j*H[j], j<=b) > cutoff_amt
    cum = np.cumsum(H * depths, axis=1)
    broken = cum > cutoff_amt[:, None]
    any_break = broken.any(axis=1)
    wgt = np.where(any_break, np.argmax(broken, axis=1), doc_maxd).astype(np.int64)

    # wgt == 0 (or empty doc) → threshold 1
    active = wgt > 0
    if not active.any():
        return out

    win = np.maximum(1, wgt // 20)
    # docs whose scan loop never runs (wgt - win <= 0): threshold = win
    no_loop = active & (wgt - win <= 0)
    out[no_loop] = win[no_loop]

    loop = active & (wgt - win > 0)
    if loop.any():
        docs = np.nonzero(loop)[0]
        n_t = (wgt - win)[docs]  # iterations per doc: t = 0..n_t-1
        flat_doc = np.repeat(docs, n_t)
        starts = np.zeros(len(docs), dtype=np.int64)
        starts[1:] = np.cumsum(n_t)[:-1]
        t_flat = np.arange(n_t.sum(), dtype=np.int64) - np.repeat(starts, n_t)
        # window sum S[t] = CS[t+w] - CS[t] on the doc's dense hist
        CS = np.zeros((n_docs, maxd + 1), dtype=np.int64)
        np.cumsum(H, axis=1, out=CS[:, 1:])
        w_flat = win[flat_doc]
        S = CS[flat_doc, t_flat + w_flat] - CS[flat_doc, t_flat]
        # last argmin per doc (ties → latest, `<=` in the reference walk)
        smin = np.minimum.reduceat(S, starts)
        is_min = S == np.repeat(smin, n_t)
        t_star = np.maximum.reduceat(np.where(is_min, t_flat, -1), starts)
        out[docs] = win[docs] + t_star + 1
    return out


def _rebuild_offsets(doc_idx: np.ndarray, n_docs: int) -> np.ndarray:
    per = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(per, out=off[1:])
    return off


def segment_filter_counts(
    hashes: np.ndarray,
    counts: np.ndarray,
    extras: np.ndarray,
    offsets: np.ndarray,
    filters: FilterParams,
    final_size: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch F1–F4 over segmented sketches; returns (hashes, counts, extras,
    offsets) after the filter pipeline and optional mash truncation.

    Equals running `filter_counts` + `bottom_k(final_size)` per document with
    a fresh FilterParams copy per doc (the reference clones params per file).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    hashes = np.asarray(hashes, dtype=np.uint64)
    counts = np.asarray(counts, dtype=np.int64)
    extras = np.asarray(extras, dtype=np.int64)
    n_docs = len(offsets) - 1
    filter_on = filters.filter_on is True
    if not filter_on or len(hashes) == 0:
        if final_size is not None:
            keep = (
                np.arange(len(hashes))
                - np.repeat(offsets[:-1], np.diff(offsets))
                < final_size
            )
            return _apply(hashes, counts, extras, keep, offsets, n_docs)
        return hashes, counts, extras, offsets

    keep = np.ones(len(hashes), dtype=bool)

    # F4 strand-ratio filter (`filtering.rs:409-432`)
    if filters.strand_filter > 0.0:
        lowest = np.minimum(extras, counts - extras)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = lowest.astype(np.float64) / counts.astype(np.float64)
        keep &= (counts < 16) | (ratio >= filters.strand_filter)

    # F2 dynamic error cutoff on the POST-strand counts (`filtering.rs:60-87`)
    low = np.full(
        n_docs,
        filters.abun_filter_low if filters.abun_filter_low is not None else 0,
        dtype=np.int64,
    )
    if filters.err_filter > 0.0:
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
        kept_counts = counts[keep]
        kept_off = _rebuild_offsets(doc_idx[keep], n_docs)
        guessed = segment_guess_thresholds(kept_counts, kept_off, filters.err_filter)
        low = np.maximum(low, guessed)

    # F3 abundance range (`filtering.rs:329-343`)
    if (
        filters.err_filter > 0.0
        or filters.abun_filter_low is not None
        or filters.abun_filter_high is not None
    ):
        hi = 0xFFFFFFFF if filters.abun_filter_high is None else filters.abun_filter_high
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
        keep &= (counts >= low[doc_idx]) & (counts <= hi)

    if final_size is not None:
        keep &= _segment_pos(keep, offsets) < final_size
    return _apply(hashes, counts, extras, keep, offsets, n_docs)


def _apply(hashes, counts, extras, keep, offsets, n_docs):
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    kd = doc_idx[keep]
    return (
        hashes[keep],
        counts[keep],
        extras[keep],
        _rebuild_offsets(kd, n_docs),
    )
