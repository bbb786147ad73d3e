"""Suffix-array span detection: maximal common substrings between documents.

North-star extension (no reference counterpart): near-exact SPAN dedup inside
candidate clusters — e.g. a license header or vendored function shared between
otherwise-different files. Exact semantics: all maximal common substrings of
length >= min_len between two byte strings, found via a suffix array
(prefix-doubling, O(n log^2 n), pure numpy) + LCP array, scanning adjacent
suffix pairs that originate from different documents.

The LCP array is computed by vectorized binary descent over the
prefix-doubling rank tables (no per-byte scan): for adjacent suffixes x, y
and level length ℓ from largest to 1, extend h by ℓ whenever
rank_ℓ[x+h] == rank_ℓ[y+h]. Equality of level-ℓ ranks implies the two
length-ℓ blocks match (out-of-range padding ranks are unique per position,
so a truncated block never aliases a full one), and the level lengths are
consecutive powers of two, so h converges to the exact LCP — O(n log n)
total with O(1) numpy calls per level, replacing the Kasai per-byte loop.

The Spark operator (`finchspark.operators.spandedup`) runs this kernel per
candidate pair/cluster inside applyInPandas; the kernel itself is
Spark-free and golden-testable.
"""
from __future__ import annotations

import numpy as np


def _suffix_array_levels(
    s: np.ndarray,
) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """(suffix array, [(prefix_len, dense rank array), ...]) by prefix
    doubling; levels are consecutive powers of two up to the first length at
    which all ranks are distinct."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    # copy=True: the rank/tmp buffer swap below would otherwise WRITE into
    # the caller's array when it is already int64
    rank = np.array(s, dtype=np.int64, copy=True)
    # dense single-char ranks so levels are comparable across positions
    _, rank = np.unique(rank, return_inverse=True)
    rank = rank.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    levels: list[tuple[int, np.ndarray]] = [(1, rank)]
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        if rank[sa[-1]] == n - 1:
            break
        # rank of suffix i = (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        # recompute dense ranks along the new order
        tmp[order[0]] = 0
        prev_same = (rank[order[1:]] == rank[order[:-1]]) & (
            second[order[1:]] == second[order[:-1]]
        )
        tmp[order[1:]] = np.cumsum(~prev_same)
        # copy: `tmp` stays a scratch buffer; the stored level arrays must
        # never alias it (they'd be mutated by the next doubling round)
        rank = tmp.copy()
        sa = order
        k <<= 1
        levels.append((k, rank))
    return sa.astype(np.int64), levels


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array by prefix doubling (numpy lexsort)."""
    sa, _ = _suffix_array_levels(s)
    return sa


def _lcp_from_levels(
    sa: np.ndarray, levels: list[tuple[int, np.ndarray]], n: int
) -> np.ndarray:
    """Vectorized binary-descent LCP over adjacent suffix-array entries."""
    if n < 2:
        return np.zeros(max(n - 1, 0), dtype=np.int64)
    x = sa[:-1]
    y = sa[1:]
    h = np.zeros(n - 1, dtype=np.int64)
    for ell, rk in reversed(levels):
        xi = x + h
        yi = y + h
        inb = (xi < n) & (yi < n)
        eq = np.zeros(n - 1, dtype=bool)
        eq[inb] = rk[xi[inb]] == rk[yi[inb]]
        h = h + np.where(eq, ell, 0)
    return h


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """lcp[i] = LCP(suffix sa[i], suffix sa[i+1]), vectorized (see module
    docstring). `sa` must be the suffix array of `s`."""
    n = len(s)
    if n < 2:
        return np.zeros(max(n - 1, 0), dtype=np.int64)
    _, levels = _suffix_array_levels(s)
    return _lcp_from_levels(sa, levels, n)


def suffix_array_and_lcp(s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One-pass (suffix array, adjacent LCP array) — the hot-path entry used
    by `common_spans` (avoids recomputing the rank levels)."""
    sa, levels = _suffix_array_levels(s)
    return sa, _lcp_from_levels(sa, levels, len(s))


def _joint_array(a: bytes, b: bytes) -> np.ndarray:
    la, lb = len(a), len(b)
    s = np.empty(la + lb + 1, dtype=np.int64)
    s[:la] = np.frombuffer(a, dtype=np.uint8)
    s[la] = 256  # sentinel outside byte alphabet
    s[la + 1 :] = np.frombuffer(b, dtype=np.uint8)
    return s


def _spans_from_sa(
    sa: np.ndarray, lcp: np.ndarray, la: int, min_len: int, max_spans: int
) -> list[tuple[int, int, int]]:
    """Greedy maximal cross-document spans from a joint suffix array."""
    from_a = sa < la
    cross = from_a[:-1] != from_a[1:]
    good = np.nonzero(cross & (lcp >= min_len))[0]
    spans: list[tuple[int, int, int]] = []
    # greedy suppression of spans fully contained in an already-kept span
    kept_a: list[tuple[int, int]] = []
    order = good[np.argsort(-lcp[good], kind="stable")]
    for i in order[: max_spans * 4]:
        pa = int(sa[i] if from_a[i] else sa[i + 1])
        pb = int((sa[i + 1] if from_a[i] else sa[i]) - la - 1)
        ln = int(lcp[i])
        if any(x0 <= pa and pa + ln <= x1 for x0, x1 in kept_a):
            continue
        spans.append((pa, pb, ln))
        kept_a.append((pa, pa + ln))
        if len(spans) >= max_spans:
            break
    return spans


def common_spans(
    a: bytes, b: bytes, min_len: int = 32, max_spans: int = 64
) -> list[tuple[int, int, int]]:
    """Maximal common substrings >= min_len as (pos_a, pos_b, length).

    Builds one suffix array over a + SEP + b (SEP = a sentinel value 256
    outside the byte alphabet, so no match can cross the boundary) and
    reports adjacent cross-document suffix pairs with LCP >= min_len,
    right-maximal by the LCP construction; trivially-overlapping shorter
    echoes of a longer span are suppressed greedily.
    """
    la, lb = len(a), len(b)
    if la < min_len or lb < min_len:
        return []
    sa, lcp = suffix_array_and_lcp(_joint_array(a, b))
    spans = _spans_from_sa(sa, lcp, la, min_len, max_spans)
    spans.sort()
    return spans


def _covered_mask(sa: np.ndarray, lcp: np.ndarray, la: int, min_len: int) -> np.ndarray:
    """EXACT coverage of `a` by common substrings >= min_len, vectorized.

    A byte p of `a` lies in a common substring of length >= min_len iff some
    min_len-gram window containing p is common (clip any longer occurrence to
    a window around p). A min_len-gram at position i is common iff suffix
    A_i shares a >= min_len prefix with SOME B-suffix — i.e. they sit in the
    same maximal SA block whose adjacent LCPs are all >= min_len (LCP of two
    suffixes = min of adjacent LCPs between them). Block decomposition +
    bincount + a diff-array window union: exact, no per-span loop, and —
    unlike a union over the reported adjacent-pair spans — not blind to
    repeated occurrences inside `a` (an A-occurrence whose SA neighbors are
    both A-suffixes has no adjacent cross pair but IS covered).
    """
    n = len(sa)
    block = np.zeros(n, dtype=np.int64)
    block[1:] = np.cumsum(lcp < min_len)
    is_b = sa > la  # strictly: the sentinel at `la` is its own block anyway
    has_b = np.bincount(block[is_b], minlength=int(block[-1]) + 1) > 0
    a_starts = sa[(sa < la) & has_b[block]]
    covered = np.zeros(la, dtype=bool)
    if len(a_starts):
        delta = np.zeros(la + 1, dtype=np.int64)
        np.add.at(delta, a_starts, 1)
        np.add.at(delta, a_starts + min_len, -1)
        covered = np.cumsum(delta[:-1]) > 0
    return covered


def spans_and_coverage(
    a: bytes, b: bytes, min_len: int = 32, max_spans: int = 64
) -> tuple[list[tuple[int, int, int]], float]:
    """(spans, coverage_a) from ONE suffix-array pass.

    `spans` is the greedy bounded selection of maximal cross-document spans
    (`common_spans` semantics); `coverage_a` is EXACT — the fraction of A's
    bytes lying in ANY common substring >= min_len (see `_covered_mask`),
    independent of the span-list bound.
    """
    la, lb = len(a), len(b)
    if la < min_len or lb < min_len or la == 0:
        return [], 0.0
    sa, lcp = suffix_array_and_lcp(_joint_array(a, b))
    spans = sorted(_spans_from_sa(sa, lcp, la, min_len, max_spans))
    coverage = float(_covered_mask(sa, lcp, la, min_len).mean())
    return spans, coverage


def span_coverage(a: bytes, b: bytes, min_len: int = 32) -> float:
    """Fraction of `a`'s bytes covered by common substrings >= min_len with
    `b` — the span analogue of containment. Exact (`_covered_mask`)."""
    la = len(a)
    if la == 0 or la < min_len or len(b) < min_len:
        return 0.0
    sa, lcp = suffix_array_and_lcp(_joint_array(a, b))
    return float(_covered_mask(sa, lcp, la, min_len).mean())


def coverage_islands(a: bytes, b: bytes, min_len: int = 32) -> tuple[int, int, float]:
    """(n_islands, longest_island, coverage_a): the contiguous runs of A's
    bytes covered by ANY common substring >= min_len with `b`.

    Unlike the greedy bounded span list (`spans_and_coverage`), these are
    pure string properties — the covered set is the union of min_len-windows
    of common min_len-grams — so a SQL oracle can reproduce them exactly
    (entry `span_islands`)."""
    la = len(a)
    if la == 0 or la < min_len or len(b) < min_len:
        return 0, 0, 0.0
    sa, lcp = suffix_array_and_lcp(_joint_array(a, b))
    covered = _covered_mask(sa, lcp, la, min_len)
    if not covered.any():
        return 0, 0, 0.0
    d = np.diff(covered.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if covered[0]:
        starts = np.r_[0, starts]
    if covered[-1]:
        ends = np.r_[ends, la]
    lens = ends - starts
    return int(len(lens)), int(lens.max()), float(covered.mean())
