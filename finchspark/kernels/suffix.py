"""Suffix-array span detection: maximal common substrings between documents.

North-star extension (no reference counterpart): near-exact SPAN dedup inside
candidate clusters — e.g. a license header or vendored function shared between
otherwise-different files. Exact semantics: all maximal common substrings of
length >= min_len between two byte strings, found via a suffix array
(prefix-doubling, O(n log^2 n), pure numpy) + Kasai LCP array, scanning
adjacent suffix pairs that originate from different documents.

The Spark operator (`finchspark.operators.spandedup`) runs this kernel per
candidate pair/cluster inside applyInPandas; the kernel itself is
Spark-free and golden-testable.
"""
from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array by prefix doubling (numpy lexsort)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # copy=True: the rank/tmp buffer swap below would otherwise WRITE into
    # the caller's array when it is already int64
    rank = np.array(s, dtype=np.int64, copy=True)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
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
        rank, tmp = tmp.copy(), rank
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa.astype(np.int64)


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i+1])."""
    n = len(s)
    if n < 2:
        return np.zeros(max(n - 1, 0), dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n - 1, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == n - 1:
            h = 0
            continue
        j = sa[r + 1]
        while i + h < n and j + h < n and s[i + h] == s[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def common_spans(
    a: bytes, b: bytes, min_len: int = 32, max_spans: int = 64
) -> list[tuple[int, int, int]]:
    """Maximal common substrings >= min_len as (pos_a, pos_b, length).

    Builds one suffix array over a + SEP + b (SEP = a 0xFF sentinel byte value
    256 outside the byte alphabet, so no match can cross the boundary) and
    reports adjacent cross-document suffix pairs with LCP >= min_len,
    right-maximal by the LCP construction; trivially-overlapping shorter
    echoes of a longer span are suppressed greedily.
    """
    la, lb = len(a), len(b)
    if la < min_len or lb < min_len:
        return []
    s = np.empty(la + lb + 1, dtype=np.int64)
    s[:la] = np.frombuffer(a, dtype=np.uint8)
    s[la] = 256  # sentinel outside byte alphabet
    s[la + 1 :] = np.frombuffer(b, dtype=np.uint8)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
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
    spans.sort()
    return spans


def span_coverage(a: bytes, b: bytes, min_len: int = 32) -> float:
    """Fraction of `a`'s bytes covered by common spans with `b` — the span
    analogue of containment."""
    if len(a) == 0:
        return 0.0
    covered = np.zeros(len(a), dtype=bool)
    for pa, _, ln in common_spans(a, b, min_len=min_len, max_spans=256):
        covered[pa : pa + ln] = True
    return float(covered.mean())
