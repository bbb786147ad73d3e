"""Distance kernels: containment / Jaccard / mash distance + sketch merge.

Reimplements the comparison semantics of the reference's `lib/src/distance.rs`
and `lib/src/python.rs` (onecodex/finch-rs) over numpy arrays. The hot-path
entry point `raw_distance` replicates the *exact* two-pointer stop semantics
(`distance.rs:66-126`): the merge walk stops when either sorted list is
exhausted, then (for scaled sketches) both pointers advance through remaining
hashes strictly below max_hash; containment = common / j (reference-side
consumed count).

Plain `array_intersect` does NOT implement this (the stop rule changes `total`
when the lists have different ranges) — which is why verification runs in this
kernel instead of a Catalyst set function.
"""
from __future__ import annotations

import math

import numpy as np

U64_MAX = 0xFFFFFFFFFFFFFFFF


def _intersect_size_sorted(a: np.ndarray, b: np.ndarray) -> int:
    """|set(a) ∩ set(b)| for sorted distinct uint64 arrays, O(|a| log |b|)."""
    if len(a) == 0 or len(b) == 0:
        return 0
    if len(b) < len(a):
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = len(b) - 1
    return int(np.count_nonzero(b[idx] == a))


def raw_distance(
    query: np.ndarray, ref: np.ndarray, scale: float
) -> tuple[float, float, int, int]:
    """(containment, jaccard, common, total) — `distance.rs:66-126` semantics.

    Inputs must be sorted-ascending *distinct* uint64 hash arrays (which every
    sketch in this engine is; the reference's behavior on duplicate hashes is
    documented as unspecified).
    """
    query = np.asarray(query, dtype=np.uint64)
    ref = np.asarray(ref, dtype=np.uint64)
    lq, lr = len(query), len(ref)
    if lq == 0 or lr == 0:
        i = j = 0
        common = 0
    else:
        common = _intersect_size_sorted(query, ref)
        qmax, rmax = query[-1], ref[-1]
        if qmax == rmax:
            i, j = lq, lr
        elif qmax < rmax:
            # query exhausts; ref consumed everything <= qmax
            i = lq
            j = int(np.searchsorted(ref, qmax, side="right"))
        else:
            j = lr
            i = int(np.searchsorted(query, rmax, side="right"))

    if scale > 0.0:
        # `u64::MAX / scale.recip() as u64` (Rust truncating float->int cast)
        max_hash = np.uint64(U64_MAX // int(1.0 / scale))
        # advance pointers through remaining hashes strictly below max_hash
        i = max(i, int(np.searchsorted(query, max_hash, side="left")))
        j = max(j, int(np.searchsorted(ref, max_hash, side="left")))

    containment = 0.0 if j == 0 else common / j
    total = i - common + j
    jaccard = 1.0 if total == 0 else common / total
    return containment, jaccard, common, total


def raw_distance_many(
    q_vals: np.ndarray,
    q_offsets: np.ndarray,
    r_vals: np.ndarray,
    r_offsets: np.ndarray,
    scale: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """`raw_distance` for MANY pairs at once — zero per-pair Python.

    Inputs are segmented arrays (Arrow list layout): pair p's query hashes
    are ``q_vals[q_offsets[p]:q_offsets[p+1]]`` (sorted distinct uint64),
    ditto for the reference side. Returns (containment, jaccard, common,
    total) arrays of length n_pairs with exactly `raw_distance` semantics
    (`distance.rs:66-126`), including the stop rule and scaled-tail
    continuation.

    Implementation: one radix sort over all values tagged by pair id finds
    per-pair intersection sizes; the pointer stop positions come from
    per-pair max comparisons + segmented counting (bincount with boolean
    weights) instead of per-pair searchsorted.
    """
    q_offsets = np.asarray(q_offsets, dtype=np.int64)
    r_offsets = np.asarray(r_offsets, dtype=np.int64)
    n = len(q_offsets) - 1
    lq = np.diff(q_offsets)
    lr = np.diff(r_offsets)
    qi = np.repeat(np.arange(n, dtype=np.int64), lq)
    ri = np.repeat(np.arange(n, dtype=np.int64), lr)
    q_vals = np.asarray(q_vals, dtype=np.uint64)
    r_vals = np.asarray(r_vals, dtype=np.uint64)

    # intersection sizes: values are distinct within a side, so a common
    # value appears exactly twice within its pair group
    vals = np.concatenate([q_vals, r_vals])
    pid = np.concatenate([qi, ri])
    if len(vals):
        perm = np.argsort(vals, kind="stable")
        perm = perm[np.argsort(pid[perm], kind="stable")]
        sv = vals[perm]
        sp = pid[perm]
        dup = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        common = np.bincount(sp[:-1][dup], minlength=n).astype(np.int64)
    else:
        common = np.zeros(n, dtype=np.int64)

    # per-pair maxima (0 for empty segments — only used where len > 0)
    qmax = np.zeros(n, dtype=np.uint64)
    rmax = np.zeros(n, dtype=np.uint64)
    nz_q = lq > 0
    nz_r = lr > 0
    qmax[nz_q] = q_vals[q_offsets[1:][nz_q] - 1]
    rmax[nz_r] = r_vals[r_offsets[1:][nz_r] - 1]
    either_empty = ~(nz_q & nz_r)

    # stop positions: the exhausted side consumes everything; the other side
    # consumed all values <= the exhausted side's max (searchsorted 'right',
    # realized as a segmented count)
    qmax_rep = np.repeat(qmax, lr)
    rmax_rep = np.repeat(rmax, lq)
    r_le_qmax = np.bincount(ri, weights=(r_vals <= qmax_rep), minlength=n).astype(
        np.int64
    )
    q_le_rmax = np.bincount(qi, weights=(q_vals <= rmax_rep), minlength=n).astype(
        np.int64
    )
    i = np.where(qmax <= rmax, lq, q_le_rmax)
    j = np.where(rmax <= qmax, lr, r_le_qmax)
    i[either_empty] = 0
    j[either_empty] = 0
    common[either_empty] = 0

    if scale > 0.0:
        max_hash = np.uint64(U64_MAX // int(1.0 / scale))
        q_below = np.bincount(qi, weights=(q_vals < max_hash), minlength=n).astype(
            np.int64
        )
        r_below = np.bincount(ri, weights=(r_vals < max_hash), minlength=n).astype(
            np.int64
        )
        i = np.maximum(i, q_below)
        j = np.maximum(j, r_below)

    with np.errstate(divide="ignore", invalid="ignore"):
        containment = np.where(j > 0, common / np.maximum(j, 1), 0.0)
        total = i - common + j
        jaccard = np.where(total > 0, common / np.maximum(total, 1), 1.0)
    return containment, jaccard, common, total


def raw_distance_walk(
    query: np.ndarray, ref: np.ndarray, scale: float
) -> tuple[float, float, int, int]:
    """Literal scalar two-pointer transcription (tests / cross-check only)."""
    i = j = 0
    common = 0
    lq, lr = len(query), len(ref)
    while i < lq and j < lr:
        if query[i] < ref[j]:
            i += 1
        elif ref[j] < query[i]:
            j += 1
        else:
            common += 1
            i += 1
            j += 1
    if scale > 0.0:
        max_hash = U64_MAX // int(1.0 / scale)
        while i < lq and query[i] < max_hash:
            i += 1
        while j < lr and ref[j] < max_hash:
            j += 1
    containment = 0.0 if j == 0 else common / j
    total = i - common + j
    jaccard = 1.0 if total == 0 else common / total
    return containment, jaccard, common, total


def old_distance(query: np.ndarray, ref: np.ndarray) -> tuple[float, float, int, int]:
    """Legacy containment-biased variant (`distance.rs:136-157`), including its
    pointer-clamp quirk (`i < len-1`)."""
    i = 0
    common = 0
    total = 0
    lq = len(query)
    for rh in ref:
        while lq and query[i] < rh and i < lq - 1:
            i += 1
        if lq and query[i] == rh:
            common += 1
        total += 1
    containment = common / total if total else 0.0
    jaccard = common / (common + 2 * (total - common)) if total else 0.0
    return containment, jaccard, common, total


def mash_distance(jaccard: float, k: int) -> float:
    """`-ln(2j/(1+j))/k` clamped to [0,1] (`distance.rs:37-41`)."""
    if jaccard <= 0.0:
        return 1.0  # ln(0) -> -inf -> clamped
    d = -math.log((2.0 * jaccard) / (1.0 + jaccard)) / k
    return min(1.0, max(0.0, d))


def min_scale(scale_q: float | None, scale_r: float | None) -> float:
    """Scale used for comparison: min of both iff BOTH sketches are scaled,
    else 0 (noop) — `distance.rs:23-29`."""
    if scale_q is not None and scale_r is not None:
        return min(scale_q, scale_r)
    return 0.0


def merge_sketches(
    h1: np.ndarray,
    c1: np.ndarray,
    e1: np.ndarray,
    h2: np.ndarray,
    c2: np.ndarray,
    e2: np.ndarray,
    size: int | None,
    scale: float | None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sorted set-union merge with count summation, then clip by (size, scale)
    — `merge_sketches` (`lib/src/python.rs:24-100`). The take_while clip rule
    on a sorted list reduces to keep = (h <= max_hash) | (idx < size)."""
    both = np.concatenate([np.asarray(h1, np.uint64), np.asarray(h2, np.uint64)])
    cts = np.concatenate([np.asarray(c1, np.int64), np.asarray(c2, np.int64)])
    ext = np.concatenate([np.asarray(e1, np.int64), np.asarray(e2, np.int64)])
    uh, inv = np.unique(both, return_inverse=True)
    mc = np.zeros(len(uh), dtype=np.int64)
    me = np.zeros(len(uh), dtype=np.int64)
    np.add.at(mc, inv, cts)
    np.add.at(me, inv, ext)

    if scale is not None:
        max_hash = np.uint64(U64_MAX // int(1.0 / scale))
        if size is not None:
            keep = (uh <= max_hash) | (np.arange(len(uh)) < size)
        else:
            keep = uh <= max_hash
        return uh[keep], mc[keep], me[keep]
    if size is not None:
        return uh[:size], mc[:size], me[:size]
    return uh, mc, me


def compare_counts(
    ref_h: np.ndarray, ref_c: np.ndarray, q_h: np.ndarray, q_c: np.ndarray
) -> tuple[int, int, int, int, int, float, float, float]:
    """Intersection count moments (`Sketch.compare_counts`,
    `lib/src/python.rs:489-559`): (common, ref_pos, query_pos, ref_count,
    query_count, var, skew, excess-kurtosis) with population moments over the
    query counts at common hashes."""
    ref_h = np.asarray(ref_h, np.uint64)
    q_h = np.asarray(q_h, np.uint64)
    common_vals = np.intersect1d(ref_h, q_h, assume_unique=True)
    common = len(common_vals)
    # pointer positions at loop end (two-pointer walk, same stop rule as
    # raw_distance with scale=0)
    if common == 0 and (len(ref_h) == 0 or len(q_h) == 0):
        ref_pos = q_pos = 0
    else:
        rmax, qmax = ref_h[-1], q_h[-1]
        if rmax == qmax:
            ref_pos, q_pos = len(ref_h), len(q_h)
        elif rmax < qmax:
            ref_pos = len(ref_h)
            q_pos = int(np.searchsorted(q_h, rmax, side="right"))
        else:
            q_pos = len(q_h)
            ref_pos = int(np.searchsorted(ref_h, qmax, side="right"))
    rmask = np.isin(ref_h, common_vals, assume_unique=True)
    qmask = np.isin(q_h, common_vals, assume_unique=True)
    ref_count = int(np.asarray(ref_c, np.int64)[rmask].sum())
    qc = np.asarray(q_c, np.float64)[qmask]
    query_count = int(qc.sum())
    if common:
        mean = qc.mean()
        d = qc - mean
        m2 = float((d**2).sum())
        m3 = float((d**3).sum())
        m4 = float((d**4).sum())
        var = m2 / common
        skew = math.sqrt(common) * m3 / m2**1.5 if m2 > 0 else float("nan")
        kurt = common * m4 / (m2 * m2) - 3.0 if m2 > 0 else float("nan")
    else:
        var = skew = kurt = float("nan")
    return common, ref_pos, q_pos, ref_count, query_count, var, skew, kurt


def compare_counts_many(
    r_vals: np.ndarray,
    r_offsets: np.ndarray,
    r_counts: np.ndarray,
    q_vals: np.ndarray,
    q_offsets: np.ndarray,
    q_counts: np.ndarray,
) -> tuple[np.ndarray, ...]:
    """`compare_counts` for MANY (reference, query) pairs at once — zero
    per-pair Python (`Sketch.compare_counts`, `lib/src/python.rs:489-559`).

    Segmented (Arrow list layout) inputs: pair p's reference hashes are
    ``r_vals[r_offsets[p]:r_offsets[p+1]]`` (sorted distinct uint64) with
    parallel counts, ditto the query side. Returns 8 arrays of length
    n_pairs: (common, ref_pos, query_pos, ref_count, query_count, var,
    skew, kurt) with exactly the scalar kernel's semantics — population
    moments over the QUERY counts at common hashes, two-pointer stop
    positions, nan moments when common == 0 (or m2 == 0 for skew/kurt).

    Same tagged-radix-sort machinery as `raw_distance_many`: one stable
    sort over all values tagged by pair id; a common hash appears as an
    adjacent (ref, query) duplicate within its pair group (values are
    distinct within a side, and the ref side is concatenated first so the
    stable sort keeps ref before query at equal (pair, value))."""
    r_offsets = np.asarray(r_offsets, dtype=np.int64)
    q_offsets = np.asarray(q_offsets, dtype=np.int64)
    n = len(r_offsets) - 1
    lr = np.diff(r_offsets)
    lq = np.diff(q_offsets)
    ri = np.repeat(np.arange(n, dtype=np.int64), lr)
    qi = np.repeat(np.arange(n, dtype=np.int64), lq)
    r_vals = np.asarray(r_vals, dtype=np.uint64)
    q_vals = np.asarray(q_vals, dtype=np.uint64)

    vals = np.concatenate([r_vals, q_vals])
    pid = np.concatenate([ri, qi])
    cnts = np.concatenate(
        [np.asarray(r_counts, np.int64), np.asarray(q_counts, np.int64)]
    )
    common = np.zeros(n, dtype=np.int64)
    ref_count = np.zeros(n, dtype=np.int64)
    q_sum = np.zeros(n, dtype=np.float64)
    m2 = np.zeros(n, dtype=np.float64)
    m3 = np.zeros(n, dtype=np.float64)
    m4 = np.zeros(n, dtype=np.float64)
    if len(vals):
        perm = np.argsort(vals, kind="stable")
        perm = perm[np.argsort(pid[perm], kind="stable")]
        sv = vals[perm]
        sp = pid[perm]
        sc = cnts[perm]
        dup = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        dpid = sp[:-1][dup]
        rc = sc[:-1][dup]  # ref entry precedes query entry at equal keys
        qc = sc[1:][dup].astype(np.float64)
        common = np.bincount(dpid, minlength=n).astype(np.int64)
        ref_count = np.bincount(dpid, weights=rc, minlength=n).astype(np.int64)
        q_sum = np.bincount(dpid, weights=qc, minlength=n)
        with np.errstate(invalid="ignore"):
            mean = np.where(common > 0, q_sum / np.maximum(common, 1), 0.0)
        d = qc - mean[dpid]
        m2 = np.bincount(dpid, weights=d * d, minlength=n)
        m3 = np.bincount(dpid, weights=d * d * d, minlength=n)
        m4 = np.bincount(dpid, weights=d * d * d * d, minlength=n)

    # stop positions (scale-0 two-pointer rule, as in raw_distance_many)
    rmax = np.zeros(n, dtype=np.uint64)
    qmax = np.zeros(n, dtype=np.uint64)
    nz_r = lr > 0
    nz_q = lq > 0
    rmax[nz_r] = r_vals[r_offsets[1:][nz_r] - 1]
    qmax[nz_q] = q_vals[q_offsets[1:][nz_q] - 1]
    either_empty = ~(nz_r & nz_q)
    r_le_qmax = np.bincount(
        ri, weights=(r_vals <= np.repeat(qmax, lr)), minlength=n
    ).astype(np.int64)
    q_le_rmax = np.bincount(
        qi, weights=(q_vals <= np.repeat(rmax, lq)), minlength=n
    ).astype(np.int64)
    ref_pos = np.where(rmax <= qmax, lr, r_le_qmax)
    q_pos = np.where(qmax <= rmax, lq, q_le_rmax)
    ref_pos[either_empty] = 0
    q_pos[either_empty] = 0

    with np.errstate(divide="ignore", invalid="ignore"):
        var = np.where(common > 0, m2 / np.maximum(common, 1), np.nan)
        ok = m2 > 0
        skew = np.where(
            ok, np.sqrt(common) * m3 / np.maximum(m2, 1e-300) ** 1.5, np.nan
        )
        kurt = np.where(ok, common * m4 / np.maximum(m2 * m2, 1e-300) - 3.0, np.nan)
    return (
        common,
        ref_pos,
        q_pos,
        ref_count,
        q_sum.astype(np.int64),
        var,
        skew,
        kurt,
    )


def minmer_matrix(
    ref_hashes: np.ndarray,
    sketch_hashes: list[np.ndarray],
    sketch_counts: list[np.ndarray],
) -> np.ndarray:
    """(n_sketches, |ref|) int32 count matrix aligned to the reference
    sketch's hash positions — `minmer_matrix` (`lib/src/distance.rs:344-364`):
    entry (s, p) = sketch s's count for ref hash p, 0 when absent."""
    ref_hashes = np.asarray(ref_hashes, dtype=np.uint64)
    out = np.zeros((len(sketch_hashes), len(ref_hashes)), dtype=np.int32)
    for s, (h, c) in enumerate(zip(sketch_hashes, sketch_counts)):
        h = np.asarray(h, dtype=np.uint64)
        if len(h) == 0:
            continue
        idx = np.searchsorted(h, ref_hashes)
        idx_c = np.minimum(idx, len(h) - 1)
        match = h[idx_c] == ref_hashes
        out[s, match] = np.asarray(c, dtype=np.int64)[idx_c[match]]
    return out


def cardinality(hashes: np.ndarray) -> int:
    """KMV distinct-count estimate with the reference's f32 arithmetic
    (`lib/src/statistics.rs:8-23`)."""
    n = len(hashes)
    if n == 0:
        return 0
    last = np.float32(np.uint64(hashes[-1]))
    frac = np.float32(last / np.float32(U64_MAX))
    return int(np.float32(n - 1) / frac)
