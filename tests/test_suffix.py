"""Suffix-array span-dedup kernel + operator tests."""
import numpy as np
import pytest

from finchspark.kernels.suffix import common_spans, lcp_array, span_coverage, spans_and_coverage, suffix_array


def _naive_sa(s: bytes) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


@pytest.mark.parametrize(
    "s",
    [b"banana", b"mississippi", b"aaaa", b"abcabcabc", b"z", b"", b"abab\x00abab"],
)
def test_suffix_array_matches_naive(s):
    arr = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    got = suffix_array(arr).tolist()
    assert got == _naive_sa(s)


def test_lcp_array_banana():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    # suffixes sorted: a, ana, anana, banana, na, nana
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    assert lcp.tolist() == [1, 3, 0, 0, 2]


def test_common_spans_basic():
    shared = b"0123456789abcdefghijklmnopqrstuvwxyz_SHARED_SPAN_BODY"
    a = b"AAA" + shared + b"BBB"
    b = b"xyz" + shared + b"qqq"
    spans = common_spans(a, b, min_len=16)
    assert spans, "shared span must be found"
    pa, pb, ln = max(spans, key=lambda t: t[2])
    assert a[pa : pa + ln] == b[pb : pb + ln]
    assert ln >= len(shared)
    assert shared in a[pa : pa + ln] or a[pa : pa + ln] in shared or len(a[pa:pa+ln]) >= len(shared)


def test_common_spans_none_below_min_len():
    a = b"completely different content here with nothing shared!"
    b = bytes(reversed(a))
    assert common_spans(a, b, min_len=16) == []


def test_span_coverage_containment():
    inner = b"def shared_function(x):\n    return x * 42\n" * 3
    a = inner
    b = b"# header\n" + inner + b"# footer\n"
    cov = span_coverage(a, b, min_len=32)
    assert cov == 1.0  # a fully contained in b
    assert 0.0 < span_coverage(b, a, min_len=32) < 1.0


def test_span_dedup_operator(spark):
    from finchspark.operators.spandedup import span_dedup_pairs

    shared = "".join(f"line_{i} = compute_{i}(value_{i})\n" for i in range(20))
    rows = [
        (0, "prefix0\n" + shared + "suffix0\n"),
        (1, "prefix1\n" + shared + "suffix1\n"),
        (2, "totally unrelated tiny file\n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "key_a long, key_b long")
    out = {
        (r["key_a"], r["key_b"]): r
        for r in span_dedup_pairs(pairs, docs, min_len=64).collect()
    }
    hit = out[(0, 1)]
    assert hit["n_spans"] >= 1
    assert hit["longest_span"] >= len(shared)
    assert hit["coverage_a"] > 0.8
    miss = out[(0, 2)]
    assert miss["n_spans"] == 0
    assert miss["coverage_a"] == 0.0


def test_lcp_matches_kasai_scalar_reference():
    """The vectorized binary-descent LCP equals the textbook Kasai scan."""
    import numpy as np

    from finchspark.kernels.suffix import lcp_array, suffix_array

    def kasai(s, sa):
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

    rng = np.random.default_rng(3)
    cases = [
        b"",
        b"a",
        b"aaaaaaaa",
        b"abababab",
        b"banana",
        b"mississippi",
        bytes(rng.integers(97, 101, 400).astype(np.uint8)),  # small alphabet
        bytes(rng.integers(0, 256, 300).astype(np.uint8)),
        b"x" * 37 + b"y" + b"x" * 37,
    ]
    for case in cases:
        s = np.frombuffer(case, dtype=np.uint8).astype(np.int64)
        sa = suffix_array(s)
        assert np.array_equal(lcp_array(s, sa), kasai(s, sa)), case[:20]


def test_spans_and_coverage_equals_separate_calls():
    import numpy as np

    from finchspark.kernels.suffix import (
        common_spans,
        span_coverage,
        spans_and_coverage,
    )

    rng = np.random.default_rng(5)
    base = bytes(rng.integers(97, 123, 600).astype(np.uint8))
    a = base[:400] + b"SHARED-BLOCK-" * 8 + base[400:]
    b = b"unrelated prefix " * 5 + b"SHARED-BLOCK-" * 8 + base[100:300]
    spans, cov = spans_and_coverage(a, b, min_len=24)
    assert spans == common_spans(a, b, min_len=24)
    assert cov == span_coverage(a, b, min_len=24)
    assert spans and cov > 0


def _brute_coverage(a: bytes, b: bytes, min_len: int) -> float:
    """Reference: byte p covered iff some common min_len-gram window holds p."""
    la = len(a)
    if la == 0 or la < min_len or len(b) < min_len:
        return 0.0
    covered = [False] * la
    for i in range(la - min_len + 1):
        if a[i : i + min_len] in b:
            for p in range(i, i + min_len):
                covered[p] = True
    return sum(covered) / la


def test_coverage_exact_vs_bruteforce_random():
    import random

    rng = random.Random(7)
    for trial in range(30):
        la = rng.randrange(0, 120)
        lb = rng.randrange(0, 120)
        a = bytes(rng.choice(b"abc") for _ in range(la))
        b = bytes(rng.choice(b"abc") for _ in range(lb))
        for min_len in (3, 5, 8):
            got = span_coverage(a, b, min_len=min_len)
            want = _brute_coverage(a, b, min_len)
            assert abs(got - want) < 1e-12, (trial, min_len, a, b, got, want)
            _, cov2 = spans_and_coverage(a, b, min_len=min_len)
            assert abs(cov2 - want) < 1e-12


def test_coverage_counts_repeated_occurrences_in_a():
    """An A-occurrence whose SA neighbors are both A-suffixes has no adjacent
    cross pair; exact coverage must still count it. Both occurrences of the
    shared block in A are covered."""
    block = b"SHAREDBLOCKXYZ"
    a = b"111" + block + b"qqqq" + block + b"222"
    b = b"zzz" + block + b"zzz"
    cov = span_coverage(a, b, min_len=len(block))
    want = _brute_coverage(a, b, len(block))
    assert abs(cov - want) < 1e-12
    assert abs(cov - (2 * len(block)) / len(a)) < 1e-12


def test_coverage_islands_vs_bruteforce():
    """Islands from the SA covered-mask equal the brute-force union of
    min_len-windows of common min_len-grams, folded to contiguous runs."""
    import numpy as np

    from finchspark.kernels.suffix import coverage_islands

    rng = np.random.default_rng(13)
    alpha = "ab"
    for trial in range(40):
        la = int(rng.integers(0, 40))
        lb = int(rng.integers(0, 40))
        a = "".join(rng.choice(list(alpha), la)) if la else ""
        b = "".join(rng.choice(list(alpha), lb)) if lb else ""
        ml = int(rng.integers(2, 6))
        n, longest, cov = coverage_islands(a.encode(), b.encode(), min_len=ml)
        covered = np.zeros(len(a), bool)
        for i in range(max(0, len(a) - ml + 1)):
            if a[i : i + ml] in b:
                covered[i : i + ml] = True
        runs = []
        run = 0
        for c in covered:
            if c:
                run += 1
            elif run:
                runs.append(run)
                run = 0
        if run:
            runs.append(run)
        assert n == len(runs), (a, b, ml)
        assert longest == (max(runs) if runs else 0)
        want_cov = covered.mean() if len(a) and len(a) >= ml and len(b) >= ml else 0.0
        assert abs(cov - want_cov) < 1e-12
