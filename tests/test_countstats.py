"""D6/D7 Spark surfaces: compare_counts_pairs and minmer_count_hist.

The batched kernel (`compare_counts_many`) is parity-checked against the
scalar `compare_counts` (itself golden-tested against the reference's
Welford loop, `lib/src/python.rs:489-559`); the Spark operators are checked
against the in-memory api verbs on the same signatures — including the
murmur-order-bound stop positions the SQL oracles cannot see.
"""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finchspark.config import PipelineConfig
from finchspark.kernels import SketchParams, i64_to_u64_shifted
from finchspark.kernels.distance import compare_counts, compare_counts_many
from finchspark.operators.signature import build_signatures


def _segmented(pairs, side):
    vals = np.concatenate([np.asarray(p[side][0], np.uint64) for p in pairs])
    offs = np.cumsum([0] + [len(p[side][0]) for p in pairs]).astype(np.int64)
    cnts = np.concatenate([np.asarray(p[side][1], np.int64) for p in pairs])
    return vals, offs, cnts


@st.composite
def _sketch(draw):
    n = draw(st.integers(0, 30))
    hs = sorted(draw(st.sets(st.integers(0, 120), min_size=n, max_size=n)))
    cs = draw(st.lists(st.integers(1, 8), min_size=len(hs), max_size=len(hs)))
    return np.array(hs, np.uint64), np.array(cs, np.int64)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_sketch(), _sketch()), min_size=1, max_size=6))
def test_compare_counts_many_matches_scalar(pairs):
    rv, ro, rc = _segmented(pairs, 0)
    qv, qo, qc = _segmented(pairs, 1)
    got = compare_counts_many(rv, ro, rc, qv, qo, qc)
    for i, ((rh, rcc), (qh, qcc)) in enumerate(pairs):
        want = compare_counts(rh, rcc, qh, qcc)
        assert tuple(int(a[i]) for a in got[:5]) == tuple(int(w) for w in want[:5])
        for w, g in zip(want[5:], (a[i] for a in got[5:])):
            assert (np.isnan(w) and np.isnan(g)) or np.isclose(
                w, g, rtol=1e-12, atol=1e-12
            )


@pytest.fixture()
def cfg():
    return PipelineConfig(sketch=SketchParams(kmers_to_sketch=64, final_size=64))


def _sig_arrays(rows):
    return {
        r["doc_id"]: (
            i64_to_u64_shifted(np.asarray(r["hashes"], np.int64)),
            np.asarray(r["counts"], np.int64),
        )
        for r in rows
    }


def test_compare_counts_pairs_spark_matches_api(spark, cfg):
    """Operator output == per-pair scalar kernel on the same signatures,
    EVERY field including ref_pos/query_pos (the murmur-order-bound columns
    the driver oracle omits)."""
    from finchspark.operators.countstats import compare_counts_pairs

    docs = spark.createDataFrame(
        [(i, f"some shared body of text {i % 3} " * (3 + i % 4)) for i in range(12)],
        "doc_id long, text string",
    )
    sigs = build_signatures(docs, cfg, key_cols=("doc_id",), content_col="text")
    arr = _sig_arrays(sigs.collect())
    pairs = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12) if a < b],
        "key_a long, key_b long",
    )
    got = {
        (r["key_a"], r["key_b"]): r
        for r in compare_counts_pairs(pairs, sigs, key_col="doc_id").collect()
    }
    assert len(got) == 66
    for (a, b), r in got.items():
        want = compare_counts(arr[a][0], arr[a][1], arr[b][0], arr[b][1])
        assert (
            r["common"], r["ref_pos"], r["query_pos"],
            r["ref_count"], r["query_count"],
        ) == tuple(int(w) for w in want[:5])
        for w, g in zip(want[5:], (r["var"], r["skew"], r["kurt"])):
            assert (np.isnan(w) and np.isnan(g)) or np.isclose(
                w, g, rtol=1e-12, atol=1e-12
            )


def test_minmer_count_hist_matches_matrix(spark, cfg):
    """Histogram rows == the per-row value histogram of the kernel matrix;
    every sketch's n_positions sums to |ref|."""
    from collections import Counter

    from finchspark.kernels.distance import minmer_matrix
    from finchspark.operators.countstats import minmer_count_hist

    docs = spark.createDataFrame(
        [(i, f"overlapping content block {i % 2} " * (2 + i % 3)) for i in range(8)],
        "doc_id long, text string",
    )
    sigs = build_signatures(docs, cfg, key_cols=("doc_id",), content_col="text")
    arr = _sig_arrays(sigs.collect())
    ref_u = arr[0][0]
    keys = sorted(arr)
    m = minmer_matrix(ref_u, [arr[k][0] for k in keys], [arr[k][1] for k in keys])

    got = {}
    for r in minmer_count_hist(sigs, 0, key_col="doc_id").collect():
        got.setdefault(r["key"], {})[r["count"]] = r["n_positions"]
    assert set(got) == set(keys)
    for s, k in enumerate(keys):
        assert got[k] == dict(Counter(m[s].tolist()))
        assert sum(got[k].values()) == len(ref_u)


def test_minmer_count_hist_missing_ref_raises(spark, cfg):
    from finchspark.operators.countstats import minmer_count_hist

    docs = spark.createDataFrame([(1, "abc " * 30)], "doc_id long, text string")
    sigs = build_signatures(docs, cfg, key_cols=("doc_id",), content_col="text")
    with pytest.raises(ValueError, match="not found"):
        minmer_count_hist(sigs, 999, key_col="doc_id")
