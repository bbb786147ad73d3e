"""Exact set-similarity join (AllPairs prefix filtering): recall/precision
1.0 by construction vs a brute-force set-Jaccard oracle."""
import pytest

from finchspark.config import PipelineConfig
from finchspark.kernels import SketchParams, shingle_hashes
from finchspark.operators.allpairs import exact_jaccard_pairs, prefix_candidates
from finchspark.operators.signature import build_signatures


@pytest.fixture(scope="module")
def full_sigs(spark, documents_df):
    # complete sketches: size far above any synth doc's distinct 21-grams
    cfg = PipelineConfig(
        sketch=SketchParams(kmers_to_sketch=100_000, final_size=100_000)
    )
    return build_signatures(documents_df, cfg, key_cols=("doc_id",)).persist()


def _brute_truth(corpus, threshold):
    docs, _ = corpus
    sets = {
        d["doc_id"]: set(shingle_hashes(d["content"].encode(), 21, 0).tolist())
        for d in docs
    }
    out = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if j <= i or not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            jac = inter / union
            if jac >= threshold:
                out[(i, j)] = (jac, inter / len(sets[i]))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_exact_jaccard_pairs_vs_brute_force(spark, full_sigs, corpus, threshold):
    got = {
        (r["key_a"], r["key_b"]): (r["jaccard"], r["containment_a"])
        for r in exact_jaccard_pairs(full_sigs, threshold).collect()
    }
    want = _brute_truth(corpus, threshold)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], abs=0)
        assert got[k][1] == pytest.approx(want[k][1], abs=0)


def test_prefix_candidates_superset_of_truth(spark, full_sigs, corpus):
    # the prefix index must surface EVERY qualifying pair (completeness is
    # the theorem; precision comes from the verify stage)
    t = 0.5
    cands = {
        (r["key_a"], r["key_b"]) for r in prefix_candidates(full_sigs, t).collect()
    }
    assert set(_brute_truth(corpus, t)) <= cands


def test_empty_and_short_docs_never_pair(spark, documents_df, corpus):
    cfg = PipelineConfig(
        sketch=SketchParams(kmers_to_sketch=100_000, final_size=100_000)
    )
    sigs = build_signatures(documents_df, cfg, key_cols=("doc_id",))
    docs, _ = corpus
    empties = {
        d["doc_id"] for d in docs if len(d["content"].encode()) < 21
    }
    pairs = exact_jaccard_pairs(sigs, 0.1).collect()
    for r in pairs:
        assert r["key_a"] not in empties and r["key_b"] not in empties
