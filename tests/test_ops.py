"""Operator-level tests: ANN recall, Spark-native merge vs kernel merge,
multimodal plumbing, finch-like API surface."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from finchspark.api import Multisketch, Sketch, sketch_bytes
from finchspark.kernels import i64_to_u64_shifted, merge_sketches


def test_ann_lsh_recall_vs_exact(spark):
    from finchspark.operators.ann import cosine_topk, cosine_topk_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, k=5, query_mod=25).collect()
    }
    # driver embeddings are weakly structured (top-5 cosine ≈ 0.32), so the
    # bucket config must be shallow: P(candidate) = 1-(1-(1-θ/π)^bits)^tables
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(emb, k=5, query_mod=25, n_bits=4, n_tables=16).collect()
    }
    assert exact, "query set must be non-empty"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"sign-LSH recall too low: {recall}"


def test_merge_signatures_by_matches_kernel(spark, documents_df):
    from finchspark.config import PipelineConfig
    from finchspark.kernels import SketchParams, shingle_hashes, sketch_hashes
    from finchspark.operators.merge import merge_signatures_by
    from finchspark.operators.signature import build_signatures

    cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=64, final_size=64))
    docs = documents_df.limit(40).withColumn("grp", F.col("doc_id") % 4)
    sigs = build_signatures(docs, cfg, key_cols=("doc_id", "grp"), content_col="content")
    merged = {
        r["grp"]: r for r in merge_signatures_by(sigs, "grp", size=64).collect()
    }
    rows = docs.select("doc_id", "grp", "content").collect()
    p = cfg.sketch
    by_grp: dict[int, list] = {}
    for r in rows:
        kc = sketch_hashes(shingle_hashes(r["content"].encode(), p.kmer_length, p.hash_seed), p)
        by_grp.setdefault(r["grp"], []).append(kc)
    for grp, sketches in by_grp.items():
        acc = sketches[0]
        h, c, e = acc.hashes, acc.counts, acc.extra_counts
        for nxt in sketches[1:]:
            h, c, e = merge_sketches(
                h, c, e, nxt.hashes, nxt.counts, nxt.extra_counts, size=64, scale=None
            )
        got = merged[grp]
        got_h = i64_to_u64_shifted(np.array(got["hashes"], dtype=np.int64))
        assert np.array_equal(got_h, h), grp
        assert got["counts"] == c.tolist()
        assert got["n_members"] == len(sketches)


def test_multimodal_features(spark):
    from finchspark.operators.multimodal import extract_media_features

    rows = [
        (1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)),
        (2, bytearray(b"\xff\xd8\xff\xe0" + bytes(range(256)))),
        (3, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["meta"] for r in extract_media_features(df).collect()}
    assert out[1]["media_type"] == "png"
    assert out[2]["media_type"] == "jpeg"
    assert out[2]["n_bytes"] == 260
    assert out[3]["media_type"] == "unknown"
    assert out[2]["byte_entropy"] > out[1]["byte_entropy"]
    import hashlib

    assert out[3]["sha256"] == hashlib.sha256(b"").hexdigest()


def test_decode_image_is_stubbed():
    from finchspark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_api_sketch_and_compare():
    a = sketch_bytes("a", b"the quick brown fox jumps over the lazy dog " * 20, n_hashes=64)
    b = sketch_bytes("b", b"the quick brown fox jumps over the lazy cat " * 20, n_hashes=64)
    c = sketch_bytes("c", bytes(range(256)) * 4, n_hashes=64)
    cont_ab, jac_ab = a.compare(b)
    _, jac_ac = a.compare(c)
    assert jac_ab > jac_ac
    cont_self, jac_self = a.compare(a)
    assert cont_self == 1.0 and jac_self == 1.0

    ms = Multisketch([b, c])
    ix, best = ms.best_match(a)
    assert best.name == "b"
    ms.filter_to_names(["c"])
    assert [s.name for s in ms.sketches] == ["c"]


def test_api_merge_matches_kernel():
    a = sketch_bytes("a", b"alpha beta gamma delta " * 30, n_hashes=32)
    b = sketch_bytes("b", b"epsilon zeta eta theta " * 30, n_hashes=32)
    m = a.merge(b, size=32)
    assert len(m.hashes.hashes) == 32
    assert np.all(np.diff(m.hashes.hashes.astype(np.uint64)) > 0)
    assert m.seq_length == a.seq_length + b.seq_length


def test_compare_matrix_minmer():
    import numpy as np

    from finchspark.kernels.distance import minmer_matrix

    ref = np.array([5, 10, 20, 30], dtype=np.uint64)
    s1 = (np.array([5, 20, 99], dtype=np.uint64), np.array([2, 7, 1]))
    s2 = (np.array([], dtype=np.uint64), np.array([], dtype=np.int64))
    s3 = (np.array([30], dtype=np.uint64), np.array([4]))
    m = minmer_matrix(ref, [s1[0], s2[0], s3[0]], [s1[1], s2[1], s3[1]])
    assert m.tolist() == [[2, 0, 7, 0], [0, 0, 0, 0], [0, 0, 0, 4]]

    a = sketch_bytes("a", b"common shared prefix body " * 20, n_hashes=16)
    mat = a.compare_matrix(a)
    assert np.array_equal(mat[0], a.hashes.counts.astype("int32"))


def test_char_class_profile_vs_scalar(spark, documents_df, corpus):
    """G3 info stats: batch operator == per-doc scalar recomputation with
    count weights over retained kmers (incl. TRUNCATED sketches)."""
    import numpy as np

    from finchspark.config import PipelineConfig
    from finchspark.kernels import SketchParams, shingle_hashes
    from finchspark.kernels.sketch import count_distinct
    from finchspark.operators.infostats import _LUT, char_class_profile

    cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=8, final_size=8))
    rows = {
        r["doc_id"]: r
        for r in char_class_profile(
            documents_df, cfg, key_cols=("doc_id",)
        ).collect()
    }
    docs, _ = corpus
    for d in docs:
        content = d["content"].encode()
        h = shingle_hashes(content, 21, 0)
        got = rows[d["doc_id"]]
        if len(h) == 0:
            assert got["n_retained"] == 0
            assert got["frac_alpha"] == 0.0
            continue
        # scalar: retained = bottom-8 distinct, weight = count, bytes of the
        # kmer at each retained hash's first occurrence
        kc = count_distinct(h)
        order = np.arange(len(kc.hashes))[:8]
        first_pos = {}
        seen = {}
        for pos, hv in enumerate(h.tolist()):
            if hv not in seen:
                seen[hv] = pos
        totals = np.zeros(4)
        for gi in order:
            hv = int(kc.hashes[gi])
            cnt = int(kc.counts[gi])
            p = seen[hv]
            gram = content[p : p + 21]
            for b in gram:
                totals[_LUT[b]] += cnt
        tot = totals.sum()
        assert got["n_retained"] == len(order)
        for ci, name in enumerate(("alpha", "digit", "space", "other")):
            assert got[f"frac_{name}"] == totals[ci] / tot, (d["doc_id"], name)


def test_winnow_fingerprints_guarantee_and_scalar_parity(spark):
    """Winnowing: matches the scalar MOSS construction; any shared substring
    of length >= k+w-1 yields at least one shared fingerprint."""
    import hashlib

    from finchspark.operators.textops import winnow_fingerprints

    shared = "ROLLING-HASH-SHARED-SEGMENT-0123456789"
    docs = [
        (0, "prefix junk " + shared + " trailing body of doc zero"),
        (1, "totally different preamble |" + shared + "| and more"),
        (2, "no overlap with the others at all, none whatsoever"),
        (3, "tiny"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])

    def scalar(text, k=5, w=4):
        if len(text) < k + w - 1:
            return set()
        hs = [hashlib.md5(text[i : i + k].encode()).hexdigest() for i in range(len(text) - k + 1)]
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}

    for did, text in docs:
        assert got.get(did, set()) == scalar(text), did
    assert got[0] & got[1], "shared segment must share a fingerprint"
    assert not (got[2] & got[0])
