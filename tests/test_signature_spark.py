"""Signature stage through Spark: UDF plumbing must not alter kernel
semantics (SURVEY.md §5 layer 2)."""
import hashlib

import numpy as np
import pytest

from finchspark.config import PipelineConfig
from finchspark.kernels import (
    SketchParams,
    i64_to_u64_shifted,
    shingle_hashes,
    simhash64,
    sketch_hashes,
)
from finchspark.operators.signature import build_signatures


@pytest.fixture(scope="module")
def sigs(spark, documents_df):
    cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=128, final_size=128))
    df = build_signatures(documents_df, cfg, key_cols=("doc_id",))
    rows = {r["doc_id"]: r for r in df.collect()}
    return cfg, rows


def test_signature_matches_kernel_reference(sigs, corpus):
    cfg, rows = sigs
    docs, _ = corpus
    assert len(rows) == len(docs)
    p = cfg.sketch
    for d in docs:
        content = d["content"].encode()
        expect = sketch_hashes(shingle_hashes(content, p.kmer_length, p.hash_seed), p)
        got = rows[d["doc_id"]]
        got_hashes = i64_to_u64_shifted(np.array(got["hashes"], dtype=np.int64))
        assert np.array_equal(got_hashes, expect.hashes), d["doc_id"]
        assert got["counts"] == expect.counts.tolist()
        # ascending unsigned order via the shifted-i64 bridge
        if len(got["hashes"]) > 1:
            assert np.all(np.diff(np.array(got["hashes"], np.int64)) > 0)


def test_sha256_invariant(sigs, corpus):
    """Per-row invariant vs the source table (BASELINE.json input_hint)."""
    _, rows = sigs
    docs, _ = corpus
    for d in docs:
        expect = hashlib.sha256(d["content"].encode()).hexdigest()
        assert rows[d["doc_id"]]["sha256"] == expect


def test_signature_counts_and_simhash(sigs, corpus):
    cfg, rows = sigs
    docs, _ = corpus
    p = cfg.sketch
    for d in docs:
        content = d["content"].encode()
        got = rows[d["doc_id"]]
        n = len(content)
        assert got["n_bytes"] == n
        assert got["n_kmers"] == max(n - p.kmer_length + 1, 0)
        h = shingle_hashes(content, p.kmer_length, p.hash_seed)
        assert got["n_unique"] == len(np.unique(h))
        got_sim = np.array(got["simhash"], np.int64).view(np.uint64)
        assert got_sim == np.uint64(simhash64(h))


def test_empty_and_short_docs(sigs, corpus):
    _, rows = sigs
    docs, _ = corpus
    for d in docs:
        if len(d["content"]) < 21:
            got = rows[d["doc_id"]]
            assert got["hashes"] == []
            assert got["bands"] == []  # no shingles -> no LSH buckets
            assert got["simhash"] == 0


def test_bands_shape(sigs, corpus):
    cfg, rows = sigs
    docs, _ = corpus
    for d in docs:
        got = rows[d["doc_id"]]
        if got["n_kmers"] > 0:
            assert len(got["bands"]) == cfg.lsh.n_bands


def test_byte_bounded_subbatching(spark, documents_df, corpus):
    """Forcing tiny sub-batches must not change any output row."""
    import finchspark.operators.signature as sig_mod
    from finchspark.config import PipelineConfig

    cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=64, final_size=64))
    old = sig_mod.MAX_CHUNK_BYTES
    try:
        sig_mod.MAX_CHUNK_BYTES = 2048  # a few docs per kernel call
        chunked = {
            r["doc_id"]: r
            for r in build_signatures(
                documents_df, cfg, key_cols=("doc_id",)
            ).collect()
        }
    finally:
        sig_mod.MAX_CHUNK_BYTES = old
    whole = {
        r["doc_id"]: r
        for r in build_signatures(documents_df, cfg, key_cols=("doc_id",)).collect()
    }
    assert set(chunked) == set(whole)
    for k in whole:
        assert chunked[k]["hashes"] == whole[k]["hashes"], k
        assert chunked[k]["sha256"] == whole[k]["sha256"], k
        assert chunked[k]["bands"] == whole[k]["bands"], k


def test_strict_violation_surfaced(spark):
    """A4: strict mode flags (not drops) mash sketches shorter than
    final_size (`sketch_schemes/mod.rs:115-128`)."""
    from finchspark.config import PipelineConfig

    docs = [
        (0, "x" * 30),  # 10 kmers -> sketch of 10 < 16: violation
        (1, "the quick brown fox jumps over the lazy dog " * 8),  # plenty
    ]
    df = spark.createDataFrame(docs, "doc_id long, content string")
    cfg = PipelineConfig(
        sketch=SketchParams(kmers_to_sketch=16, final_size=16, no_strict=False)
    )
    rows = {
        r["doc_id"]: r
        for r in build_signatures(df, cfg, key_cols=("doc_id",)).collect()
    }
    assert rows[0]["strict_violation"] is True
    assert rows[1]["strict_violation"] is False
    # default (no_strict=True) never flags
    cfg2 = PipelineConfig(sketch=SketchParams(kmers_to_sketch=16, final_size=16))
    rows2 = build_signatures(df, cfg2, key_cols=("doc_id",)).collect()
    assert all(r["strict_violation"] is False for r in rows2)


def test_null_content_rows(spark):
    """NULL content == empty content: empty sketch, sha256 of b'' (the
    byte-chunker and the JVM-side sha must both null-fill)."""
    import hashlib

    from finchspark.config import PipelineConfig

    df = spark.createDataFrame(
        [(0, None), (1, "x" * 64)], "doc_id long, content string"
    )
    cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=8, final_size=8))
    rows = {r["doc_id"]: r for r in build_signatures(df, cfg, key_cols=("doc_id",)).collect()}
    assert rows[0]["n_kmers"] == 0 and rows[0]["n_bytes"] == 0
    assert rows[0]["sha256"] == hashlib.sha256(b"").hexdigest()
    assert rows[1]["n_kmers"] == 44


def test_string_blob_rebases_sliced_arrays():
    """A sliced Arrow batch must expose ONLY its own bytes (a shared parent
    buffer once made every sub-chunk re-hash the whole batch)."""
    import numpy as np
    import pyarrow as pa

    from finchspark.operators.signature import _string_blob

    arr = pa.array(["aaaa", "bbbbbb", "cc", "ddddd"])
    sl = arr.slice(1, 2)  # "bbbbbb", "cc"
    blob, off = _string_blob(sl)
    assert off[0] == 0 and off[-1] == len(blob) == 8
    assert blob.tobytes() == b"bbbbbbcc"
    full_blob, full_off = _string_blob(arr)
    assert full_off[0] == 0 and full_off[-1] == len(full_blob) == 17
