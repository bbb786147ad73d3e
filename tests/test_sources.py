"""JSON interchange (S4) round-trip + filtered signature variant (A6/F1)."""
import numpy as np
import pytest

from finchspark.api import sketch_bytes
from finchspark.kernels import FilterParams
from finchspark.sources.finchjson import from_multisketch_json, to_multisketch_json


def test_multisketch_json_roundtrip():
    a = sketch_bytes("doc_a", b"roundtrip content for sketch json " * 10, n_hashes=32)
    b = sketch_bytes("doc_b", b"another file body entirely here!! " * 10, n_hashes=32)
    payload = to_multisketch_json([a, b])
    import json

    env = json.loads(payload)
    assert env["kmer"] == 21
    assert env["hashSeed"] == 0
    assert env["hashBits"] == 64
    # hashes serialized as quoted u64 strings (reference json.rs:73)
    assert all(isinstance(h, str) for h in env["sketches"][0]["hashes"])

    back = from_multisketch_json(payload)
    assert [s.name for s in back] == ["doc_a", "doc_b"]
    for orig, got in zip([a, b], back):
        assert np.array_equal(got.hashes.hashes, orig.hashes.hashes)
        assert np.array_equal(got.hashes.counts, orig.hashes.counts)
        # extra_count reconstructed as count/2 (json.rs:126)
        assert np.array_equal(got.hashes.extra_counts, orig.hashes.counts // 2)
        cont, jac = orig.compare(got)
        assert cont == 1.0 and jac == 1.0


def test_filtered_signature_stage(spark):
    from finchspark.config import PipelineConfig, with_oversketch
    from finchspark.kernels import (
        SketchParams,
        filter_counts,
        shingle_hashes,
        sketch_hashes,
    )
    from finchspark.operators.signature import build_signatures

    # content with a high-abundance repeated block + unique noise lines
    docs = []
    for i in range(6):
        rep = f"repeated_block_{i} = common_payload_value_{i}\n" * 40
        noise = "".join(f"unique_{i}_{j} = {j}\n" for j in range(30))
        docs.append((i, rep + noise))
    df = spark.createDataFrame(docs, "doc_id long, content string")

    filters = FilterParams(filter_on=True, abun_filter_low=2)
    base = SketchParams(kmer_length=21)
    sk = with_oversketch(base, n_hashes=64, filters=filters, oversketch=4)
    cfg = PipelineConfig(sketch=sk)
    rows = {
        r["doc_id"]: r
        for r in build_signatures(
            df, cfg, key_cols=("doc_id",), content_col="content", filters=filters
        ).collect()
    }
    for i, content in docs:
        h = shingle_hashes(content.encode(), 21, 0)
        expect = sketch_hashes(
            h, sk, FilterParams(filter_on=True, abun_filter_low=2)
        )
        got = rows[i]
        got_h = np.array(got["hashes"], dtype=np.int64)
        from finchspark.kernels import i64_to_u64_shifted

        assert np.array_equal(i64_to_u64_shifted(got_h), expect.hashes), i
        assert got["counts"] == expect.counts.tolist()
        # every retained shingle passed the abundance filter
        assert all(c >= 2 for c in got["counts"])
        assert len(got["hashes"]) <= 64


def test_multisketch_json_reference_keys():
    """Interchange keys must match the reference serializer
    (`lib/src/serialization/json.rs:80-81`): seqLength + numValidKmers."""
    import json

    a = sketch_bytes("doc_a", b"reference key shape check body " * 8, n_hashes=16)
    env = json.loads(to_multisketch_json([a]))
    js = env["sketches"][0]
    assert js["seqLength"] == a.seq_length > 0
    assert js["numValidKmers"] == a.num_valid_kmers > 0
    assert "length" not in js

    back = from_multisketch_json(to_multisketch_json([a]))[0]
    assert back.seq_length == a.seq_length
    assert back.num_valid_kmers == a.num_valid_kmers

    # legacy payloads carrying "length" are still readable
    js_legacy = dict(js)
    del js_legacy["seqLength"], js_legacy["numValidKmers"]
    js_legacy["length"] = 123
    env2 = dict(env)
    env2["sketches"] = [js_legacy]
    back2 = from_multisketch_json(json.dumps(env2))[0]
    assert back2.seq_length == 123 and back2.num_valid_kmers == 0
