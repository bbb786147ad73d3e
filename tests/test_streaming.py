"""Structured Streaming signature ingest: micro-batch output == batch
operator output; a restarted query resumes from the checkpoint and only
sketches NEW files."""
import pytest

from finchspark.config import PipelineConfig
from finchspark.kernels import SketchParams
from finchspark.operators.signature import build_signatures
from finchspark.streaming.ingest import signatures_stream


@pytest.fixture()
def cfg():
    return PipelineConfig(sketch=SketchParams(kmers_to_sketch=32, final_size=32))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_stream_matches_batch_and_resumes(spark, cfg, tmp_path):
    src = tmp_path / "incoming"
    out = str(tmp_path / "signatures")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    first = [(i, f"document number {i} with some repeated body text " * 4) for i in range(20)]
    _docs(spark, first).write.mode("append").parquet(str(src))

    schema = "doc_id long, content string"
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = signatures_stream(stream, cfg, out, ckpt)
    q.awaitTermination(120)

    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    want = {
        r["doc_id"]: r
        for r in build_signatures(_docs(spark, first), cfg, key_cols=("doc_id",)).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["sha256"] == want[k]["sha256"]
        assert got[k]["hashes"] == want[k]["hashes"]

    # append new files; a fresh query on the same checkpoint processes ONLY
    # the new rows (no re-sketching of already-committed ones)
    second = [(100 + i, f"fresh follow-up content {i} " * 6) for i in range(5)]
    _docs(spark, second).write.mode("append").parquet(str(src))
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = signatures_stream(stream2, cfg, out, ckpt)
    q2.awaitTermination(120)

    after = spark.read.parquet(out)
    assert after.count() == len(first) + len(second)  # no duplicates
    ids = {r["doc_id"] for r in after.select("doc_id").collect()}
    assert ids == {i for i, _ in first} | {i for i, _ in second}
