"""F5 re-filter operator vs the kernel's filter_abundance."""
import numpy as np

from finchspark.kernels import KmerCounts, filter_abundance, i64_to_u64_shifted


def test_refilter_matches_kernel(spark):
    from finchspark.config import PipelineConfig
    from finchspark.kernels import SketchParams, shingle_hashes, sketch_hashes
    from finchspark.operators.refilter import refilter_signatures
    from finchspark.operators.signature import build_signatures

    docs = []
    for i in range(5):
        rep = f"dup_line_{i} = payload_{i}\n" * 10
        uniq = "".join(f"u_{i}_{j} = {j}\n" for j in range(25))
        docs.append((i, rep + uniq))
    df = spark.createDataFrame(docs, "doc_id long, content string")
    cfg = PipelineConfig(sketch=SketchParams(kmers_to_sketch=256, final_size=256))
    sigs = build_signatures(df, cfg, key_cols=("doc_id",), content_col="content")
    out = {
        r["doc_id"]: r
        for r in refilter_signatures(sigs, abun_low=2, final_size=16).collect()
    }
    p = cfg.sketch
    for i, content in docs:
        kc = sketch_hashes(shingle_hashes(content.encode(), p.kmer_length, p.hash_seed), p)
        expect = filter_abundance(kc, 2, None)
        expect_h = expect.hashes[:16]
        expect_c = expect.counts[:16]
        got = out[i]
        got_h = i64_to_u64_shifted(np.array(got["hashes"], dtype=np.int64))
        assert np.array_equal(got_h, expect_h), i
        assert got["counts"] == expect_c.tolist(), i
        assert all(c >= 2 for c in got["counts"])
