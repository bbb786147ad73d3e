"""Shared fixtures: Spark session + deterministic synthetic source-code corpus
with planted duplicate structure (FIXTURES.md §B; generator lives in
finchspark.sources.synth so benchmarks reuse it at larger n)."""
from __future__ import annotations

import os

import pytest

# the sandbox resolv.conf points at a black-hole nameserver; pin the local
# address so no Spark component ever waits on a resolver timeout
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("finchspark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # keep the warmed python worker pool alive across the suite (a VM
        # throttle window can stretch past the 60 s idle timeout, and every
        # respawned worker re-pays the pandas/pyarrow import)
        .config("spark.python.worker.idleTimeoutSeconds", "0")
        .getOrCreate()
    )
    yield s


from finchspark.sources.synth import synth_documents  # noqa: F401  (re-export)


@pytest.fixture(scope="session")
def corpus():
    return synth_documents()


@pytest.fixture(scope="session")
def documents_df(spark, corpus):
    docs, _ = corpus
    return spark.createDataFrame(docs).select(
        "doc_id", "repo", "path", "commit", "lang", "content"
    )


def brute_force_pairs(docs, params, threshold: float):
    """Reference result: exact kernel sketches + all-pairs raw_distance.

    Returns the set of (i, j) with jaccard >= threshold, i < j — the truth
    the pipeline's recall is gated against (SURVEY.md §5.4)."""
    from finchspark.kernels import min_scale, raw_distance, shingle_hashes, sketch_hashes

    sketches = []
    for d in docs:
        h = shingle_hashes(d["content"].encode(), params.kmer_length, params.hash_seed)
        sketches.append(sketch_hashes(h, params))
    scale = params.scale if params.sketch_type == "scaled" else None
    out = set()
    for i in range(len(docs)):
        if len(sketches[i]) == 0:
            continue  # empty sketch: finch jaccard is degenerately 1.0 vs
            # everything (`distance.rs:120-125`); short docs go through the
            # SimHash/sha paths, not the MinHash gate
        for j in range(i + 1, len(docs)):
            if len(sketches[j]) == 0:
                continue
            sc = min_scale(scale, scale) if scale is not None else 0.0
            _, jac, _, _ = raw_distance(sketches[i].hashes, sketches[j].hashes, sc)
            if jac >= threshold:
                out.add((i, j))
    return out


def union_find_components(n: int, pairs) -> dict[int, int]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}
