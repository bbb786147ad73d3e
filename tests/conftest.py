"""Shared fixtures: Spark session + deterministic synthetic source-code corpus
with planted duplicate structure (FIXTURES.md §B)."""
from __future__ import annotations

import random

import numpy as np
import pytest


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
        .getOrCreate()
    )
    yield s


_LANG_EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js", "md": "md"}
_WORDS = (
    "load save parse merge filter index batch queue shard token stream buffer "
    "record field offset cursor handle worker result config status packet"
).split()

LICENSE_HEADER = (
    "// Licensed under the Apache License, Version 2.0 (the License);\n"
    "// you may not use this file except in compliance with the License.\n"
    "// You may obtain a copy of the License at http://www.apache.org/licenses/\n"
)


def _ident(rng: random.Random) -> str:
    # unique-ish identifiers: unrelated documents must NOT share most of
    # their 21-byte shingles, otherwise small bottom-k sketches of the whole
    # corpus collapse onto the same globally-smallest hashes
    return f"{rng.choice(_WORDS)}_{rng.getrandbits(24):06x}"


def _gen_function(rng: random.Random) -> str:
    name = _ident(rng)
    args = ", ".join(_ident(rng) for _ in range(rng.randint(1, 3)))
    body = []
    for _ in range(rng.randint(3, 10)):
        body.append(
            f"    {_ident(rng)} = {_ident(rng)}({rng.randint(0, 999)}, {_ident(rng)})"
        )
    return f"def {name}({args}):\n" + "\n".join(body) + f"\n    return {_ident(rng)}\n"


def _gen_content(rng: random.Random, n_funcs: int) -> str:
    return "\n".join(_gen_function(rng) for _ in range(n_funcs))


def _mutate(rng: random.Random, content: str, intensity: float) -> str:
    """Rename-ish + line-level edits at a given intensity (0 → identical)."""
    lines = content.split("\n")
    out = []
    for line in lines:
        r = rng.random()
        if r < intensity * 0.3:
            continue  # delete line
        if r < intensity * 0.6:
            out.append(line)
            out.append(f"    # edited {rng.randint(0, 9999)}")
            continue
        out.append(line)
    text = "\n".join(out)
    if rng.random() < intensity:
        words = [w for w in _WORDS if w in text]
        if words:
            w = rng.choice(words)
            text = text.replace(w, w + str(rng.randint(0, 99)))
    return text


def synth_documents(n_base: int = 120, seed: int = 42):
    """Deterministic corpus: list of dicts (repo, path, commit, lang, content)
    + planted ground-truth pair list [(key_a, key_b, label)].

    Keys are the integer doc index (stable). Planted structure per
    FIXTURES.md §B: exact dups, near-dups at several intensities, containment,
    shared license boilerplate (~10%), short files, empty files, non-ASCII.
    """
    rng = random.Random(seed)
    docs = []
    truth: list[tuple[int, int, str]] = []

    def add(content: str, lang: str = "python") -> int:
        i = len(docs)
        repo = f"org{i % 7}/repo{i % 13}"
        path = f"src/module_{i % 5}/file_{i}.{_LANG_EXT[lang]}"
        commit = f"{rng.getrandbits(64):016x}{rng.getrandbits(64):016x}"[:40]
        docs.append(
            {"doc_id": i, "repo": repo, "path": path, "commit": commit,
             "lang": lang, "content": content}
        )
        return i

    for b in range(n_base):
        boiler = LICENSE_HEADER if rng.random() < 0.10 else ""
        base = boiler + _gen_content(rng, rng.randint(2, 8))
        i = add(base)
        roll = b % 6
        if roll == 0:  # exact duplicate
            j = add(base)
            truth.append((i, j, "exact"))
        elif roll == 1:  # light near-dup
            j = add(boiler + _mutate(rng, base, 0.02))
            truth.append((i, j, "near_high"))
        elif roll == 2:  # medium near-dup
            j = add(boiler + _mutate(rng, base, 0.06))
            truth.append((i, j, "near_mid"))
        elif roll == 3:  # containment: base embedded in a larger file
            j = add(base + "\n" + _gen_content(rng, 2))
            truth.append((i, j, "containment"))
        # rolls 4, 5: singleton

    # short / empty / non-ascii edge rows
    add("x=1", "python")
    add("", "md")
    add("print('héllo wörld — 重複排除のテスト')", "python")
    s1 = add("tiny = 42", "python")
    s2 = add("tiny = 42", "python")  # short exact pair (sha path)
    truth.append((s1, s2, "exact_short"))
    return docs, truth


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
