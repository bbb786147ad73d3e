"""Deterministic synthetic source-code corpus with planted duplicates.

FIXTURES.md §B: the pipeline's real input shape `(repo, path, commit, lang,
content)`, synthesized as a pure function of (seed, row index) — no external
data. Planted structure: exact duplicates, near-duplicates at several
mutation intensities, containment pairs, shared license boilerplate (~10% of
files — LSH bucket-skew stress), short/empty/non-ASCII rows. Ground truth
(pair list + labels) is returned separately and never visible to the
pipeline.

Used by tests (small n) and by the scaling benchmark (n ~ 50k files ≈ the
SF=0.1 source-code table from SURVEY.md §6).
"""
from __future__ import annotations

import random

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
    """Corpus as (docs, truth): docs = list of dicts (doc_id, repo, path,
    commit, lang, content); truth = [(key_a, key_b, label)]."""
    rng = random.Random(seed)
    docs: list[dict] = []
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


def write_synth_parquet(path: str, n_base: int, seed: int = 42) -> int:
    """Generate and write the corpus as parquet via pyarrow (no Spark
    needed); returns the number of documents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs, _ = synth_documents(n_base=n_base, seed=seed)
    cols = {k: [d[k] for d in docs] for k in ("doc_id", "repo", "path", "commit", "lang", "content")}
    table = pa.table(cols)
    # small row groups: Spark can split a parquet file no finer than its row
    # groups, so one big group serializes the whole scan into ONE task no
    # matter how many executors the job has (measured: identical pipeline
    # wall time at local[2] and local[8] until this was fixed)
    pq.write_table(table, path, row_group_size=2500)
    return len(docs)


def _write_shard(args: tuple) -> int:
    dir_path, shard, n_base_shard, seed, stride = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    # per-shard seed is a pure function of (seed, shard): the corpus is
    # deterministic for a given (n_base, n_shards, seed) triple, and every
    # shard is independent — exactly how a 100 TB corpus would be produced
    # by N writers, each owning a doc_id range
    docs, _ = synth_documents(n_base=n_base_shard, seed=(seed << 20) | shard)
    off = shard * stride
    cols = {
        k: [d[k] for d in docs]
        for k in ("doc_id", "repo", "path", "commit", "lang", "content")
    }
    cols["doc_id"] = [i + off for i in cols["doc_id"]]
    pq.write_table(
        pa.table(cols),
        f"{dir_path}/part-{shard:05d}.parquet",
        row_group_size=2500,
    )
    return len(docs)


def write_synth_parquet_sharded(
    dir_path: str,
    n_base: int,
    seed: int = 42,
    n_shards: int = 32,
    processes: int | None = None,
) -> int:
    """Parallel sharded corpus writer for large scaling corpora (multi-GB:
    the single-file writer is one ~18 MB/s python process and would hold the
    whole corpus in memory). Writes `n_shards` independent parquet files
    under `dir_path` from a process pool; doc_ids are disjoint per shard
    (shard-offset stride), duplicate structure is planted intra-shard.
    Deterministic in (n_base, n_shards, seed). Returns total docs."""
    import multiprocessing as mp
    import os

    os.makedirs(dir_path, exist_ok=True)
    per = -(-n_base // n_shards)  # ceil
    # each base row adds at most 2 docs, plus 5 edge rows per shard
    stride = 2 * per + 16
    jobs = [(dir_path, s, per, seed, stride) for s in range(n_shards)]
    procs = processes or min(n_shards, os.cpu_count() or 8)
    with mp.get_context("spawn").Pool(procs) as pool:
        counts = pool.map(_write_shard, jobs)
    return sum(counts)
