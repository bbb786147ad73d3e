"""Sharded parallel corpus writer (FIXTURES.md §B at multi-GB scale).

Spark-free: pure pyarrow checks on determinism, doc_id disjointness and
schema parity with the single-file writer — the properties
scripts/job_scaling.py relies on for the north-rule scaling corpus.
"""
from __future__ import annotations

import pyarrow.parquet as pq

from finchspark.sources.synth import (
    write_synth_parquet,
    write_synth_parquet_sharded,
)


def _read_all(path):
    return pq.read_table(path)


def test_sharded_deterministic_and_disjoint(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    n_a = write_synth_parquet_sharded(str(a), n_base=600, n_shards=4, processes=2)
    n_b = write_synth_parquet_sharded(str(b), n_base=600, n_shards=4, processes=4)
    ta, tb = _read_all(str(a)), _read_all(str(b))
    assert ta.num_rows == n_a == n_b
    # byte-for-byte deterministic regardless of pool size
    assert ta.equals(tb)
    ids = ta.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids)), "doc_ids must be globally unique"


def test_sharded_schema_matches_single_writer(tmp_path):
    single = tmp_path / "single.parquet"
    sharded = tmp_path / "sharded"
    write_synth_parquet(str(single), n_base=100)
    write_synth_parquet_sharded(str(sharded), n_base=100, n_shards=2, processes=2)
    assert _read_all(str(single)).schema.equals(_read_all(str(sharded)).schema)


def test_sharded_plants_duplicate_structure(tmp_path):
    """Each shard carries the planted dup structure: exact duplicates exist
    within every shard (roll 0 of the base loop), so the scaling corpus
    exercises the LSH/verify/CC stages, not just the scan."""
    d = tmp_path / "c"
    write_synth_parquet_sharded(str(d), n_base=120, n_shards=2, processes=2)
    t = _read_all(str(d))
    contents = t.column("content").to_pylist()
    assert len(contents) - len(set(contents)) >= 20, "expected exact dups"
