"""Minimal FASTA reader — parity-test fixtures only.

The engine's real source is a table of documents (`spark.read.parquet` /
Iceberg); this exists solely so golden tests can consume the reference's
`query.fa` fixture (reference input parsing lives in needletail,
`lib/src/lib.rs:60-68`).
"""
from __future__ import annotations

from pathlib import Path


def read_fasta(path: str | Path) -> list[tuple[str, bytes]]:
    """Return [(record_id, concatenated_sequence_bytes), ...]."""
    records: list[tuple[str, bytes]] = []
    name: str | None = None
    chunks: list[bytes] = []
    with open(path, "rb") as fh:
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    records.append((name, b"".join(chunks)))
                name = line[1:].decode().split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        records.append((name, b"".join(chunks)))
    return records
