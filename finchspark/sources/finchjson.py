"""MultiSketch JSON interchange — the reference's golden-file format (S4).

Round-trips sketches in the exact shape of finch's JSON serialization
(`lib/src/serialization/json.rs`): hashes as QUOTED u64 strings, parallel
`kmers`/`counts` arrays, envelope fields kmer/alphabet/preserveCase/
canonical/sketchSize/hashType/hashBits/hashSeed/scale. On read,
`extra_count` is reconstructed as count/2 exactly like the reference
(`json.rs:126`). This is the interchange/golden format; the engine's durable
form is the parquet/Iceberg signatures table.
"""
from __future__ import annotations

import json
from typing import Any

import numpy as np

from ..api import Sketch
from ..kernels import KmerCounts, SketchParams


def to_multisketch_json(sketches: list[Sketch]) -> str:
    if not sketches:
        raise ValueError("no sketches")
    p = sketches[0].params
    out: dict[str, Any] = {
        "kmer": p.kmer_length,
        "alphabet": "ACGT",
        "preserveCase": False,
        "canonical": True,
        "sketchSize": p.final_size if p.sketch_type == "mash" else p.kmers_to_sketch,
        "hashType": "MurmurHash3_x64_128",
        "hashBits": 64,
        "hashSeed": p.hash_seed,
    }
    if p.sketch_type == "scaled":
        out["scale"] = p.scale
    out["sketches"] = [
        {
            "name": sk.name,
            "seqLength": sk.seq_length,
            "numValidKmers": sk.num_valid_kmers,
            "comment": "",
            "filters": {},
            "hashes": [str(int(h)) for h in sk.hashes.hashes],
            "kmers": (
                [k.decode() for k in sk.hashes.kmers] if sk.hashes.kmers else None
            ),
            "counts": [int(c) for c in sk.hashes.counts],
        }
        for sk in sketches
    ]
    return json.dumps(out)


def from_multisketch_json(payload: str) -> list[Sketch]:
    data = json.loads(payload)
    params = SketchParams(
        sketch_type="scaled" if data.get("scale") else "mash",
        kmers_to_sketch=data["sketchSize"],
        final_size=data["sketchSize"],
        kmer_length=data["kmer"],
        hash_seed=data.get("hashSeed", 0),
        scale=data.get("scale") or 0.001,
    )
    out = []
    for js in data["sketches"]:
        hashes = np.array([int(h) for h in js["hashes"]], dtype=np.uint64)
        counts = np.array(js.get("counts") or [1] * len(hashes), dtype=np.int64)
        # reference reconstructs extra_count = count / 2 (`json.rs:126`)
        extras = counts // 2
        kmers = [k.encode() for k in js["kmers"]] if js.get("kmers") else None
        out.append(
            Sketch(
                js["name"],
                KmerCounts(hashes, counts, extras, kmers),
                params,
                # reference key is "seqLength" (`json.rs:80,100`); accept the
                # legacy "length" key this module emitted before round 2
                seq_length=js.get("seqLength", js.get("length")) or 0,
                num_valid_kmers=js.get("numValidKmers") or 0,
            )
        )
    return out
