"""finch-like Python API: the reference's pyo3 verbs over this engine.

Mirrors the surface of the reference Python module (`lib/src/python.rs`):
`sketch_bytes` ≈ `sketch_file` (content already in memory — our sources are
tables, not files), `Sketch.compare/compare_counts/merge`, and
`Multisketch.best_match/filter_to_names/filter_to_matches`. All in-memory
verbs run the same numpy kernels the Spark UDFs use, so a result computed
here equals the distributed result bit-for-bit.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .kernels import (
    FilterParams,
    KmerCounts,
    SketchParams,
    compare_counts as _compare_counts,
    merge_sketches as _merge,
    min_scale,
    raw_distance,
    old_distance,
    shingle_hashes,
    sketch_hashes,
)


@dataclass
class Sketch:
    name: str
    hashes: KmerCounts
    params: SketchParams
    seq_length: int = 0
    num_valid_kmers: int = 0

    def compare(self, other: "Sketch", old_mode: bool = False) -> tuple[float, float]:
        """(containment, jaccard) of `other` within `self` — argument order
        matches `Sketch.compare` (`python.rs:477-487`): self is the
        reference, `other` the query."""
        if old_mode:
            c, j, _, _ = old_distance(other.hashes.hashes, self.hashes.hashes)
            return c, j
        scale_a = self.params.scale if self.params.sketch_type == "scaled" else None
        scale_b = other.params.scale if other.params.sketch_type == "scaled" else None
        c, j, _, _ = raw_distance(
            other.hashes.hashes, self.hashes.hashes, min_scale(scale_a, scale_b)
        )
        return c, j

    def compare_counts(self, other: "Sketch"):
        """`python.rs:489-559`: intersection count moments."""
        return _compare_counts(
            self.hashes.hashes, self.hashes.counts, other.hashes.hashes, other.hashes.counts
        )

    def compare_matrix(self, *sketches: "Sketch"):
        """Count matrix aligned to this sketch's hashes —
        `Sketch.compare_matrix` (`lib/src/python.rs:560-615` / D6)."""
        from .kernels.distance import minmer_matrix

        return minmer_matrix(
            self.hashes.hashes,
            [s.hashes.hashes for s in sketches],
            [s.hashes.counts for s in sketches],
        )

    def merge(self, other: "Sketch", size: int | None = None) -> "Sketch":
        scale = self.params.scale if self.params.sketch_type == "scaled" else None
        h, c, e = _merge(
            self.hashes.hashes,
            self.hashes.counts,
            self.hashes.extra_counts,
            other.hashes.hashes,
            other.hashes.counts,
            other.hashes.extra_counts,
            size,
            scale,
        )
        return Sketch(
            self.name,
            KmerCounts(h, c, e),
            self.params,
            self.seq_length + other.seq_length,
            self.num_valid_kmers + other.num_valid_kmers,
        )


def sketch_bytes(
    name: str,
    content: bytes,
    n_hashes: int = 1000,
    kmer_length: int = 21,
    seed: int = 0,
    filters: FilterParams | None = None,
) -> Sketch:
    """≈ `finch.sketch_file` (`python.rs:632-679`): note the Python API does
    NOT apply the CLI's ×200 oversketch (`python.rs:662-668`)."""
    params = SketchParams(
        sketch_type="mash",
        kmers_to_sketch=n_hashes,
        final_size=n_hashes,
        kmer_length=kmer_length,
        hash_seed=seed,
    )
    hashes = shingle_hashes(content, kmer_length, seed)
    kc = sketch_hashes(hashes, params, filters)
    return Sketch(name, kc, params, seq_length=len(content), num_valid_kmers=len(hashes))


@dataclass
class Multisketch:
    """Container ops (`python.rs:105-266`)."""

    sketches: list[Sketch] = field(default_factory=list)

    def add(self, sketch: Sketch) -> None:
        self.sketches.append(sketch)

    def best_match(self, query: Sketch) -> tuple[int, Sketch]:
        """argmax containment (`python.rs:196-216`); first index wins ties
        (strict `>` comparison like the reference)."""
        best_ix, best_cont = 0, 0.0
        for ix, sk in enumerate(self.sketches):
            cont, _ = sk.compare(query)
            if cont > best_cont:
                best_cont, best_ix = cont, ix
        return best_ix, self.sketches[best_ix]

    def filter_to_matches(self, query: Sketch, threshold: float) -> None:
        self.sketches = [
            sk for sk in self.sketches if sk.compare(query)[0] >= threshold
        ]

    def filter_to_names(self, names: list[str]) -> None:
        keep = set(names)
        self.sketches = [sk for sk in self.sketches if sk.name in keep]
