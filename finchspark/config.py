"""Pipeline configuration + parameter-compatibility semantics.

Mirrors the reference's param model: `SketchParams` enum + compatibility
checking (`lib/src/sketch_schemes/mod.rs:53-71,179-212`) and the CLI's
oversketch arithmetic (`cli/src/cli.rs:287-295`). The `params_hash` is stored
with every checkpoint so a resume with different k/seed/scale/bands hard-fails
instead of silently mixing configs (G4 semantics).
"""
from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field, replace

from .kernels import FilterParams, SketchParams


@dataclass(frozen=True)
class LshConfig:
    """OPH banding config. P(candidate) = 1 - (1 - j^r)^b; defaults tuned for
    a 0.8 Jaccard threshold: 1-(1-0.8^4)^16 ≈ 0.9998."""

    n_bands: int = 16
    n_rows: int = 4
    bucket_cap: int = 2000  # drop mega-buckets (boilerplate skew guard)

    @property
    def signature_len(self) -> int:
        return self.n_bands * self.n_rows


@dataclass(frozen=True)
class PipelineConfig:
    sketch: SketchParams = field(default_factory=SketchParams)
    lsh: LshConfig = field(default_factory=LshConfig)
    jaccard_threshold: float = 0.8
    max_dist: float | None = None  # F8: drop pairs with mash_distance > max_dist
    short_doc_min_kmers: int = 8  # below this, MinHash is unstable -> SimHash path
    simhash_max_hamming: int = 3  # SimHash near-dup cutoff (4-band pigeonhole)

    def params_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def check_compatibility(a: SketchParams, b: SketchParams) -> None:
    """Reject comparisons across incompatible sketch params — the analogue of
    `SketchParams::check_compatibility` (`sketch_schemes/mod.rs:185-212`):
    k-mer length, hash seed, and scale must agree."""
    if a.kmer_length != b.kmer_length:
        raise ValueError(f"kmer_length mismatch: {a.kmer_length} vs {b.kmer_length}")
    if a.hash_seed != b.hash_seed:
        raise ValueError(f"hash_seed mismatch: {a.hash_seed} vs {b.hash_seed}")
    if a.sketch_type != b.sketch_type:
        raise ValueError(f"sketch_type mismatch: {a.sketch_type} vs {b.sketch_type}")
    if a.sketch_type == "scaled" and a.scale != b.scale:
        raise ValueError(f"scale mismatch: {a.scale} vs {b.scale}")


def resolve_err_filter(err_filter_pct: float, kmer_length: int) -> float:
    """F7 — CLI err-filter percent → kernel filter level
    (`cli/src/cli.rs:264-265`): the flag is an assumed error rate as a
    PERCENTAGE, validated to [0, 100/k] (`get_float_arg`, `cli.rs:226-239`),
    then scaled by k/100 so the kernel value lands in [0, 1]. Default flag
    value is 1 (`cli.rs:147`), i.e. 0.21 at k=21."""
    limit = 100.0 / float(kmer_length)
    if not (0.0 <= err_filter_pct <= limit):
        raise ValueError(
            f"err-filter must be between 0 and {limit}"
        )
    return err_filter_pct * float(kmer_length) / 100.0


def with_oversketch(
    cfg: SketchParams, n_hashes: int, filters: FilterParams, oversketch: int = 200
) -> SketchParams:
    """CLI param resolution: when filtering is on, sketch n_hashes*oversketch
    then filter then truncate to n_hashes (`cli/src/cli.rs:287-295`)."""
    on = filters.filter_on is True
    return replace(
        cfg,
        kmers_to_sketch=n_hashes * oversketch if on else n_hashes,
        final_size=n_hashes,
    )
