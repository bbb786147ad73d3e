"""Catalyst column-expression helpers (whole-stage codegen, no UDFs)."""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_2_63 = float(2**63)
_2_64 = float(2**64)


def unshift_u64(col: Column) -> Column:
    """Shifted-i64 signature hash → its unsigned value as double (lossy above
    2^53 — display/estimation only; exact paths use the numpy bridge)."""
    return col.cast("double") + F.lit(_2_63)


def kmv_cardinality(hashes_col: str) -> Column:
    """G1: k-minimum-values distinct-shingle estimate from a signature array
    (`cardinality`, `lib/src/statistics.rs:8-23`): (n-1) / (max_hash/2^64).
    Column form uses double arithmetic; the bit-exact f32 reference variant is
    `finchspark.kernels.cardinality`."""
    n = F.size(hashes_col)
    last = unshift_u64(F.element_at(F.col(hashes_col), -1))
    return F.when(n <= 0, F.lit(0)).otherwise(
        ((n - 1).cast("double") / (last / F.lit(_2_64))).cast("long")
    )


def mash_distance(jaccard: Column, k: int) -> Column:
    """D2: -ln(2j/(1+j))/k clamped to [0,1] (`lib/src/distance.rs:37-41`)."""
    d = -F.log((2.0 * jaccard) / (1.0 + jaccard)) / F.lit(float(k))
    return F.when(jaccard <= 0.0, F.lit(1.0)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), d))
    )


def mean_depth(counts_col: str = "counts") -> Column:
    """G3: mean retained-shingle depth per document (`cli/src/main.rs:146-187`
    weighted-histogram mean, expressed directly over the counts array)."""
    total = F.aggregate(counts_col, F.lit(0).cast("long"), lambda a, x: a + x)
    n = F.size(counts_col)
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def depth_histogram(signatures, counts_col: str = "counts"):
    """G2: corpus-level depth histogram over signature count arrays
    (`hist`, `lib/src/statistics.rs:30-47`, sparse form): depth → #minmers."""
    return (
        signatures.select(F.explode(counts_col).alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_kmers"))
    )
