"""Sketch merge as a Spark-native aggregation (D8).

The reference merges two sketches with a sorted merge-join summing counts,
then clips by (size, scale) (`merge_sketches`, `lib/src/python.rs:24-100`).
The Spark-native group form: explode signatures → groupBy(group, hash) →
sum counts → keep each group's bottom-k by hash → re-assemble sorted arrays.
Because stored hashes are sign-shifted i64, LongType ordering == unsigned
hash ordering, so `row_number() over (order by hash)` IS the reference's
ascending-hash clip.

Used for repo/commit-level signatures: merge all file sketches of a group
into one group sketch (set union + count sum), exactly like calling the
reference's `merge` over the group, modulo the documented streaming-count
caveat (kernels.sketch docstring).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_signatures_by(
    signatures: DataFrame,
    group_col: str,
    size: int | None = None,
) -> DataFrame:
    """(group, hashes, counts, n_members) with per-group merged sketches."""
    exploded = signatures.select(
        F.col(group_col).alias("grp"),
        F.explode(F.arrays_zip("hashes", "counts")).alias("z"),
    ).select("grp", F.col("z.hashes").alias("hash"), F.col("z.counts").alias("count"))
    merged = exploded.groupBy("grp", "hash").agg(F.sum("count").alias("count"))
    if size is not None:
        w = Window.partitionBy("grp").orderBy(F.col("hash").asc())
        merged = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= size)
            .drop("rn")
        )
    members = signatures.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    out = (
        merged.groupBy("grp")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("hash"), F.col("count")))
            ).alias("hc")
        )
        .select(
            "grp",
            F.col("hc.hash").alias("hashes"),
            F.col("hc.count").cast("array<int>").alias("counts"),
        )
        .join(members, "grp")
        .withColumnRenamed("grp", group_col)
    )
    return out


def merged_jaccard_pairs(
    signatures: DataFrame,
    group_col: str,
    threshold: float,
    size: int | None = None,
) -> DataFrame:
    """Group-level (repo-level) Jaccard: merge each group's file sketches
    into one group sketch (D8), then run the exact set-similarity join
    between the merged sketches — finch's genome-level `dist` lifted to the
    repo granularity (compare whole repos/commits instead of single files,
    `lib/src/python.rs:24-100` merge + `distance.rs:66-126` dist).

    With COMPLETE per-file sketches and `size=None` (no clip), the merged
    hash array is exactly the group's distinct-shingle set, so the returned
    jaccard/containment are the true set quantities between repos — the
    form the driver value-oracles. With bounded `size`, it degrades to
    bottom-k sketch Jaccard between group sketches (the production form at
    scale: per-group state is clipped to k, and the pair join runs over
    k-bounded arrays regardless of repo size).

    Output: (group_a, group_b, jaccard, containment_a) with group_a <
    group_b lexicographically.
    """
    from .allpairs import exact_jaccard_pairs

    merged = merge_signatures_by(signatures, group_col, size=size)
    return exact_jaccard_pairs(merged, threshold, key_col=group_col)
