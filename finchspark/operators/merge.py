"""Sketch merge as a Spark-native aggregation (D8).

The reference merges two sketches with a sorted merge-join summing counts,
then clips by (size, scale) (`merge_sketches`, `lib/src/python.rs:24-100`).
The Spark-native group form: explode signatures → groupBy(group, hash) →
sum counts → keep each group's bottom-k by hash → re-assemble sorted arrays.
Because stored hashes are sign-shifted i64, LongType ordering == unsigned
hash ordering, so ascending-LongType bottom-k IS the reference's
ascending-hash clip.

Skew discipline: the bottom-k clip is a TWO-LEVEL SALTED selection, never a
single `row_number() over (partition by grp)` — that window sorts ALL
distinct hashes of a group in one task, and a mega-repo with 10⁹ distinct
shingles would OOM or straggle it at scale. Level 1 takes the bottom-k
within each (grp, pmod(hash, S)) salt class (per-task rows ≤ |group|/S in
expectation — low hash bits are uniform under murmur3); level 2 takes the
bottom-k of the ≤ S·k survivors (per-task rows bounded by S·k regardless of
group size). The result is identical to the unsalted clip by bottom-k
mergeability: every hash in the global bottom-k has < k hashes below it
overall, hence < k below it inside its own salt class, hence survives
level 1.

Used for repo/commit-level signatures: merge all file sketches of a group
into one group sketch (set union + count sum), exactly like calling the
reference's `merge` over the group, modulo the documented streaming-count
caveat (kernels.sketch docstring).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_signatures_exploded(
    signatures: DataFrame,
    group_col: str,
) -> DataFrame:
    """Unclipped merge as EXPLODED ROWS: (group, hash, count) with counts
    summed across the group's members — the scale form of `size=None`.

    One hash-aggregation shuffle on (grp, hash); no per-group array is ever
    assembled, so a mega-group with 10⁹ distinct shingles is just 10⁹
    well-distributed rows, never one task's state. Use this (and join/agg on
    it directly) when the full merged set is needed at scale; use
    `merge_signatures_by(size=k)` when a bounded group sketch suffices."""
    exploded = signatures.select(
        F.col(group_col).alias("grp"),
        F.explode(F.arrays_zip("hashes", "counts")).alias("z"),
    ).select("grp", F.col("z.hashes").alias("hash"), F.col("z.counts").alias("count"))
    return (
        exploded.groupBy("grp", "hash")
        .agg(F.sum("count").alias("count"))
        .withColumnRenamed("grp", group_col)
    )


def merge_signatures_by(
    signatures: DataFrame,
    group_col: str,
    size: int | None = None,
    n_salts: int = 64,
    max_group_hashes: int = 8 << 20,
) -> DataFrame:
    """(group, hashes, counts, n_members) with per-group merged sketches.

    `size=k`: bottom-k clip via the two-level salted selection (module
    docstring) — per-task rows are bounded by max(|group|/n_salts, n_salts·k)
    whatever the group size. `size=None` assembles the FULL merged set into
    one array per group: exact (the oracle form) but inherently one row per
    group — per-group state is unbounded, so at scale either pass `size` or
    use `merge_signatures_exploded` and keep the merged set as rows. The
    `max_group_hashes` guard (default 8M) hard-fails assembly for any group
    beyond it rather than silently OOMing an executor."""
    merged = merge_signatures_exploded(signatures, group_col).withColumnRenamed(
        group_col, "grp"
    )
    if size is not None:
        # level 1: bottom-k within each salt class (salt = low bits of the
        # hash — uniform under murmur3, and deterministic so re-runs agree)
        w1 = Window.partitionBy("grp", "__salt").orderBy(F.col("hash").asc())
        survivors = (
            merged.withColumn("__salt", F.pmod(F.col("hash"), F.lit(n_salts)))
            .withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= size)
            .drop("__rn", "__salt")
        )
        # level 2: bottom-k of the ≤ n_salts·size survivors per group
        w2 = Window.partitionBy("grp").orderBy(F.col("hash").asc())
        merged = (
            survivors.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= size)
            .drop("__rn")
        )
    members = signatures.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    assembled = merged.groupBy("grp").agg(
        F.array_sort(F.collect_list(F.struct(F.col("hash"), F.col("count")))).alias(
            "hc"
        )
    )
    if size is None:
        # fail loudly instead of letting one mega-group OOM its executor;
        # the caller's scale options are size=k or the exploded form
        assembled = assembled.withColumn(
            "hc",
            F.when(
                F.size("hc") <= F.lit(max_group_hashes), F.col("hc")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "merge_signatures_by(size=None): group exceeds "
                            f"{max_group_hashes} distinct hashes — pass size=k "
                            "or use merge_signatures_exploded: "
                        ),
                        F.col("grp").cast("string"),
                    )
                )
            ),
        )
    out = (
        assembled.select(
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
