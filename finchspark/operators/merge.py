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
