"""LSH candidate generation: band explode → capped buckets → self-join.

New design, no reference counterpart (SURVEY.md §2.7, §7.3): the reference
compares all pairs in a nested loop (`calc_sketch_distances`,
`cli/src/main.rs:315-334`) which is O(Q×R) and impossible at 10^12 files.
Here signatures carry `bands` (array<long>, index = band_id) from the
signature stage; candidates are pairs sharing ≥1 (band_id, band_hash).

Skew handling (north_rule):
- mega-buckets (license boilerplate, empty-ish files) are CAPPED: buckets
  with more than `bucket_cap` members are dropped from pair generation and
  surfaced in the metrics DataFrame instead (exact duplicates among them are
  still caught by the exact sha256 dedup operator, and the cap only kicks in
  for buckets whose members are near-identical to >cap partners anyway);
- bucket sizes come from a WINDOW count over the same partitioning the
  self-join needs, so the whole candidate stage shuffles the exploded bands
  exactly ONCE on (band_id, band_hash): the window's exchange subtree is
  byte-identical on both self-join sides (verified: `ReusedExchange` with
  static planning; AQE reuses the shuffle stage at runtime), and the join
  itself is partition-local. Remaining shuffle: the final pair distinct.
  AQE skew-join handles residual within-bucket skew.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import LshConfig


def explode_bands(signatures: DataFrame, key_col: str = "doc_id") -> DataFrame:
    return signatures.select(
        F.col(key_col),
        F.posexplode("bands").alias("band_id", "band_hash"),
    )


def candidate_pairs(
    signatures: DataFrame,
    lsh: LshConfig,
    key_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Return (pairs, bucket_metrics).

    pairs: (key_a, key_b) distinct, key_a < key_b.
    bucket_metrics: per-(band_id, band_hash) member counts for buckets that
    exceeded the cap (skew observability + lineage).
    """
    bands = explode_bands(signatures, key_col)
    # ONE shuffle on the bucket key: the window count replaces the separate
    # size aggregation + join-back (which recomputed the band explode per
    # join side at scale)
    w = Window.partitionBy("band_id", "band_hash")
    sized = bands.withColumn("bucket_size", F.count(F.lit(1)).over(w))
    overflow = (
        sized.filter(F.col("bucket_size") > lsh.bucket_cap)
        .select("band_id", "band_hash", "bucket_size")
        .distinct()
    )
    member = sized.filter(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= lsh.bucket_cap)
    ).select("band_id", "band_hash", F.col(key_col).alias("k"))
    # self-join via aliases of the SAME frame so both sides canonicalize to
    # one exchange subtree; the join is partition-local after the window
    a, b = member.alias("a"), member.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"))
        .distinct()
    )
    return pairs, overflow


def candidate_pairs_incremental(
    new_signatures: DataFrame,
    all_signatures: DataFrame,
    lsh: LshConfig,
    key_col: str = "doc_id",
) -> DataFrame:
    """Candidates touching at least one NEW document: bands of the new batch
    joined against bands of the full store (old ∪ new).

    The incremental-dedup invariant: a pair is generated exactly once over a
    document's lifetime — when its LATER member first arrives — because
    old×old pairs were produced by earlier batches and never rejoin here.
    Both-new pairs appear from both direction-orderings of the asymmetric
    join, so pairs are min/max-normalized before the distinct.

    Scale shape: the store is never shuffled whole. The new batch's bucket
    keys are tiny (micro-batch × n_bands rows) and explicitly broadcast; a
    LEFT SEMI join prunes the store's exploded bands down to buckets the
    batch actually touches — untouched buckets cannot produce candidates —
    and only that touched subset is window-counted for the cap and joined.
    Per-epoch cost is one store scan + one small shuffle of the touched
    rows, independent of total store size in shuffle volume. Bucket sizes
    still count EVERY store member of a touched bucket, so the skew cap is
    exact as the store grows. Output: (key_a, key_b) distinct,
    key_a < key_b."""
    new_bands = explode_bands(new_signatures, key_col).select(
        "band_id", "band_hash", F.col(key_col).alias("nk")
    )
    touched_keys = F.broadcast(
        new_bands.select("band_id", "band_hash").distinct()
    )
    touched = explode_bands(all_signatures, key_col).join(
        touched_keys, ["band_id", "band_hash"], "left_semi"
    )
    w = Window.partitionBy("band_id", "band_hash")
    member = (
        touched.withColumn("bucket_size", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_size") <= lsh.bucket_cap)
        .select("band_id", "band_hash", F.col(key_col).alias("sk"))
    )
    return (
        new_bands.join(member, ["band_id", "band_hash"])
        .filter(F.col("nk") != F.col("sk"))
        .select(
            F.least("nk", "sk").alias("key_a"),
            F.greatest("nk", "sk").alias("key_b"),
        )
        .distinct()
    )


def exact_dup_pairs_sha(
    signatures: DataFrame, key_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicates via sha256 grouping — O(n) with one shuffle, and the
    safety net for members of capped LSH buckets. Pairs each doc with the
    group's minimum key (star edges) rather than emitting O(g^2) pairs."""
    rep = signatures.groupBy("sha256").agg(
        F.min(key_col).alias("key_a"), F.count(F.lit(1)).alias("n")
    )
    # no broadcast hint: `rep` scales with the corpus; AQE picks broadcast
    # automatically when the dup-group table is actually small
    return (
        signatures.join(rep.filter(F.col("n") > 1), "sha256", "inner")
        .filter(F.col(key_col) != F.col("key_a"))
        .select("key_a", F.col(key_col).alias("key_b"))
    )
