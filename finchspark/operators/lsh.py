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
- bucket sizes come from a WINDOW count over the bucket partitioning, so
  the whole candidate stage shuffles the exploded bands exactly ONCE on
  (band_id, band_hash); pairs are then expanded IN-GROUP (collect_list of
  the cap-bounded member set + array pair expansion) instead of a
  self-join. The earlier alias self-join relied on `ReusedExchange` to
  share the one shuffle between its two sides — true under static
  planning, but AQE's broadcast conversion DUPLICATES the whole build-side
  subtree (explode + exchange + sort + window computed twice, measured in
  round 7: the candidate stage alone was 2.3 s of a 2.4 s LSH+verify
  stage at sf0.1). The in-group expansion has one side by construction:
  nothing to re-plan, no broadcast, no join probes. Group state is bounded
  by `bucket_cap` because the window count filters mega-buckets BEFORE any
  member list materializes; the expansion's O(s²) output — identical to
  the join's probe output — remains the binding cost in either design.
  Remaining shuffle: the final pair distinct.
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
    # in-group expansion: the groupBy keys match the window's partitioning,
    # so the member lists aggregate WITHOUT a new exchange, and the (x, i)
    # two-arg lambda pairs each member with every later one in sorted order
    # (key_a < key_b, exactly the old join condition). collect_list drops
    # NULL keys like the old join's null-rejecting condition did.
    pairs = (
        member.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("k")).alias("ks"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ks, (x, i) -> "
                    "transform(slice(ks, i + 2, size(ks)), y -> "
                    "struct(x as key_a, y as key_b))))"
                )
            ).alias("p")
        )
        .select("p.key_a", "p.key_b")
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
    group's minimum key (star edges) rather than emitting O(g^2) pairs.

    Shape: ONE exchange on sha256 with a window min+count — no join-back of
    the aggregate (the earlier groupBy+join form cost a second exchange of
    the signature keys plus a broadcast stage per call), and streaming/
    spillable per-group state, so a degenerate mega-group (10⁹ empty files)
    never materializes a member list."""
    w = Window.partitionBy("sha256")
    return (
        signatures.select(F.col(key_col).alias("key_b"), "sha256")
        # NULL shas never joined under the old equi-join form; a window
        # partition would lump them into one bogus group — keep them out
        .filter(F.col("sha256").isNotNull())
        .select(
            F.min("key_b").over(w).alias("key_a"),
            "key_b",
            F.count(F.lit(1)).over(w).alias("__n"),
        )
        .filter((F.col("__n") > 1) & (F.col("key_b") != F.col("key_a")))
        .select("key_a", "key_b")
    )
