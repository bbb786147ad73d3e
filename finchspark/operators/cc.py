"""Connected components: alternating large-star / small-star on DataFrames.

No reference counterpart (finch stops at pairwise distances); clustering is
the north-star extension. Implements the MapReduce CC algorithm of Kiveris et
al. ("Connected Components in MapReduce and Beyond", SoCC'14) with plain
DataFrame ops — converges in O(log n) rounds, each round two shuffles, and
tolerates high-degree nodes (boilerplate mega-components) because both
operations only ever attach nodes to their neighborhood minimum rather than
materializing components on one reducer.

Scale notes: each iteration is `groupBy(u).agg(min)` + an equi-join on u —
both shuffle on u; AQE handles skewed hubs. Iteration state is truncated
with localCheckpoint (or a durable checkpoint dir via the pipeline layer) so
the lineage doesn't grow unboundedly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    und = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    m = (
        und.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        und.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small; connect all smaller neighbors (and self) of
    u to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        oriented.join(m, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .union(m.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .distinct()
    )
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    `edges` must have two numeric/orderable columns; self-loops and
    duplicates are tolerated. Empty edge input returns an empty frame.
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = e.localCheckpoint(eager=False)
    prev_sig = None
    for _ in range(max_iter):
        # _small_star output is already distinct; the self-loop filter is
        # narrow — no extra shuffle per iteration
        e = _small_star(_large_star(e))
        e = e.filter(F.col("src") != F.col("dst"))
        # lazy checkpoint + ONE action per iteration: the convergence
        # signature below materializes the checkpoint inside the same job
        e = e.localCheckpoint(eager=False)
        # convergence: edge set stable (order-insensitive checksum);
        # bit_xor is overflow-free under ANSI mode and edges are distinct
        sig = e.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).first()
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # after convergence edges form stars child -> root(min)
    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return comp.union(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )
