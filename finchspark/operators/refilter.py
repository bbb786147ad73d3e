"""Re-filter saved signatures without re-shingling (F5).

The reference re-filters loaded sketches when stricter filter params arrive
(`FilterParams::filter_sketch`, `lib/src/filtering.rs:19-54`, applied at
`cli/src/main.rs:273-301`): abundance bounds merge stricter-wins, the sketch
is filtered in place. Spark-native form: pure Catalyst array expressions
(arrays_zip → filter → project), no UDF, no re-read of content — cheap to
run over an existing signatures table when dedup policy tightens.

Note: the dynamic err-filter threshold (F2) needs the depth histogram and
runs in the signature kernel; this operator covers the abundance-range
re-filter, which is the piece that's meaningful post-hoc for code payloads
(strand counts are always 0 there).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def refilter_signatures(
    signatures: DataFrame,
    abun_low: int | None = None,
    abun_high: int | None = None,
    final_size: int | None = None,
) -> DataFrame:
    """Keep signature entries with abun_low <= count <= abun_high (inclusive,
    `filter_abundance` semantics, `filtering.rs:329-343`), then optionally
    truncate to `final_size` smallest hashes (A4). Hash order is preserved
    (arrays stay ascending)."""
    lo = 0 if abun_low is None else abun_low
    hi = 0xFFFFFFFF if abun_high is None else abun_high
    zipped = F.filter(
        F.arrays_zip("hashes", "counts"),
        lambda x: (x["counts"] >= F.lit(lo)) & (x["counts"] <= F.lit(hi)),
    )
    if final_size is not None:
        zipped = F.slice(zipped, 1, final_size)
    out = signatures.withColumn("__z", zipped)
    return (
        out.withColumn("hashes", F.col("__z.hashes"))
        .withColumn("counts", F.col("__z.counts"))
        .drop("__z")
    )
