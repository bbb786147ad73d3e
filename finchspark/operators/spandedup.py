"""Span dedup: suffix-array common-substring detection over candidate pairs.

North-star extension layered on top of the MinHash pipeline: for pairs that
LSH/verification already flagged as related (or any pair list), compute the
maximal shared byte spans >= min_len and the span-coverage ratio. Runs the
`finchspark.kernels.suffix` kernel per pair inside one Arrow batch pass; the
pair list is the small side (post-LSH), so the join with contents is the
only shuffle.

At 10^12-file scale this NEVER runs all-pairs — it is strictly a
post-candidate refinement (SURVEY.md §7.1 step 6).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.suffix import spans_and_coverage

_OUT_FIELDS = [
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("longest_span", T.IntegerType()),
    T.StructField("coverage_a", T.DoubleType()),
    T.StructField(
        "spans",
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("pos_a", T.IntegerType()),
                    T.StructField("pos_b", T.IntegerType()),
                    T.StructField("length", T.IntegerType()),
                ]
            )
        ),
    ),
]


def span_dedup_pairs(
    pairs: DataFrame,
    documents: DataFrame,
    min_len: int = 64,
    key_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """pairs(key_a, key_b) × documents → per-pair shared spans.

    Output: (key_a, key_b, n_spans, longest_span, coverage_a, spans).
    coverage_a = fraction of A's bytes covered by shared spans (the span
    analogue of containment of A in B).
    """
    docs = documents.select(
        F.col(key_col).alias("__k"), F.col(content_col).alias("__c")
    )
    joined = (
        pairs.select("key_a", "key_b")
        .join(docs.withColumnRenamed("__k", "key_a").withColumnRenamed("__c", "content_a"), "key_a")
        .join(docs.withColumnRenamed("__k", "key_b").withColumnRenamed("__c", "content_b"), "key_b")
        .select("key_a", "key_b", "content_a", "content_b")
    )
    key_type = pairs.schema["key_a"].dataType
    schema = T.StructType(
        [T.StructField("key_a", key_type), T.StructField("key_b", key_type)]
        + _OUT_FIELDS
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ka, kb, ca, cb in zip(
                pdf["key_a"], pdf["key_b"], pdf["content_a"], pdf["content_b"]
            ):
                a = (ca or "").encode()
                b = (cb or "").encode()
                # ONE suffix-array pass per pair yields both the span list
                # and the coverage ratio (kernel LCP is vectorized — no
                # per-byte Python anywhere in this stage)
                spans, coverage = spans_and_coverage(a, b, min_len=min_len)
                rows.append(
                    {
                        "key_a": ka,
                        "key_b": kb,
                        "n_spans": len(spans),
                        "longest_span": max((s[2] for s in spans), default=0),
                        "coverage_a": coverage,
                        "spans": [
                            {"pos_a": pa, "pos_b": pb, "length": ln}
                            for pa, pb, ln in spans
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return joined.mapInPandas(compute, schema)


def span_island_pairs(
    pairs: DataFrame,
    documents: DataFrame,
    min_len: int = 32,
    key_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """pairs × documents → (key_a, key_b, n_islands, longest_island,
    coverage_a): the contiguous covered runs of A (pure string properties,
    SQL-oracle-checkable — `kernels.suffix.coverage_islands`), as opposed to
    the greedy bounded span list of `span_dedup_pairs`. Same single-shuffle
    post-candidate plan shape."""
    from ..kernels.suffix import coverage_islands

    docs = documents.select(
        F.col(key_col).alias("__k"), F.col(content_col).alias("__c")
    )
    joined = (
        pairs.select("key_a", "key_b")
        .join(docs.withColumnRenamed("__k", "key_a").withColumnRenamed("__c", "content_a"), "key_a")
        .join(docs.withColumnRenamed("__k", "key_b").withColumnRenamed("__c", "content_b"), "key_b")
        .select("key_a", "key_b", "content_a", "content_b")
    )
    key_type = pairs.schema["key_a"].dataType
    schema = T.StructType(
        [
            T.StructField("key_a", key_type),
            T.StructField("key_b", key_type),
            T.StructField("n_islands", T.LongType()),
            T.StructField("longest_island", T.LongType()),
            T.StructField("coverage_a", T.DoubleType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ka, kb, ca, cb in zip(
                pdf["key_a"], pdf["key_b"], pdf["content_a"], pdf["content_b"]
            ):
                n, longest, cov = coverage_islands(
                    (ca or "").encode(), (cb or "").encode(), min_len=min_len
                )
                rows.append(
                    {
                        "key_a": ka,
                        "key_b": kb,
                        "n_islands": n,
                        "longest_island": longest,
                        "coverage_a": cov,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return joined.mapInPandas(compute, schema)
