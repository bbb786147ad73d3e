"""Text-analysis operators for training-data pipelines (all JVM-side).

Every operator here is pure built-in column expressions (whole-stage
codegen, no UDFs), deliberately written so a DuckDB oracle can express the
identical computation — these back several `queries()`/`oracle_sql()` entries
in `__spark_entry__.py`.

Operators: token counting, quality scoring (length/punct/stopword ratios),
language-ID (stopword + CJK heuristic), document fingerprinting (min-hash
over character n-grams), token-frequency histogram (the payload analogue of
the reference's depth histogram G2, `lib/src/statistics.rs:30-47`) and the
token abundance filter (F3 analogue, `lib/src/filtering.rs:329-343`).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small fixed stopword lists (shared with the SQL oracles)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "für"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "con", "para"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "avec", "pour"],
}


def _tokens(col: str = "text"):
    return F.filter(F.split(F.col(col), r"\s+"), lambda x: x != "")


def token_stats(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    toks = _tokens(text)
    return docs.select(
        F.col(key),
        F.length(text).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.when(F.size(toks) > 0, F.length(F.regexp_replace(F.col(text), r"\s+", "")) / F.size(toks))
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Length / punctuation / uppercase / stopword ratios — the standard
    cheap quality signals for corpus filtering."""
    toks = _tokens(text)
    n_chars = F.length(text)
    nonspace = F.length(F.regexp_replace(F.col(text), r"\s", ""))
    # regexp_replace strips exactly the non-alnum-non-space chars, so the
    # length drop IS the punctuation count
    punct = n_chars - F.length(F.regexp_replace(F.col(text), r"[^a-zA-Z0-9\s]", ""))
    upper = F.length(F.col(text)) - F.length(F.regexp_replace(F.col(text), r"[A-Z]", ""))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en, F.lower(t))))
    return docs.select(
        F.col(key),
        n_chars.alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.when(nonspace > 0, punct / nonspace).otherwise(F.lit(0.0)).alias("punct_ratio"),
        F.when(n_chars > 0, upper / n_chars).otherwise(F.lit(0.0)).alias("upper_ratio"),
        F.when(F.size(toks) > 0, stop_hits / F.size(toks))
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
    )


def language_id(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Heuristic language ID: CJK character share decides 'zh'; otherwise the
    stopword list with the most token hits wins (deterministic tiebreak:
    first language in alphabetical order attaining the max; 'und' when no
    stopword hits at all)."""
    toks = _tokens(text)

    def _hits(stopwords: list[str]):
        arr = F.array(*[F.lit(w) for w in stopwords])
        # single-arg lambda on purpose: Spark treats a 2-arg higher-order
        # function lambda as (element, index)
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))

    hit_cols = [
        _hits(STOPWORDS[lang]).alias(f"hits_{lang}") for lang in sorted(STOPWORDS)
    ]
    cjk = F.length(F.col(text)) - F.length(
        F.regexp_replace(F.col(text), r"[一-鿿]", "")
    )
    base = docs.select(F.col(key), F.col(text), cjk.alias("n_cjk"), *hit_cols)
    langs = sorted(STOPWORDS)
    # argmax with deterministic preference: first language (alphabetical)
    # achieving the max hit count; 'und' when no hits at all
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in langs:
        c = F.col(f"hits_{lang}")
        cond = c > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, c).otherwise(best_hits)
    return base.select(
        F.col(key),
        F.when(F.col("n_cjk") > 0, F.lit("zh")).otherwise(best).alias("pred_lang"),
    )


def fingerprints(
    docs: DataFrame, key: str = "doc_id", text: str = "text", n: int = 3
) -> DataFrame:
    """Document fingerprint: minimum md5 over all character n-grams — a
    1-permutation MinHash usable as a cheap near-dup blocking key."""
    # substring with a dynamic start needs expr(); stays in codegen.
    # case-guard because Spark's sequence(1, 0) is DESCENDING, not empty
    return docs.select(
        F.col(key),
        F.expr(
            f"case when length({text}) >= {n} then "
            f"array_min(transform(sequence(1, length({text}) - {n - 1}),"
            f" i -> md5(substring({text}, i, {n})))) else cast(null as string) end"
        ).alias("fingerprint"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 — the
    MOSS scheme): md5 every character k-gram, take the minimum of each
    window of w consecutive gram hashes, emit the distinct selected hashes.
    Guarantees every shared substring of length >= k + w - 1 contributes at
    least one shared fingerprint, with expected density 2/(w+1) — the
    rolling-hash document-fingerprint operator of the training-data suite.

    Pure Catalyst (whole-stage codegen, no UDF); output is one row per
    (doc, fingerprint), the inverted-index-ready layout.
    """
    n_grams = f"greatest(length({text}) - {k - 1}, 0)"
    # bind the gram-hash array to a column FIRST so it is computed once per
    # row — inlining it inside the window lambda would re-hash per window
    hs = (
        f"transform(sequence(1, {n_grams}), i -> md5(substring({text}, i, {k})))"
    )
    # case-guard because Spark's sequence(1, 0) is DESCENDING, not empty
    winnow = (
        f"case when size(__hs) >= {w} then "
        f"array_distinct(transform(sequence(1, size(__hs) - {w - 1}),"
        f" j -> array_min(slice(__hs, j, {w})))) "
        f"else array() end"
    )
    return (
        docs.withColumn("__hs", F.expr(f"case when {n_grams} > 0 then {hs} else array() end"))
        .select(F.col(key), F.explode(F.expr(winnow)).alias("fingerprint"))
    )


def token_freq_hist(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """G2 analogue: histogram of token depths — depth d → how many (doc,
    token) groups occur exactly d times."""
    toks = docs.select(F.col(key), F.explode(_tokens(text)).alias("token"))
    depth = toks.groupBy(key, "token").agg(F.count(F.lit(1)).alias("depth"))
    return depth.groupBy("depth").agg(F.count(F.lit(1)).alias("n_kmers"))


def token_abundance_filter(
    docs: DataFrame, low: int, high: int, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """F3 analogue on tokens: keep (doc, token) with low <= depth <= high
    (inclusive bounds, `lib/src/filtering.rs:335-340`)."""
    toks = docs.select(F.col(key), F.explode(_tokens(text)).alias("token"))
    depth = toks.groupBy(key, "token").agg(F.count(F.lit(1)).alias("depth"))
    return depth.filter((F.col("depth") >= low) & (F.col("depth") <= high))


# BPE-ish tokenizer pattern (GPT-2-style segmentation simplified to ASCII
# classes, no lookahead so Java regex and RE2/DuckDB agree): a token is an
# optional leading space + a letter run, + a digit run, + a symbol run, or a
# bare whitespace run. Disjoint classes make alternative order immaterial.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+"


def bpe_token_stats(
    docs: DataFrame, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Token counting the way a BPE pre-tokenizer segments text — the
    training-data budget estimator (whitespace token counts undercount
    punctuation-heavy text). Pure codegen: regexp_count per class.

    Output: (key, n_tokens_bpe, n_word_tokens, n_num_tokens, n_punct_tokens,
    chars_per_token)."""
    total = F.expr(f"regexp_count({text}, '{BPE_TOKEN_RE}')")
    words = F.expr(f"regexp_count({text}, ' ?[A-Za-z]+')")
    nums = F.expr(f"regexp_count({text}, ' ?[0-9]+')")
    punct = F.expr(f"regexp_count({text}, ' ?[^A-Za-z0-9 \\t\\n\\r\\f]+')")
    return docs.select(
        F.col(key),
        total.alias("n_tokens_bpe"),
        words.alias("n_word_tokens"),
        nums.alias("n_num_tokens"),
        punct.alias("n_punct_tokens"),
        F.round(
            F.when(total > 0, F.length(text) / total).otherwise(F.lit(0.0)), 9
        ).alias("chars_per_token"),
    )
