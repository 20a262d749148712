"""Repetition-based document quality stats (Gopher-rule family).

``functions/text.py`` scores documents with *pointwise* features
(length, punctuation, stopword ratios — all expression-only). Corpus
curation additionally filters on *repetition* (Rae et al., Gopher,
arXiv:2112.11446 §A1.1: duplicate-line / top-n-gram fractions): highly
repetitive documents are boilerplate or spam and poison training data.

This module computes the token-level repetition family with the same
explode → groupBy plan shape as the inverted index (one shuffle over
(doc, gram) pairs, map-side partial counts; never a per-doc Python
loop):

- ``n_tokens``          total tokens
- ``distinct_ratio``    distinct tokens / tokens  (low ⇒ repetitive)
- ``top_token_frac``    most-frequent token count / tokens
- ``top_bigram_frac``   most-frequent bigram count / (tokens - 1)

All arithmetic is exact integer counts divided once at the end, so the
DuckDB oracle reproduces values bit-for-bit. Tokenization matches
``operators/search.py`` (lowercase, non-alphanumeric splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.search import _tokens


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition features; one explode + two grouped
    aggregations (tokens, bigrams) joined back on the doc id."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    tok_counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_tok"),
    )

    # bigrams via zip of the token array with its tail — expression-only
    arr = _tokens(F.col(text_col))
    bigrams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.zip_with(
                F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    bg_top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"))
    )

    out = tok_stats.join(bg_top, "doc_id", "left")
    return out.select(
        "doc_id",
        "n_tokens",
        (F.col("n_distinct") / F.col("n_tokens")).alias("distinct_ratio"),
        (F.col("top_tok") / F.col("n_tokens")).alias("top_token_frac"),
        F.when(
            F.col("n_tokens") > 1,
            F.coalesce(F.col("top_bg"), F.lit(0)) / (F.col("n_tokens") - 1),
        ).alias("top_bigram_frac"),
    )
