"""Inverted-index text retrieval: postings, TF-IDF stats, BM25 top-k.

The reference resolves entities over exact keys only; a training-data
pipeline additionally needs *lexical retrieval* over the corpus (find
documents for a probe query — e.g. contamination checks against eval
sets, targeted corpus slicing, nearest-neighbor seeding). This module
implements the classic inverted-index path Spark-first:

- ``postings(docs)``: one explode + one groupBy ⇒ the (term, doc_id,
  tf) posting-list table. At 100 TB this is THE index artifact — write
  it partitioned/bucketed by ``term`` so query-time lookups are
  partition-pruned scans, never full-corpus scans.
- ``bm25_topk(docs, queries)``: query terms are a tiny literal frame,
  **broadcast** against the exploded corpus BEFORE the tf aggregation —
  the shuffle carries only rows whose term appears in some query
  (corpus-size-independent for selective queries), never the whole
  posting table. Scores aggregate per (query, doc) with map-side
  partials; top-k is a per-query window over the scored slice only.

Scale notes (10^10 docs): no collect, no cross join, no all-pairs.
The only global scalars (N, avgdl) come from a 1-row aggregate that is
broadcast-joined, not collected. Skewed terms ("the") are excluded by
the caller's stopword list or score ~0 via IDF; the broadcast join
replicates only query terms, so a stop-wordy query costs one scan.

Reference semantics mirrored: none directly (the reference has no
search); tokenization matches ``functions.text.tokenize`` conventions
so corpus stats line up with ``token_stats``/``text_quality``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.util import local_df

# Portable tokenizer: lowercase, split on runs of non-alphanumerics.
# DuckDB twin: list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')
TOKEN_SPLIT_REGEX = r"[^a-z0-9]+"

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(text_col) -> F.Column:
    return F.filter(
        F.split(F.lower(text_col), TOKEN_SPLIT_REGEX), lambda t: t != F.lit("")
    )


def postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) posting table — the inverted index.

    One explode + one hash aggregation (map-side partial count). Write
    this ``partitionBy("term_bucket")`` or bucketed by term for
    pruned query-time access at scale.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl) token counts — expression-only, no shuffle."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(F.col(text_col))).alias("dl"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k BM25 hits per query ⇒ (query_id, rank, doc_id, score).

    ``queries``: small in-memory [(query_id, query_text)] — tokenized
    with the same portable tokenizer and **broadcast**; the corpus side
    never shuffles full posting lists, only rows matching query terms.

    idf(t)    = ln(1 + (N - df + 0.5)/(df + 0.5))      (Robertson/Lucene)
    score(d)  = Σ_t idf·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))

    Deterministic output: ties broken by doc_id; score rounded to 4
    decimals (both engines compute IEEE doubles; rounding absorbs
    sum-order noise).
    """
    spark: SparkSession = docs.sparkSession
    qterms = []
    seen = set()
    for qid, qtext in queries:
        for t in _py_tokens(qtext):
            if (qid, t) not in seen:
                seen.add((qid, t))
                qterms.append((qid, t))
    # JVM VALUES relation (util.local_df): query terms are a bounded
    # driver-side list; avoid forking the Python worker pool for them
    qdf = local_df(spark, qterms, "query_id long, term string")

    # corpus stats: 1-row aggregate, broadcast — never collected
    dls = doc_lengths(docs, text_col, id_col)
    stats = dls.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # explode → broadcast-filter to query terms → tf per (query, term, doc)
    hits = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )

    # df per matched term from the distinct (term, doc) pairs of hits
    dfreq = (
        hits.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )

    # hits (query-matched slice) is the small side everywhere: broadcast
    # it against the corpus-length frame; the corpus never shuffles.
    scored = (
        dls.join(F.broadcast(hits.join(F.broadcast(dfreq), "term")), "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
    )

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _py_tokens(text: str) -> list[str]:
    """Driver-side twin of the portable tokenizer (query strings only)."""
    import re

    return [t for t in re.split(TOKEN_SPLIT_REGEX, text.lower()) if t]


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary head: top-k terms by collection frequency
    ⇒ (rank, term, cf, df). The tokenizer-vocabulary precursor.

    One explode + one groupBy (map-side partial sums); global top-k is
    a ``LIMIT`` sort — Spark executes TakeOrderedAndProject (per-
    partition heaps, no full sort shuffle).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    agg = toks.groupBy("term").agg(
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    top = agg.orderBy(F.col("cf").desc(), F.col("term").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cf").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "cf", "df"
    )
