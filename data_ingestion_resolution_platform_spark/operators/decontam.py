"""Train/test decontamination: flag corpus docs overlapping a benchmark.

A training corpus that contains benchmark/eval text inflates every
downstream metric; large-scale pipelines therefore run an n-gram
decontamination pass (the GPT-3/PaLM/Llama recipe): a document is
contaminated when it shares at least ``min_overlap`` distinct
``n``-token n-grams with the benchmark set.

Spark shape (never all-pairs):
- explode each side to its DISTINCT n-grams — corpus side is
  O(tokens) rows, one shuffle;
- the benchmark n-gram set is comparatively tiny (evals are KBs-MBs
  while the corpus is TBs) → broadcast equi-join against it;
- per-doc count of matched grams = the contamination score.

At 100 TB the gram string itself never needs to ride the shuffle:
pass ``hashed=True`` to join on ``xxhash64(gram)`` instead (8 bytes vs
~50; collisions can only over-count by a vanishing epsilon, and only
toward MORE conservative removal). The oracled driver query uses the
exact string form so DuckDB reproduces it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.functions.text import tokenize


def ngram_array(text: Column, n: int) -> Column:
    """DISTINCT whitespace-token n-grams of ``text`` as an array of
    space-joined strings (expression-only; empty array when the doc has
    fewer than ``n`` tokens — Spark's ``sequence`` would otherwise
    count DOWN for a negative range)."""
    toks = tokenize(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Per-corpus-doc benchmark n-gram overlap counts.

    Returns ``(id_col, n_shared)`` for documents sharing at least
    ``min_overlap`` distinct n-grams with ANY benchmark text —
    the rows a training pipeline drops (or routes to review) before
    tokenization. Anti-join the result against the corpus to keep the
    clean remainder.
    """
    gram = lambda df: df.select(  # noqa: E731
        F.col(id_col), F.explode(ngram_array(F.col(text_col), n)).alias("__g")
    )
    corpus_grams = gram(corpus)
    bench_grams = gram(benchmark).select("__g").distinct()
    if hashed:
        key = F.xxhash64(F.col("__g")).alias("__g")
        corpus_grams = corpus_grams.select(id_col, key)
        bench_grams = bench_grams.select(key)
    hits = corpus_grams.join(F.broadcast(bench_grams), on="__g", how="inner")
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
