"""Decontamination: overlap counting, hashed parity, clean remainder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.decontam import (
    decontaminate,
    ngram_array,
)


@pytest.fixture(scope="module")
def spark():
    from data_ingestion_resolution_platform_spark.session import get_spark

    return get_spark("test_decontam", parallelism=4)


def test_overlap_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text with no benchmark overlap at all"),
            (3, "the quick brown fox jumps over something else entirely here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "witness the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.n_shared
        for r in decontaminate(corpus, bench, n=5, min_overlap=1).collect()
    }
    # doc 1 shares many distinct 5-grams, doc 3 shares exactly two
    # ("the quick brown fox jumps", "quick brown fox jumps over"), doc 2 none
    assert out[1] > 2
    assert out[3] == 2
    assert 2 not in out


def test_hashed_matches_exact(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared prefix tokens alpha beta gamma delta epsilon zeta "),
            F.when(F.col("id") % 3 == 0, F.lit("benchmark tail phrase one two"))
            .otherwise(F.concat(F.lit("doc "), F.col("id").cast("string"))),
        ).alias("text"),
    )
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    exact = decontaminate(corpus, bench, n=4, min_overlap=1, hashed=False)
    hashed = decontaminate(corpus, bench, n=4, min_overlap=1, hashed=True)
    assert exact.exceptAll(hashed).count() == 0
    assert hashed.exceptAll(exact).count() == 0


def test_short_docs_yield_no_grams(spark):
    df = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    row = df.select(ngram_array(F.col("text"), 8).alias("g")).collect()[0]
    assert row.g == []
