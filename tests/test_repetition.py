"""Repetition quality stats (operators/quality.py)."""

from __future__ import annotations

import pytest

from data_ingestion_resolution_platform_spark.operators.quality import (
    repetition_stats,
)


def test_hand_computed_fractions(spark):
    rows = [
        (1, "a a a a"),          # 4 tokens, 1 distinct, top bigram 'a a' ×3
        (2, "a b c d"),          # all distinct, every bigram unique
        (3, "spam spam ham spam"),
        (4, "x"),                # single token → no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}

    r1 = got[1]
    assert r1.n_tokens == 4
    assert r1.distinct_ratio == pytest.approx(0.25)
    assert r1.top_token_frac == pytest.approx(1.0)
    assert r1.top_bigram_frac == pytest.approx(1.0)  # 3/3

    r2 = got[2]
    assert r2.distinct_ratio == pytest.approx(1.0)
    assert r2.top_token_frac == pytest.approx(0.25)
    assert r2.top_bigram_frac == pytest.approx(1.0 / 3.0)

    r3 = got[3]
    assert r3.top_token_frac == pytest.approx(0.75)  # spam 3/4
    assert r3.top_bigram_frac == pytest.approx(1.0 / 3.0)  # 'spam spam' 1/3

    r4 = got[4]
    assert r4.n_tokens == 1
    assert r4.top_bigram_frac is None  # undefined for single-token docs
