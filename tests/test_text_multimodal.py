"""Text-analysis functions + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.functions.text import (
    detect_language,
    doc_fingerprint,
    doc_fingerprint_portable,
    quality_score,
    token_count,
)
from data_ingestion_resolution_platform_spark.operators.multimodal import (
    multimodal_features,
    resize_stub,
)


def test_detect_language(spark):
    rows = [
        (1, "the cat and the dog of a to"),
        (2, "der Hund und die Katze ist"),
        (3, "le chat et la maison les des"),
        (4, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["lang"] for r in df.select("id", detect_language(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, 42 times!")], "id long, text string")
    row = df.select(
        token_count(F.col("text"), "whitespace").alias("ws"),
        token_count(F.col("text"), "bpe").alias("bpe"),
    ).first()
    assert row["ws"] == 4
    # hello | world | , | 42 | times | !
    assert row["bpe"] == 6


def test_quality_score_orders_sensibly(spark):
    rows = [
        (1, "The cat sat on the mat and it was a good day in the sun."),
        (2, "@@@ ### !!! $$$ %%% ^^^"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["q"] for r in df.select("id", quality_score(F.col("text")).alias("q")).collect()}
    assert out[1] > out[2]
    assert 0.0 <= out[2] <= out[1] <= 1.0


def test_fingerprints_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "id long, text string"
    )
    out = {r["id"]: (r["f1"], r["f2"]) for r in df.select(
        "id",
        doc_fingerprint(F.col("text")).alias("f1"),
        doc_fingerprint_portable(F.col("text")).alias("f2"),
    ).collect()}
    assert out[1] == out[2]
    assert out[1][0] != out[3][0]  # rolling hash is order-sensitive


def test_multimodal_features_contract(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG-fake-image-bytes")), (2, bytearray(b""))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in multimodal_features(df, "payload", "doc_id").collect()}
    assert out[1]["n_bytes"] == 21
    assert out[1]["header_hex"] == b"\x89PNG"[:4].hex()
    assert out[1]["fake_width"] == 16 + 21 % 64
    assert out[2]["n_bytes"] == 0
    assert out[2]["header_hex"] is None


def test_resize_stub_shapes(spark):
    df = spark.createDataFrame([(1, bytearray(b"x" * 1000))], "doc_id long, payload binary")
    row = resize_stub(df, "payload", "doc_id", 32, 32).first()
    assert row["width"] == 32 and row["height"] == 32
    assert len(row["payload"]) == 32 * 32 // 8 + 1
