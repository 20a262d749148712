"""Distributed prefix-sum / shard packing, stratified sampling, PII redaction."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.functions.text import redact_pii, stratified_keep
from data_ingestion_resolution_platform_spark.operators.packing import (
    global_prefix_sum,
    pack_shards,
)


def _synth(spark, n=1000, seed_mod=97):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(seed_mod)) + 1).cast("long").alias("tokens"),
    )


def test_prefix_sum_matches_single_window(spark):
    df = _synth(spark).repartition(7)  # scramble input partitioning
    got = {
        r["doc_id"]: r["off"]
        for r in global_prefix_sum(df, ["doc_id"], "tokens", "off", num_partitions=6).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["off"]
        for r in df.select(
            "doc_id", F.coalesce(F.sum("tokens").over(w), F.lit(0)).alias("off")
        ).collect()
    }
    assert got == want


def test_prefix_sum_more_partitions_than_rows(spark):
    df = _synth(spark, n=3)
    rows = global_prefix_sum(df, ["doc_id"], "tokens", "off", num_partitions=16).collect()
    assert len(rows) == 3
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    acc = 0
    for r in by_id:
        assert r["off"] == acc
        acc += r["tokens"]


def test_pack_shards_invariants(spark):
    budget = 50
    packed = pack_shards(_synth(spark, n=400), "tokens", budget, num_partitions=5)
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    acc = 0
    for r in rows:
        assert r["global_offset"] == acc
        assert r["shard_id"] == acc // budget
        assert r["offset_in_shard"] == acc - r["shard_id"] * budget
        assert 0 <= r["offset_in_shard"] < budget
        acc += r["tokens"]
    # monotone non-decreasing in doc order; docs larger than the budget
    # may skip shard ids (they straddle), so contiguity is NOT implied
    ids = [r["shard_id"] for r in rows]
    assert ids == sorted(ids) and ids[0] == 0


def test_pack_shards_deterministic(spark):
    df = _synth(spark, n=500)
    a = sorted(pack_shards(df, "tokens", 64).collect())
    b = sorted(pack_shards(df, "tokens", 64).collect())
    assert a == b


def test_stratified_keep_deterministic_and_rate(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("zh")).alias("lang"),
    )
    keep = stratified_keep(F.col("doc_id"), F.col("lang"), {"en": 0.8, "zh": 0.1})
    out = df.where(keep)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # integer-hash buckets give near-exact rates over 5k ids per group
    assert abs(counts["en"] / 5000 - 0.8) < 0.05
    assert abs(counts["zh"] / 5000 - 0.1) < 0.05
    assert sorted(out.collect()) == sorted(df.where(keep).collect())  # replay-stable


def test_redact_pii_forms(spark):
    rows = (
        spark.createDataFrame(
            [
                ("a", "mail bob.smith+x@corp.example.org now"),
                ("b", "call 12-345-678-9012 today"),
                ("c", "acct 123456789 and short 123456 stays"),
                ("d", "clean text"),
            ],
            "k string, t string",
        )
        .select("k", redact_pii(F.col("t")).alias("r"))
        .collect()
    )
    got = {r["k"]: r["r"] for r in rows}
    assert got["a"] == "mail [EMAIL] now"
    assert got["b"] == "call [PHONE] today"
    assert got["c"] == "acct [NUM] and short 123456 stays"
    assert got["d"] == "clean text"
