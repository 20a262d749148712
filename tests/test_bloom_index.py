"""Per-file Bloom-filter point-lookup skipping (sources/bloom_index.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.sources.bloom_index import (
    bloom_pruned_scan,
    build_bloom_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom"))
    data = os.path.join(root, "data")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(8, "user_id").write.parquet(data)
    stats = build_bloom_index(spark, root, [data], "user_id")
    assert stats["files_indexed"] >= 4  # one per non-empty partition
    return spark, root, data, ev


def test_probe_prunes_and_is_exact(indexed):
    spark, root, data, ev = indexed
    uid = ev.select("user_id").head().user_id
    df, report = bloom_pruned_scan(spark, root, [data], "user_id", uid)
    # hash-partitioned by user_id ⇒ the user lives in exactly one file;
    # bloom keeps that file plus possible false positives, never all
    assert 1 <= report["files_kept"] < report["files_total"]
    expect = ev.filter(F.col("user_id") == uid)
    assert df.count() == expect.count() > 0
    assert df.exceptAll(expect).count() == 0
    assert expect.exceptAll(df).count() == 0


def test_probe_absent_value(indexed):
    spark, root, data, ev = indexed
    df, report = bloom_pruned_scan(spark, root, [data], "user_id", 10**12)
    assert df.count() == 0
    assert report["files_kept"] < report["files_total"]


def test_rewritten_file_always_kept(indexed, tmp_path):
    spark, root, data, ev = indexed
    # a file rewritten after indexing must be treated as unknown (kept)
    files = sorted(
        os.path.join(data, f) for f in os.listdir(data) if f.endswith(".parquet")
    )
    victim = files[0]
    raw = open(victim, "rb").read()
    os.remove(victim)
    with open(victim, "wb") as f:
        f.write(raw)  # same bytes, new mtime ⇒ stale manifest entry
    df, report = bloom_pruned_scan(spark, root, [data], "user_id", 10**12)
    assert report["files_kept"] >= 1  # the stale file survives pruning
    assert df.count() == 0  # residual filter still exact


def test_extra_predicates_residual(indexed):
    spark, root, data, ev = indexed
    uid = ev.select("user_id").head().user_id
    df, _ = bloom_pruned_scan(
        spark, root, [data], "user_id", uid, extra_predicates=[("value", ">=", 50.0)]
    )
    expect = ev.filter((F.col("user_id") == uid) & (F.col("value") >= 50.0))
    assert df.count() == expect.count()
