"""Streaming pipeline: end-to-end availableNow run, checkpoint resume,
exactly-once re-delivery, lineage emission, schema evolution
(SURVEY.md §2.9, §5 layers 4-5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_resolution_platform_spark.operators.cdc import apply_changes
from data_ingestion_resolution_platform_spark.sources.feed import CHANGE_FEED_SCHEMA, synth_change_feed
from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline
from data_ingestion_resolution_platform_spark.streaming.schema_evolution import (
    reconcile_exprs,
    reconcile_json_stream,
)


def _write_feed(spark, feed_dir: str, feed, n_files: int = 4):
    feed.repartitionByRange(n_files, "lsn").write.mode("append").parquet(feed_dir)


def _expected_state(spark, feed):
    return {
        (r["repo"], r["path"]): (r["lsn"], r["content"])
        for r in apply_changes(feed, ["repo", "path"], "lsn").collect()
    }


def _target_state(pipe):
    return {
        (r["repo"], r["path"]): (r["lsn"], r["content"])
        for r in pipe.target.read().filter(F.col("op") != "D").collect()
    }


def test_stream_end_to_end_and_resume(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    wh = str(tmp_path / "wh")
    feed1 = synth_change_feed(spark, 2000, n_repos=20, seed=11).filter(F.col("lsn") < 1200)
    _write_feed(spark, feed_dir, feed1)

    pipe = CDCPipeline(spark, feed_dir, wh)
    q = pipe.run_stream(available_now=True)
    q.awaitTermination(120)
    assert _target_state(pipe) == _expected_state(spark, feed1)
    epochs_after_first = pipe.target.committed_epochs()
    assert len(epochs_after_first) >= 1

    # restart with same checkpoint and no new data: no new epochs
    q2 = pipe.run_stream(available_now=True)
    q2.awaitTermination(120)
    assert pipe.target.committed_epochs() == epochs_after_first

    # new files arrive; resumed stream processes only the delta
    feed2 = synth_change_feed(spark, 2000, n_repos=20, seed=11).filter(F.col("lsn") >= 1200)
    _write_feed(spark, feed_dir, feed2)
    q3 = pipe.run_stream(available_now=True)
    q3.awaitTermination(120)
    full = synth_change_feed(spark, 2000, n_repos=20, seed=11)
    assert _target_state(pipe) == _expected_state(spark, full)

    # lineage rows exist for every committed epoch, offsets sane
    lin = pipe.lineage.read()
    assert lin.count() > 0
    assert lin.filter(F.col("min_lsn") > F.col("max_lsn")).count() == 0
    assert lin.select("status").distinct().collect()[0][0] == "COMMITTED"


def test_batch_replay_equivalence_and_reprocess(spark, tmp_path):
    wh = str(tmp_path / "wh2")
    feed = synth_change_feed(spark, 3000, n_repos=30, seed=5)
    pipe = CDCPipeline(spark, feed_dir="unused", warehouse=wh)
    pipe.replay_bounded(feed, epochs=5)
    assert _target_state(pipe) == _expected_state(spark, feed)
    # duplicate replay of the same epochs is a pure no-op
    stats = pipe.replay_bounded(feed, epochs=5)
    assert all(s.get("skipped") for s in stats)
    assert _target_state(pipe) == _expected_state(spark, feed)


def test_conflict_table_populated(spark, tmp_path):
    wh = str(tmp_path / "wh3")
    rows = [
        (1, "I", "2024-01-01 00:00:00", "r1", "a.py", "c1", "py", "v1"),
        (2, "U", "2024-01-01 00:00:01", "r1", "a.py", "c2", "py", "v2"),
        (3, "I", "2024-01-01 00:00:02", "r1", "b.py", "c3", "py", "same"),
        (4, "U", "2024-01-01 00:00:03", "r1", "b.py", "c4", "py", "same"),
    ]
    feed = spark.createDataFrame(rows, "lsn long, op string, ts string, repo string, path string, commit string, lang string, content string").withColumn("ts", F.col("ts").cast("timestamp"))
    pipe = CDCPipeline(spark, feed_dir="unused", warehouse=wh)
    pipe.process_batch(feed, epoch=0)
    conf = {(r["repo"], r["path"]) for r in pipe.conflicts.read().collect()}
    # a.py: two distinct content hashes ⇒ conflict; b.py same content ⇒ silent dedup
    assert conf == {("r1", "a.py")}


def test_reconcile_exprs_add_rename_missing(spark):
    # feed with legacy name `body` (→content), an extra column, and no `ts`
    df = spark.createDataFrame(
        [(1, "I", "r", "p", "c", "py", "hello", "extra")],
        "lsn long, op string, repo string, path string, commit string, lang string, body string, junk string",
    )
    out = reconcile_exprs(df, CHANGE_FEED_SCHEMA, renames={"body": "content"})
    assert out.columns == [f.name for f in CHANGE_FEED_SCHEMA.fields]
    row = out.first()
    assert row["content"] == "hello"
    assert row["ts"] is None
    assert "junk" not in out.columns


def test_reconcile_json_stream_heterogeneous(spark):
    lines = [
        '{"lsn": 1, "op": "I", "repo": "r", "path": "p", "commit": "c", "lang": "py", "content": "a"}',
        '{"lsn": 2, "op": "U", "repo": "r", "path": "p", "body": "b", "new_field": 42}',
        '{"lsn": 3, "op": "D", "repo": "r", "path": "q"}',
    ]
    schema = T.StructType([f for f in CHANGE_FEED_SCHEMA.fields if f.name != "ts"])
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    out = reconcile_json_stream(df, schema, renames={"body": "content"}).orderBy("lsn")
    rows = out.collect()
    assert [r["content"] for r in rows] == ["a", "b", None]
    assert [r["lsn"] for r in rows] == [1, 2, 3]
    assert "new_field" not in out.columns


def test_stream_mid_run_kill_is_idempotent(spark, tmp_path):
    """Simulate redelivery after a crash *after* data write but *before*
    checkpoint commit: process_batch twice with the same epoch."""
    wh = str(tmp_path / "wh4")
    feed = synth_change_feed(spark, 500, n_repos=5, seed=3)
    pipe = CDCPipeline(spark, feed_dir="unused", warehouse=wh)
    pipe.process_batch(feed, epoch=7)
    before = _target_state(pipe)
    out = pipe.process_batch(feed, epoch=7)  # redelivery
    assert out.get("skipped")
    assert _target_state(pipe) == before
