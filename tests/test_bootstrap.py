"""Snapshot → streaming handoff (CDCPipeline.bootstrap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.cdc import apply_changes
from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

FEED_SCHEMA = (
    "lsn long, op string, ts timestamp, repo string, path string, "
    "commit string, lang string, content string"
)


def _feed(spark):
    # prefix (lsn <= 4): a created+updated, b created+deleted, c created
    # tail   (lsn  > 4): a updated, b re-inserted, c deleted, d created
    rows = [
        (1, "I", None, "r", "a", "c1", "py", "a-v1"),
        (2, "U", None, "r", "a", "c2", "py", "a-v2"),
        (3, "I", None, "r", "b", "c3", "py", "b-v1"),
        (4, "D", None, "r", "b", "c4", "py", ""),
        (4, "I", None, "r", "c", "c4", "py", "c-v1"),
        (5, "U", None, "r", "a", "c5", "py", "a-v3"),
        (6, "I", None, "r", "b", "c6", "py", "b-v2"),
        (7, "D", None, "r", "c", "c7", "py", ""),
        (8, "I", None, "r", "d", "c8", "py", "d-v1"),
    ]
    return rows


@pytest.fixture()
def handoff(spark, tmp_path):
    feed = spark.createDataFrame(_feed(spark), FEED_SCHEMA)
    pipe = CDCPipeline(spark, feed_dir="unused", warehouse=str(tmp_path / "wh"))
    wm = 4
    snapshot = apply_changes(
        feed.filter(F.col("lsn") <= wm), ["repo", "path"], "lsn"
    ).drop("op", "lsn")
    return feed, pipe, snapshot, wm


def test_bootstrap_then_tail_equals_full_replay(handoff):
    feed, pipe, snapshot, wm = handoff
    pipe.bootstrap(snapshot, wm)
    pipe.replay_bounded(feed.filter(F.col("lsn") > wm), epochs=2)
    got = {
        r["path"]: r["content"]
        for r in pipe.target.read().select("path", "content").collect()
    }
    # prefix-deleted b re-inserted in tail; c deleted in tail; a updated
    assert got == {"a": "a-v3", "b": "b-v2", "d": "d-v1"}


def test_bootstrap_is_ledgered(handoff):
    feed, pipe, snapshot, wm = handoff
    first = pipe.bootstrap(snapshot, wm)
    assert not first.get("skipped")
    assert pipe.bootstrap(snapshot, wm)["skipped"]


def test_bootstrap_rows_carry_watermark_stamp(handoff):
    feed, pipe, snapshot, wm = handoff
    pipe.bootstrap(snapshot, wm)
    rows = pipe.target.read().select("lsn", "op").distinct().collect()
    assert {(r["lsn"], r["op"]) for r in rows} == {(wm, "I")}
