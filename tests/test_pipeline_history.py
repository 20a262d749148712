"""Pipeline-integrated SCD2 history (maintain_history=True)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.scd import scd2_history
from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

FEED_SCHEMA = (
    "lsn long, op string, ts timestamp, repo string, path string, "
    "commit string, lang string, content string"
)

ROWS = [
    (1, "I", None, "r", "a", "c1", "py", "a-v1"),
    (2, "U", None, "r", "a", "c1", "py", "a-v1"),   # no-op update
    (3, "U", None, "r", "a", "c3", "py", "a-v2"),
    (4, "I", None, "r", "b", "c4", "py", "b-v1"),
    (5, "D", None, "r", "b", "c5", "py", ""),
    (6, "I", None, "r", "b", "c6", "py", "b-v2"),
    (7, "U", None, "r", "a", "c7", "py", "a-v3"),
]


def test_pipeline_history_equals_one_shot(spark, tmp_path):
    feed = spark.createDataFrame(ROWS, FEED_SCHEMA)
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_history=True,
    )
    pipe.replay_bounded(feed, epochs=3)
    one_shot = scd2_history(
        feed, ["repo", "path"], "lsn", ["commit", "lang", "content"]
    )
    got = pipe.history.read().select(*one_shot.columns)
    assert got.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(got).count() == 0
    # the LWW target and the history's current versions agree on state
    cur = {
        (r["path"], r["content"])
        for r in pipe.history.read().filter("is_current = 1").collect()
    }
    tgt = {
        (r["path"], r["content"]) for r in pipe.target.read().collect()
    }
    assert cur == tgt


def test_pipeline_history_epoch_redelivery_noop(spark, tmp_path):
    feed = spark.createDataFrame(ROWS, FEED_SCHEMA)
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_history=True,
    )
    pipe.replay_bounded(feed, epochs=2)
    before = sorted(map(tuple, pipe.history.read().collect()))
    # redeliver the LAST epoch (at-least-once): target merge skips via
    # its ledger, history must skip via its own
    chunk = feed.filter(F.col("lsn") >= 4)
    pipe.process_batch(chunk, 1)
    assert sorted(map(tuple, pipe.history.read().collect())) == before
