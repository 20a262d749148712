"""Round-4 ADVICE.md regression tests.

One test per advisor finding:
- kmeans: a single seeded cluster (k=1, or all ids in one residue class
  mod k) must not crash F.least (PySpark requires >= 2 columns)
- bootstrap seeds maintained side tables: stats from the snapshot (the
  next epoch's signed-delta subtraction needs the pre-images present)
  and SCD2 history open versions at the watermark LSN
- historize_epoch's replay-contract guard refuses equality too: a delta
  whose first LSN EQUALS an open version's valid_from_lsn would create
  a zero-length version + duplicate MERGE keys
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.cdc import apply_changes
from data_ingestion_resolution_platform_spark.operators.kmeans import kmeans_fit_predict
from data_ingestion_resolution_platform_spark.operators.scd import historize_epoch
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable
from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

FEED_SCHEMA = (
    "lsn long, op string, ts timestamp, repo string, path string, "
    "commit string, lang string, content string"
)


# --- kmeans single-seeded-cluster -----------------------------------------

def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [v / 1000.0 for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_k1(spark):
    emb = _emb(spark, [(0, [100, 0]), (1, [110, 0]), (2, [90, 0])])
    out = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_fit_predict(emb, "embedding", "vec_id", k=1, iters=1).collect()
    }
    # single cluster: centroid after one iteration = mean (100, 0)
    assert out == {0: (0, 0), 1: (0, 100), 2: (0, 100)}


def test_kmeans_single_residue_class(spark):
    # ids 0, 4, 8 with k=4: only residue 0 is seeded; the other three
    # clusters never exist and assignment must still plan (old code:
    # F.least(one_term) raised AssertionError)
    emb = _emb(spark, [(0, [100, 0]), (4, [110, 0]), (8, [90, 0])])
    out = kmeans_fit_predict(emb, "embedding", "vec_id", k=4, iters=2).collect()
    assert {r["cluster"] for r in out} == {0}
    assert len(out) == 3


# --- bootstrap seeds maintained side tables --------------------------------

def _feed_rows():
    return [
        (1, "I", None, "r1", "a", "c1", "py", "aaaa"),
        (2, "I", None, "r1", "b", "c2", "py", "bb"),
        (3, "I", None, "r2", "x", "c3", "go", "xxxxxx"),
        # tail, strictly after watermark 3
        (4, "U", None, "r1", "a", "c4", "py", "aaaaaaaa"),
        (5, "D", None, "r2", "x", "c5", "go", ""),
        (6, "I", None, "r2", "y", "c6", "go", "yyy"),
    ]


def _boot(spark, tmp_path, **kw):
    feed = spark.createDataFrame(_feed_rows(), FEED_SCHEMA)
    pipe = CDCPipeline(spark, feed_dir="unused", warehouse=str(tmp_path / "wh"), **kw)
    wm = 3
    snapshot = apply_changes(
        feed.filter(F.col("lsn") <= wm), ["repo", "path"], "lsn"
    ).drop("op", "lsn")
    return feed, pipe, snapshot, wm


def test_bootstrap_seeds_stats(spark, tmp_path):
    feed, pipe, snapshot, wm = _boot(spark, tmp_path, maintain_stats=True)
    pipe.bootstrap(snapshot, wm)
    seeded = {
        r["repo"]: (r["n_paths"], r["total_bytes"])
        for r in pipe.stats.read().collect()
    }
    assert seeded == {"r1": (2, 6), "r2": (1, 6)}
    # the epoch AFTER bootstrap subtracts pre-images of touched keys —
    # only correct because the seed added them
    pipe.replay_bounded(feed.filter(F.col("lsn") > wm), epochs=1)
    got = {
        r["repo"]: (r["n_paths"], r["total_bytes"])
        for r in pipe.stats.read().collect()
    }
    # ground truth recomputed from the final target state
    want = {}
    for r in pipe.target.read().collect():
        n, b = want.get(r["repo"], (0, 0))
        want[r["repo"]] = (n + 1, b + len(r["content"]))
    assert got == want == {"r1": (2, 10), "r2": (1, 3)}


def test_bootstrap_seeds_history_open_versions(spark, tmp_path):
    feed, pipe, snapshot, wm = _boot(spark, tmp_path, maintain_history=True)
    pipe.bootstrap(snapshot, wm)
    hist = pipe.history.read()
    cur = {
        (r["repo"], r["path"]): r["valid_from_lsn"]
        for r in hist.filter(F.col("is_current") == 1).collect()
    }
    assert cur == {("r1", "a"): wm, ("r1", "b"): wm, ("r2", "x"): wm}
    # tail epochs historize on top of the seeded open versions
    pipe.replay_bounded(feed.filter(F.col("lsn") > wm), epochs=1)
    hist = pipe.history.read()
    closed_a = hist.filter(
        (F.col("path") == "a") & (F.col("is_current") == 0)
    ).collect()
    assert len(closed_a) == 1 and closed_a[0]["valid_to_lsn"] == 4
    # bootstrap redelivery stays a no-op for the seeded side tables too
    n_before = pipe.history.read().count()
    pipe.bootstrap(snapshot, wm)
    assert pipe.history.read().count() == n_before


# --- historize_epoch equality guard ----------------------------------------

def test_historize_rejects_equal_lsn_delta(spark, tmp_path):
    hist = LakeTable(spark, str(tmp_path / "hist"))
    d1 = spark.createDataFrame(
        [(5, "I", None, "r", "p", "c1", "py", "v1")], FEED_SCHEMA
    )
    historize_epoch(hist, d1, ["repo", "path"], "lsn", ["content"], 0)
    # first delta LSN EQUAL to the open version's valid_from_lsn: the
    # old strict-< guard let this through as a zero-length version
    d2 = spark.createDataFrame(
        [(5, "U", None, "r", "p", "c2", "py", "v2")], FEED_SCHEMA
    )
    with pytest.raises(ValueError, match="replay contract"):
        historize_epoch(hist, d2, ["repo", "path"], "lsn", ["content"], 1)
