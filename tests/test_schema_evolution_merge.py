"""Add-column schema evolution through the batch MERGE path (north-rule
schema-evolution case over the lake tables, not just the streaming
Arrow reconcile)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.sources.lake import (
    LakeTable,
    PartitionedLakeTable,
)

S1 = "repo string, path string, lsn long, content string"
S2 = "repo string, path string, lsn long, content string, branch string"


def test_laketable_merge_evolves_added_column(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame([("r1", "a", 1, "x"), ("r1", "b", 2, "y")], S1),
        ["repo", "path"],
        epoch_id=1,
    )
    t.merge(
        spark.createDataFrame([("r1", "b", 3, "y2", "main"), ("r2", "c", 4, "z", "dev")], S2),
        ["repo", "path"],
        epoch_id=2,
    )
    rows = {r.path: (r.lsn, r.content, r.branch) for r in t.read().collect()}
    assert rows == {
        "a": (1, "x", None),  # survivor: new column NULL-backfilled
        "b": (3, "y2", "main"),
        "c": (4, "z", "dev"),
    }


def test_laketable_merge_tolerates_dropped_feed_column(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame([("r1", "a", 1, "x", "main")], S2), ["repo", "path"], epoch_id=1
    )
    # evolved feed stops sending `branch`: updated rows carry NULL,
    # survivors keep their value, target schema keeps the column
    t.merge(
        spark.createDataFrame([("r1", "b", 2, "y")], S1), ["repo", "path"], epoch_id=2
    )
    rows = {r.path: (r.content, r.branch) for r in t.read().collect()}
    assert rows == {"a": ("x", "main"), "b": ("y", None)}


def test_partitioned_merge_evolves_and_untouched_buckets_read(spark, tmp_path):
    t = PartitionedLakeTable(
        spark, str(tmp_path / "p"), bucket_keys=["repo"], n_buckets=4
    )
    base = spark.createDataFrame(
        [(f"r{i}", f"p{i}", i, "c") for i in range(20)], S1
    )
    t.merge(base, ["repo", "path"], epoch_id=1)
    # epoch 2 touches ONE repo with the evolved schema; other buckets
    # keep old-schema files and must still read (mergeSchema union)
    t.merge(
        spark.createDataFrame([("r3", "p3", 100, "c2", "main")], S2),
        ["repo", "path"],
        epoch_id=2,
    )
    out = t.read()
    assert "branch" in out.columns
    rows = {r.path: (r.lsn, r.branch) for r in out.collect()}
    assert len(rows) == 20
    assert rows["p3"] == (100, "main")
    assert rows["p7"] == (7, None)
    # a later epoch on an old-schema bucket must not drop the column
    t.merge(
        spark.createDataFrame([("r7", "p7", 200, "c3")], S1),
        ["repo", "path"],
        epoch_id=3,
    )
    rows = {r.path: (r.lsn, r.branch) for r in t.read().collect()}
    assert rows["p3"] == (100, "main")
    assert rows["p7"] == (200, None)
