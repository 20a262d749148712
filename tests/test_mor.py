"""Merge-on-read lake table: COW-equivalence, tombstones, exactly-once,
compaction, schema evolution across deltas."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.cdc import resolve_latest
from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable, MorLakeTable


def _epochs(feed, n):
    hi = feed.agg(F.max("lsn")).collect()[0][0] + 1
    step = hi // n
    return [
        feed.filter((F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step if i < n - 1 else F.lit(True)))
        for i in range(n)
    ]


def _state(df):
    return {
        (r.repo, r.path): (r.lsn, r.content)
        for r in df.select("repo", "path", "lsn", "content").collect()
    }


def test_mor_equals_cow_across_epochs(spark, tmp_path):
    feed = synth_change_feed(spark, 4000, n_repos=10, seed=3)
    mor = MorLakeTable(spark, str(tmp_path / "mor"), keys=["repo", "path"], lsn_col="lsn")
    cow = LakeTable(spark, str(tmp_path / "cow"))
    for e, part in enumerate(_epochs(feed, 3), start=1):
        batch = resolve_latest(part, ["repo", "path"], "lsn")
        mor.merge(batch, epoch_id=e, delete_condition=F.col("op") == "D")
        cow.merge(batch, ["repo", "path"], epoch_id=e, delete_condition=F.col("op") == "D")
    assert _state(mor.read()) == _state(cow.read())
    assert mor.n_deltas() == 3  # never compacted: reads reconcile deltas


def test_mor_exactly_once_and_compaction(spark, tmp_path):
    feed = synth_change_feed(spark, 3000, n_repos=8, seed=9)
    mor = MorLakeTable(spark, str(tmp_path / "m"), keys=["repo", "path"], lsn_col="lsn")
    parts = _epochs(feed, 2)
    for e, part in enumerate(parts, start=1):
        batch = resolve_latest(part, ["repo", "path"], "lsn")
        mor.merge(batch, epoch_id=e, delete_condition=F.col("op") == "D")
    before = _state(mor.read())
    # redelivered epoch is a no-op
    dup = resolve_latest(parts[0], ["repo", "path"], "lsn")
    assert mor.merge(dup, epoch_id=1)["skipped"] is True
    assert _state(mor.read()) == before
    # compaction folds deltas, preserves state, clears the delta list
    stats = mor.compact()
    assert stats["retired_deltas"] == 2
    assert mor.n_deltas() == 0
    assert _state(mor.read()) == before
    # a later epoch after compaction still lands correctly
    extra = spark.createDataFrame(
        [(999_999, "U", None, "repo_0001", "zzz.py", "c", "py", "new")],
        "lsn long, op string, ts timestamp, repo string, path string, commit string, lang string, content string",
    )
    mor.merge(extra, epoch_id=3)
    after = _state(mor.read())
    assert after[("repo_0001", "zzz.py")] == (999_999, "new")
    assert len(after) == len(before) + 1


def test_mor_auto_compact_every(spark, tmp_path):
    feed = synth_change_feed(spark, 2000, n_repos=5, seed=4)
    mor = MorLakeTable(
        spark, str(tmp_path / "m"), keys=["repo", "path"], lsn_col="lsn", compact_every=2
    )
    for e, part in enumerate(_epochs(feed, 4), start=1):
        batch = resolve_latest(part, ["repo", "path"], "lsn")
        mor.merge(batch, epoch_id=e, delete_condition=F.col("op") == "D")
    assert mor.n_deltas() == 0  # compacted at epochs 2 and 4
    oneshot = resolve_latest(feed, ["repo", "path"], "lsn").filter(F.col("op") != "D")
    assert _state(mor.read()) == _state(oneshot)


def test_pipeline_mor_target_equals_cow_target(spark, tmp_path):
    from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

    feed = synth_change_feed(spark, 5000, n_repos=12, seed=17)
    cow = CDCPipeline(spark, feed_dir="unused", warehouse=str(tmp_path / "cow"))
    mor = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "mor"),
        target_mode="mor",
        compact_every=2,
    )
    cow.replay_bounded(feed, epochs=3)
    mor.replay_bounded(feed, epochs=3)
    a, b = cow.target.read(), mor.target.read()
    cols = sorted(set(a.columns) & set(b.columns))
    assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0


def test_mor_schema_evolution_across_deltas(spark, tmp_path):
    mor = MorLakeTable(spark, str(tmp_path / "m"), keys=["k"], lsn_col="lsn")
    mor.merge(spark.createDataFrame([("a", 1, "x")], "k string, lsn long, v string"), epoch_id=1)
    mor.merge(
        spark.createDataFrame([("b", 2, "y", "main")], "k string, lsn long, v string, branch string"),
        epoch_id=2,
    )
    rows = {r.k: (r.v, r.branch) for r in mor.read().collect()}
    assert rows == {"a": ("x", None), "b": ("y", "main")}
    # evolution survives compaction
    mor.compact()
    rows = {r.k: (r.v, r.branch) for r in mor.read().collect()}
    assert rows == {"a": ("x", None), "b": ("y", "main")}
