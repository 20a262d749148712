"""Incremental view maintenance: signed-delta aggregates from a
pre-image-bearing change feed (operators/ivm.py + snapshot_diff
include_preimages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.ivm import (
    delta_aggregate,
    maintain_aggregate,
    merge_delta,
)
from data_ingestion_resolution_platform_spark.sources.lake import (
    LakeTable,
    snapshot_diff,
)

SCHEMA = "repo string, path string, lang string, content string"

V1 = [
    ("r1", "a.py", "py", "aaaa"),      # stays unchanged
    ("r1", "b.py", "py", "bb"),        # content update, same group
    ("r1", "c.md", "md", "cc"),        # lang update: moves md -> py
    ("r2", "d.go", "go", "dddd"),      # deleted -> group (r2, go) vanishes
]
V2 = [
    ("r1", "a.py", "py", "aaaa"),
    ("r1", "b.py", "py", "bbbbbb"),
    ("r1", "c.md", "py", "cc"),
    ("r2", "e.rs", "rs", "eee"),       # insert -> new group (r2, rs)
]


def _snapshots(spark):
    return spark.createDataFrame(V1, SCHEMA), spark.createDataFrame(V2, SCHEMA)


def _direct_agg(df):
    return df.groupBy("repo", "lang").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.length("content")).cast("long").alias("total_bytes"),
    )


def _as_dict(df):
    return {
        (r.repo, r.lang): (r.n_rows, r.total_bytes) for r in df.collect()
    }


def test_preimage_changelog_shape(spark):
    before, after = _snapshots(spark)
    rows = snapshot_diff(
        before, after, ["repo", "path"], include_preimages=True
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.change_type, []).append((r.repo, r.path))
    # updates fan out to a preimage + postimage pair on the same key
    assert sorted(by_type["update_preimage"]) == sorted(by_type["update_postimage"])
    assert set(by_type["update_preimage"]) == {("r1", "b.py"), ("r1", "c.md")}
    assert by_type["insert"] == [("r2", "e.rs")]
    assert by_type["delete"] == [("r2", "d.go")]
    # unchanged key emits nothing
    assert ("r1", "a.py") not in {k for v in by_type.values() for k in v}
    # preimage carries the BEFORE values, postimage the AFTER values
    pre = {(r.repo, r.path): r.lang for r in rows if r.change_type == "update_preimage"}
    post = {(r.repo, r.path): r.lang for r in rows if r.change_type == "update_postimage"}
    assert pre[("r1", "c.md")] == "md" and post[("r1", "c.md")] == "py"


def test_merge_delta_equals_recompute(spark):
    before, after = _snapshots(spark)
    changes = snapshot_diff(before, after, ["repo", "path"], include_preimages=True)
    delta = delta_aggregate(
        changes, ["repo", "lang"], {"total_bytes": "length(content)"}
    )
    maintained = merge_delta(_direct_agg(before), delta, ["repo", "lang"])
    assert _as_dict(maintained) == _as_dict(_direct_agg(after))
    # the vanished group (r2, go) must be gone, not present with 0
    assert ("r2", "go") not in _as_dict(maintained)


def test_merge_delta_bootstrap_from_none(spark):
    before, after = _snapshots(spark)
    # bootstrapping: the "changes" are all inserts (diff vs empty)
    empty = before.limit(0)
    changes = snapshot_diff(empty, after, ["repo", "path"], include_preimages=True)
    delta = delta_aggregate(
        changes, ["repo", "lang"], {"total_bytes": "length(content)"}
    )
    assert _as_dict(merge_delta(None, delta, ["repo", "lang"])) == _as_dict(
        _direct_agg(after)
    )


def test_maintain_aggregate_lake_roundtrip(spark, tmp_path):
    before, after = _snapshots(spark)
    t = LakeTable(spark, str(tmp_path / "agg"))
    t.merge(_direct_agg(before), ["repo", "lang"], epoch_id="seed")
    changes = snapshot_diff(before, after, ["repo", "path"], include_preimages=True)
    maintain_aggregate(
        t,
        changes,
        ["repo", "lang"],
        {"total_bytes": "length(content)"},
        epoch_id="e2",
    )
    assert _as_dict(t.read()) == _as_dict(_direct_agg(after))
    # exactly-once: re-delivering the same epoch must not double-apply
    out = maintain_aggregate(
        t,
        changes,
        ["repo", "lang"],
        {"total_bytes": "length(content)"},
        epoch_id="e2",
    )
    assert out.get("skipped") is True
    assert _as_dict(t.read()) == _as_dict(_direct_agg(after))


def test_maintained_agg_tracks_many_epochs(spark, tmp_path):
    """Property-style: random-ish multi-epoch churn, maintained state
    equals recompute after EVERY epoch."""
    import random

    rnd = random.Random(7)
    langs = ["py", "md", "go"]
    state = {
        (f"r{i % 3}", f"f{i}.x"): (langs[i % 3], "x" * (i % 7 + 1)) for i in range(40)
    }

    def df_of(snap):
        rows = [(k[0], k[1], v[0], v[1]) for k, v in sorted(snap.items())]
        return spark.createDataFrame(rows, SCHEMA)

    t = LakeTable(spark, str(tmp_path / "agg2"))
    t.merge(_direct_agg(df_of(state)), ["repo", "lang"], epoch_id="seed")
    for epoch in range(3):
        nxt = dict(state)
        for k in list(nxt):
            roll = rnd.random()
            if roll < 0.2:
                del nxt[k]
            elif roll < 0.5:
                lang, content = nxt[k]
                nxt[k] = (rnd.choice(langs), content + "!")
        for i in range(5):
            nxt[(f"r{rnd.randrange(3)}", f"new{epoch}_{i}.x")] = (
                rnd.choice(langs),
                "y" * rnd.randrange(1, 9),
            )
        changes = snapshot_diff(
            df_of(state), df_of(nxt), ["repo", "path"], include_preimages=True
        )
        maintain_aggregate(
            t,
            changes,
            ["repo", "lang"],
            {"total_bytes": "length(content)"},
            epoch_id=f"e{epoch}",
        )
        assert _as_dict(t.read()) == _as_dict(_direct_agg(df_of(nxt))), f"epoch {epoch}"
        state = nxt


def test_pipeline_maintained_stats_tracks_target(spark, tmp_path):
    """CDCPipeline(maintain_stats=True): the per-repo metrics table
    stays equal to a direct aggregate of the target after every epoch,
    and redelivery of committed epochs changes nothing."""
    from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed
    from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

    feed = synth_change_feed(spark, n_events=4000, n_repos=12, seed=3, partitions=8)
    pipe = CDCPipeline(
        spark, feed_dir="unused", warehouse=str(tmp_path / "wh"), maintain_stats=True
    )

    def recompute():
        return _as_dict(
            pipe.target.read()
            .groupBy("repo")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.length("content")).cast("long").alias("total_bytes"),
            )
            .withColumnRenamed("repo", "lang")  # reuse _as_dict's (repo, lang) key
            .withColumn("repo", F.col("lang"))
        )

    def stats_dict():
        return _as_dict(
            pipe.stats.read()
            .select(
                "repo",
                F.col("repo").alias("lang"),
                F.col("n_paths").alias("n_rows"),
                "total_bytes",
            )
        )

    pipe.replay_bounded(feed, epochs=3)
    assert stats_dict() == recompute()
    # redelivery: both target and stats epochs are ledgered no-ops
    out = pipe.replay_bounded(feed, epochs=3)
    assert all(o.get("skipped") for o in out)
    assert stats_dict() == recompute()
