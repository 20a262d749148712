"""CDCPipeline(maintain_freq=True): the count-min cells stay exactly
equal to a sketch rebuild over the target after every feed epoch
(deletes and updates included — CM counters are additive), exactly-once
under redelivery, and across a snapshot bootstrap."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.sketch import cms_cells
from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed
from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

DW = dict(depth=4, width=32)


def _rebuild(pipe):
    return cms_cells(pipe.target.read(), F.col("lang"), **DW)


def _as_set(df):
    return {(r.d, r.bucket, r.cnt) for r in df.collect()}


def test_freq_sketch_tracks_rebuild_across_epochs(spark, tmp_path):
    feed = synth_change_feed(spark, n_events=3000, n_repos=10, seed=7, partitions=8)
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_freq=True,
        freq_width=32,
    )
    thr = feed.agg(F.max("lsn")).collect()[0][0] // 2
    pipe.replay_bounded(feed.filter(F.col("lsn") <= thr), epochs=1)
    assert _as_set(pipe.freq.read()) == _as_set(_rebuild(pipe))
    # second epoch carries updates AND deletes over the first's state —
    # signed deltas must decrement exactly
    pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
    assert _as_set(pipe.freq.read()) == _as_set(_rebuild(pipe))
    # bounded state: never more than depth*width cells
    assert pipe.freq.read().count() <= 4 * 32
    # redelivering a committed epoch is a no-op on the sketch too
    before = _as_set(pipe.freq.read())
    pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
    assert _as_set(pipe.freq.read()) == before


def test_freq_sketch_bootstrap_handoff(spark, tmp_path):
    feed = synth_change_feed(spark, n_events=2000, n_repos=8, seed=11, partitions=8)
    thr = feed.agg(F.max("lsn")).collect()[0][0] // 2
    ref = CDCPipeline(spark, feed_dir="unused", warehouse=str(tmp_path / "ref"))
    ref.replay_bounded(feed.filter(F.col("lsn") <= thr), epochs=1)
    snapshot = ref.target.read().select("repo", "path", "commit", "lang", "content")
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_freq=True,
        freq_width=32,
    )
    pipe.bootstrap(snapshot, watermark_lsn=thr)
    # seeded cells == rebuild over the snapshot-seeded target (an
    # unseeded sketch would go negative on the next epoch's pre-images)
    assert _as_set(pipe.freq.read()) == _as_set(_rebuild(pipe))
    pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
    assert _as_set(pipe.freq.read()) == _as_set(_rebuild(pipe))


def test_freq_sketch_converges_when_target_merge_crashes(spark, tmp_path, monkeypatch):
    """The pre-merge / own-ledger ordering contract: if the freq MERGE
    commits but the TARGET merge then crashes, redelivering the epoch
    must skip the already-committed freq epoch (no double-subtract of
    pre-images) and still land the target — final state of both tables
    identical to the no-crash run."""
    feed = synth_change_feed(spark, n_events=1500, n_repos=6, seed=3, partitions=4)
    thr = feed.agg(F.max("lsn")).collect()[0][0] // 2
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_freq=True,
        freq_width=32,
    )
    pipe.replay_bounded(feed.filter(F.col("lsn") <= thr), epochs=1)

    # crash the target merge AFTER the freq maintainer has committed
    real_merge = type(pipe.target).merge

    def boom(self, *a, **k):
        raise RuntimeError("injected target-merge crash")

    monkeypatch.setattr(type(pipe.target), "merge", boom)
    try:
        pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
        raise AssertionError("expected the injected crash to propagate")
    except RuntimeError as e:
        assert "injected" in str(e)
    finally:
        monkeypatch.setattr(type(pipe.target), "merge", real_merge)

    # freq epoch committed during the crashed attempt; redelivery must
    # converge, not double-apply
    pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
    assert _as_set(pipe.freq.read()) == _as_set(_rebuild(pipe))
