"""CDCPipeline(maintain_quantiles=True): the per-repo uniform bottom-k
row sample (maintain_topk ascending on the portable full-key hash) stays
equal to a direct bottom-k recompute over the live target after every
feed epoch — across inserts, updates that rewrite a sampled row's value,
and deletes that evict a sampled key (forcing the (k+1)-st-hash
back-fill) — exactly-once under redelivery, and across a snapshot
bootstrap.  This is the contract that lifts sketch.maintain_qsample's
insert-only restriction: the maintained sample is of the CURRENT table,
not of the append history."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.sketch import kmv_hash
from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed
from data_ingestion_resolution_platform_spark.streaming.pipeline import CDCPipeline

K = 4


def _recompute(pipe, k=K):
    w = Window.partitionBy("repo").orderBy(F.col("qs_h").asc(), "path")
    return (
        pipe.target.read()
        .select(
            "repo",
            "path",
            kmv_hash(F.concat_ws("\x1f", F.col("repo"), F.col("path"))).alias("qs_h"),
            F.length("content").cast("long").alias("qs_val"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _as_set(df):
    return {(r.repo, r.path, r.qs_h, r.qs_val) for r in df.collect()}


def test_quantile_sample_tracks_recompute_across_epochs(spark, tmp_path):
    feed = synth_change_feed(spark, n_events=3000, n_repos=10, seed=13, partitions=8)
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_quantiles=True,
        quantile_k=K,
    )
    thr = feed.agg(F.max("lsn")).collect()[0][0] // 2
    pipe.replay_bounded(feed.filter(F.col("lsn") <= thr), epochs=1)
    assert _as_set(pipe.qsample.read()) == _as_set(_recompute(pipe))
    # second epoch carries updates AND deletes over the first's state:
    # a deleted sampled key must be replaced by the unstored next-smallest
    # hash (dirty-group back-fill), a rewritten sampled row must show its
    # NEW value, and a new key with a larger hash must NOT enter
    pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
    assert _as_set(pipe.qsample.read()) == _as_set(_recompute(pipe))
    # sample invariant: never more than k rows per group
    counts = pipe.qsample.read().groupBy("repo").count().collect()
    assert all(r["count"] <= K for r in counts)
    # redelivering a committed epoch is a no-op on the sample too
    before = _as_set(pipe.qsample.read())
    pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
    assert _as_set(pipe.qsample.read()) == before


def test_quantile_sample_bootstrap_handoff(spark, tmp_path):
    feed = synth_change_feed(spark, n_events=2000, n_repos=8, seed=17, partitions=8)
    thr = feed.agg(F.max("lsn")).collect()[0][0] // 2
    ref = CDCPipeline(spark, feed_dir="unused", warehouse=str(tmp_path / "ref"))
    ref.replay_bounded(feed.filter(F.col("lsn") <= thr), epochs=1)
    snapshot = ref.target.read().select("repo", "path", "commit", "lang", "content")
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_quantiles=True,
        quantile_k=K,
    )
    pipe.bootstrap(snapshot, watermark_lsn=thr)
    assert _as_set(pipe.qsample.read()) == _as_set(_recompute(pipe))
    # tail strictly after the watermark: maintained state must converge
    pipe.replay_bounded(feed.filter(F.col("lsn") > thr), epochs=1, epoch_offset=1)
    assert _as_set(pipe.qsample.read()) == _as_set(_recompute(pipe))


def test_quantile_readout_is_order_statistic(spark, tmp_path):
    """The read model: per-group quantiles off the sample are plain
    order statistics of qs_val — integer index arithmetic, no UDF."""
    feed = synth_change_feed(spark, n_events=1500, n_repos=6, seed=19, partitions=8)
    pipe = CDCPipeline(
        spark,
        feed_dir="unused",
        warehouse=str(tmp_path / "wh"),
        maintain_quantiles=True,
        quantile_k=K,
    )
    pipe.replay_bounded(feed, epochs=2)
    got = (
        pipe.qsample.read()
        .groupBy("repo")
        .agg(F.sort_array(F.collect_list("qs_val")).alias("vals"))
        .select(
            "repo",
            F.expr(
                "element_at(vals, greatest(1, cast((size(vals) + 1) div 2 as int)))"
            ).alias("p50"),
        )
    )
    for row in got.collect():
        assert row.p50 is not None
