"""Bounded conflict-candidate aggregation (the reference's A3 memory
hazard, `backend/worker.py:382-390`, done right).

Invariants:
- the two-phase salted plan equals the naive single-phase
  slice(sort_array(collect_list)) plan on arbitrary inputs,
- a synthetic hot key (one key holding most of the batch, skewed feed)
  completes and yields exactly the global top-k by (lsn, tie),
- `resolve_and_detect` output (winners + conflicts) is unchanged vs the
  separate resolve_latest/detect_conflicts plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.functions import content_sha256
from data_ingestion_resolution_platform_spark.operators.cdc import (
    bounded_candidates,
    detect_conflicts,
    resolve_and_detect,
    resolve_latest,
)
from data_ingestion_resolution_platform_spark.sources.feed import synth_change_feed


def _single_phase_reference(df, keys, lsn_col, candidate_cols, k):
    """The plan being replaced — correct but reducer-unbounded."""
    cand = F.struct(F.col(lsn_col).alias("lsn"), *[F.col(c) for c in candidate_cols])
    return df.groupBy(*keys).agg(
        F.slice(F.sort_array(F.collect_list(cand), asc=False), 1, k).alias("candidates")
    )


def _norm(rows):
    return sorted(
        (tuple(r[:-1]) + (tuple(map(tuple, r[-1])),)) for r in map(tuple, rows)
    )


def test_two_phase_equals_single_phase(spark):
    feed = synth_change_feed(spark, 3000, n_repos=5, paths_per_repo=3, skew=4.0, seed=3)
    keys = ["repo", "path"]
    got = bounded_candidates(
        feed, keys, "lsn", candidate_cols=["commit", "lang"], max_candidates=7, n_salt=8
    )
    want = _single_phase_reference(feed, keys, "lsn", ["commit", "lang"], 7)
    assert _norm(got.collect()) == _norm(want.collect())


def test_hot_key_exact_topk(spark):
    # one key receives 20k events — with n_salt=8 no reducer in phase 2
    # holds more than 8*5 candidate rows for it; result must still be
    # the exact global top-5 by lsn desc
    n = 20_000
    df = spark.range(n).select(
        F.lit("hot").alias("repo"),
        F.lit("a.py").alias("path"),
        F.col("id").alias("lsn"),
        F.concat(F.lit("c"), F.col("id")).alias("commit"),
    )
    out = bounded_candidates(
        df, ["repo", "path"], "lsn", candidate_cols=["commit"], max_candidates=5, n_salt=8
    ).collect()
    assert len(out) == 1
    lsns = [c["lsn"] for c in out[0]["candidates"]]
    assert lsns == [n - 1, n - 2, n - 3, n - 4, n - 5]


def test_fused_matches_separate_plans(spark):
    feed = synth_change_feed(spark, 2000, n_repos=8, paths_per_repo=4, skew=3.0, seed=11)
    keys = ["repo", "path"]
    sig = F.struct(F.col("lang"), content_sha256(F.col("content")).alias("sha"))
    fused = resolve_and_detect(
        feed, keys, sig, "lsn", candidate_cols=["commit", "lang"],
        max_candidates=6, wide_cols=["content"],
    )
    try:
        got_w = sorted(map(tuple, fused.winners.collect()))
        got_c = _norm(fused.conflicts.collect())
    finally:
        fused.unpersist()
    want_w = sorted(map(tuple, resolve_latest(feed, keys, "lsn").collect()))
    want_c = _norm(
        detect_conflicts(
            feed, keys, sig, "lsn", candidate_cols=["commit", "lang"], max_candidates=6
        ).collect()
    )
    assert got_w == want_w
    assert got_c == want_c


def test_fused_wide_path_dedupes_duplicate_deliveries(spark):
    # duplicate delivery of the winning (key, lsn) row must collapse to
    # ONE winner row (merge()'s key-unique precondition)
    rows = [
        (1, "r1", "a.py", "c1", "py", "v1"),
        (2, "r1", "a.py", "c2", "py", "v2"),
        (2, "r1", "a.py", "c2", "py", "v2"),  # redelivered winner
    ]
    df = spark.createDataFrame(
        rows, "lsn long, repo string, path string, commit string, lang string, content string"
    )
    sig = F.struct(F.col("lang"), content_sha256(F.col("content")).alias("sha"))
    fused = resolve_and_detect(
        df, ["repo", "path"], sig, "lsn", candidate_cols=["commit"],
        wide_cols=["content"],
    )
    try:
        winners = fused.winners.collect()
    finally:
        fused.unpersist()
    assert len(winners) == 1
    assert winners[0]["lsn"] == 2 and winners[0]["content"] == "v2"
