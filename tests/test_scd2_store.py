"""Scd2HistoryStore: closed-append + open-snapshot split must be
result-invisible vs a plain LakeTable history, with flat-cost reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.scd import (
    Scd2HistoryStore,
    historize_epoch,
    scd2_history,
)
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

COLS = ["key", "lsn", "op", "attr"]


def _rows():
    return [
        ("a", 1, "I", "x"), ("a", 3, "U", "y"), ("b", 2, "I", "p"),
        ("c", 4, "I", "q"), ("b", 5, "D", None), ("a", 6, "U", "y"),
        ("b", 7, "I", "r"), ("c", 8, "U", "s"), ("a", 9, "D", None),
    ]


def _epochs(spark):
    feed = spark.createDataFrame(_rows(), COLS)
    return feed, [
        feed.filter(F.col("lsn") <= 3),
        feed.filter((F.col("lsn") > 3) & (F.col("lsn") <= 6)),
        feed.filter(F.col("lsn") > 6),
    ]


def test_store_equals_plain_laketable_history(spark, tmp_path):
    feed, slices = _epochs(spark)
    plain = LakeTable(spark, str(tmp_path / "plain"))
    store = Scd2HistoryStore(spark, str(tmp_path / "store"), ["key"])
    for i, sl in enumerate(slices):
        historize_epoch(plain, sl, ["key"], "lsn", ["attr"], i)
        historize_epoch(store, sl, ["key"], "lsn", ["attr"], i)
    cols = ["key", "attr", "valid_from_lsn", "valid_to_lsn", "is_current"]
    a = sorted(map(tuple, plain.read().select(*cols).collect()))
    b = sorted(map(tuple, store.read().select(*cols).collect()))
    one_shot = sorted(
        map(tuple, scd2_history(feed, ["key"], "lsn", ["attr"]).select(*cols).collect())
    )
    assert a == b == one_shot


def test_store_open_versions_is_exactly_the_current_set(spark, tmp_path):
    _, slices = _epochs(spark)
    store = Scd2HistoryStore(spark, str(tmp_path / "s"), ["key"])
    for i, sl in enumerate(slices):
        historize_epoch(store, sl, ["key"], "lsn", ["attr"], i)
    opn = store.open_versions().collect()
    # a tombstoned at 9 -> no open; b reinserted at 7; c updated at 8
    assert {(r["key"], r["attr"]) for r in opn} == {("b", "r"), ("c", "s")}
    assert all(r["is_current"] == 1 and r["valid_to_lsn"] is None for r in opn)
    # and the open snapshot never contains closed rows (the pruning
    # claim: epoch reads scale with this set, not with history)
    full = store.read()
    assert full.filter(F.col("is_current") == 1).count() == len(opn)
    # a: x[1,3) y[3,9); b: p[2,5) r[7,∞); c: q[4,8) s[8,∞) = 6 versions
    assert full.count() == 6


def test_store_epoch_redelivery_skips(spark, tmp_path):
    _, slices = _epochs(spark)
    store = Scd2HistoryStore(spark, str(tmp_path / "s"), ["key"])
    for i, sl in enumerate(slices):
        historize_epoch(store, sl, ["key"], "lsn", ["attr"], i)
    before = sorted(map(tuple, store.read().collect()))
    assert historize_epoch(store, slices[1], ["key"], "lsn", ["attr"], 1)["skipped"]
    assert sorted(map(tuple, store.read().collect())) == before


def test_store_closed_versions_are_append_only(spark, tmp_path):
    """No epoch may rewrite the closed table: version subdirs only ever
    gain new epoch directories."""
    import os

    _, slices = _epochs(spark)
    store = Scd2HistoryStore(spark, str(tmp_path / "s"), ["key"])
    seen: dict[str, float] = {}
    for i, sl in enumerate(slices):
        historize_epoch(store, sl, ["key"], "lsn", ["attr"], i)
        data = os.path.join(str(tmp_path / "s"), "closed", "data")
        if os.path.isdir(data):
            for sub in os.listdir(data):
                p = os.path.join(data, sub)
                m = max(
                    (os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)),
                    default=0.0,
                )
                if sub in seen:
                    assert m == seen[sub], f"closed epoch {sub} was rewritten"
                seen[sub] = m
    assert seen  # at least one closed epoch materialized


def test_store_all_open_first_epoch_then_read(spark, tmp_path):
    # first epoch with only inserts: no closed rows at all — read()
    # must work from the open snapshot alone
    store = Scd2HistoryStore(spark, str(tmp_path / "s"), ["key"])
    d = spark.createDataFrame([("a", 1, "I", "x"), ("b", 2, "I", "y")], COLS)
    historize_epoch(store, d, ["key"], "lsn", ["attr"], 0)
    assert store.read().count() == 2
    assert store.open_versions().count() == 2
