"""Partial-image CDC fold (operators/cdc.py::apply_patches)."""

from __future__ import annotations

from data_ingestion_resolution_platform_spark.operators.cdc import apply_patches

SCHEMA = "k long, lsn long, op string, a string, b long"


def _apply(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = apply_patches(df, ["k"], "lsn", ["a", "b"])
    return {r.k: (r.lsn, r.a, r.b) for r in out.collect()}


def test_patch_coalesces_last_non_null(spark):
    got = _apply(
        spark,
        [
            (1, 1, "I", "init", 10),
            (1, 2, "U", None, 20),    # patches b only
            (1, 3, "U", "newa", None),  # patches a only
        ],
    )
    assert got == {1: (3, "newa", 20)}


def test_insert_resets_explicit_null(spark):
    # U sets a, later I carries full image with a=NULL → a is NULL
    got = _apply(
        spark,
        [
            (1, 1, "I", "x", 1),
            (1, 2, "U", "patched", None),
            (1, 3, "I", None, 3),
        ],
    )
    assert got == {1: (3, None, 3)}


def test_delete_tombstones_and_recreate(spark):
    got = _apply(
        spark,
        [
            (1, 1, "I", "x", 1),
            (1, 2, "D", None, None),
            (2, 1, "I", "y", 2),
            (2, 2, "U", "y2", None),
            (2, 3, "D", None, None),
            (2, 4, "U", None, 99),  # U-after-D: partial row over empty base
        ],
    )
    assert 1 not in got
    assert got[2] == (4, None, 99)  # pre-delete 'y2' must NOT leak


def test_stale_delete_ignored(spark):
    # delete is not the last writer; later I wins
    got = _apply(
        spark,
        [
            (1, 1, "D", None, None),
            (1, 2, "I", "alive", 5),
            (1, 3, "U", None, 6),
        ],
    )
    assert got == {1: (3, "alive", 6)}


def test_single_shuffle_plan(spark):
    df = spark.createDataFrame([(1, 1, "I", "x", 1)], SCHEMA)
    out = apply_patches(df, ["k"], "lsn", ["a", "b"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one hash agg, no window
    assert "Window" not in plan
