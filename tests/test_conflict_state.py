"""MERGE-keyed conflict state: open/refresh/don't-reopen/resolution-wins."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.cdc import merge_conflict_state
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

DET = "k string, n_signatures long, n_rows long"


def _det(spark, rows):
    return spark.createDataFrame(rows, DET)


def _res(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "k string")


def _state(t):
    return {
        r.k: (r.status, r.epoch, r.n_signatures) for r in t.read().collect()
    }


def test_conflict_state_machine(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "cs"))
    # e1: A and B open
    merge_conflict_state(t, _det(spark, [("A", 2, 10), ("B", 3, 7)]), None, ["k"], 1, 1)
    assert _state(t) == {"A": ("OPEN", 1, 2), "B": ("OPEN", 1, 3)}
    # e2: A resolved AND re-detected in the same epoch (resolution wins);
    # B re-detected (payload refresh); C newly detected
    merge_conflict_state(
        t,
        _det(spark, [("A", 4, 20), ("B", 2, 9), ("C", 2, 3)]),
        _res(spark, ["A"]),
        ["k"],
        2,
        2,
    )
    assert _state(t) == {
        "A": ("RESOLVED", 2, None),
        "B": ("OPEN", 2, 2),
        "C": ("OPEN", 2, 2),
    }
    # e3: A re-detected -> must NOT reopen; C untouched keeps its row
    merge_conflict_state(t, _det(spark, [("A", 5, 30)]), None, ["k"], 3, 3)
    assert _state(t) == {
        "A": ("RESOLVED", 2, None),
        "B": ("OPEN", 2, 2),
        "C": ("OPEN", 2, 2),
    }
    # redelivered epoch 3 is a ledgered no-op
    out = merge_conflict_state(t, _det(spark, [("B", 9, 99)]), None, ["k"], 3, 3)
    assert out.get("skipped") is True
    assert _state(t)["B"] == ("OPEN", 2, 2)
    # the open view is a plain filter of current state
    open_keys = {
        r.k for r in t.read().filter(F.col("status") == "OPEN").collect()
    }
    assert open_keys == {"B", "C"}
