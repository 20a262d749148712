"""Round-3 ADVICE.md regression tests.

One test per advisor finding:
- asof_join_cogroup rejects right_cols colliding with left names
- pagerank conserves rank mass when edges reference out-of-graph dst ids
- OCC claim steal: a claim whose owner pid is dead no longer wedges the table
- apply_patches NULL-aware barriers: negative LSNs (incl. exactly -1) work
- multi-partition CSV read still yields physical line numbers
- ensure_bucketed re-registration checks path + sort spec
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.asof import asof_join_cogroup
from data_ingestion_resolution_platform_spark.operators.cdc import apply_patches
from data_ingestion_resolution_platform_spark.operators.graph import pagerank
from data_ingestion_resolution_platform_spark.sources.bucketed import ensure_bucketed
from data_ingestion_resolution_platform_spark.sources.feed import read_contacts_csv
from data_ingestion_resolution_platform_spark.sources.lake import (
    CommitConflict,
    _Versioned,
)


# --- asof collision rejection ----------------------------------------------

def test_asof_cogroup_rejects_colliding_right_cols(spark):
    left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, v string")
    right = spark.createDataFrame([(1, 5, "b")], "k long, rts long, v string")
    with pytest.raises(ValueError, match="collide"):
        asof_join_cogroup(left, right, on=["k"], left_ts="ts", right_ts="rts",
                          right_cols=["v"])


def test_asof_cogroup_same_ts_name_ok(spark):
    # right_ts sharing the LEFT timestamp's name is fine when not selected
    left = spark.createDataFrame([(1, 10), (1, 3)], "k long, ts long")
    right = spark.createDataFrame([(1, 5, "x"), (1, 9, "y")], "k long, ts long, rv string")
    out = asof_join_cogroup(left, right, on=["k"], left_ts="ts", right_ts="ts",
                            right_cols=["rv"])
    got = {r.ts: r.rv for r in out.collect()}
    assert got == {10: "y", 3: None}


# --- pagerank mass conservation with out-of-graph dst ------------------------

def test_pagerank_conserves_mass_with_unknown_dst(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    # dst=99 is absent from nodes: GraphX-style vertex derivation must
    # include it rather than leak its inflow
    edges = spark.createDataFrame([(1, 2), (2, 99)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(nodes, edges, iterations=4).collect()}
    assert set(got) == {1, 2, 99}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


# --- OCC claim steal ---------------------------------------------------------

def _write_claim(vers: _Versioned, v: int, pid: int, ts: float) -> str:
    path = vers._claim_path(v)
    with open(path, "w") as f:
        json.dump({"pid": pid, "ts": ts}, f)
    return path


def test_dead_owner_claim_is_stolen(tmp_path):
    vers = _Versioned(str(tmp_path / "t"))
    # find a pid that is certainly not running
    dead = 2 ** 22 - 7
    while True:
        try:
            os.kill(dead, 0)
            dead -= 1
        except ProcessLookupError:
            break
        except PermissionError:
            dead -= 1
    _write_claim(vers, 1, dead, ts=0.0)
    vers.claim(1)  # steals instead of raising
    with open(vers._claim_path(1)) as f:
        assert json.load(f)["pid"] == os.getpid()


def test_live_owner_claim_conflicts(tmp_path):
    import time

    vers = _Versioned(str(tmp_path / "t"))
    _write_claim(vers, 1, os.getpid(), ts=time.time())  # us: alive, fresh
    with pytest.raises(CommitConflict, match="live concurrent writer"):
        vers.claim(1)


def test_expired_claim_is_stolen_even_if_pid_alive(tmp_path):
    vers = _Versioned(str(tmp_path / "t"))
    _write_claim(vers, 1, os.getpid(), ts=0.0)  # alive owner, ancient claim
    vers.claim(1)


# --- apply_patches with negative LSNs ---------------------------------------

def test_patches_negative_lsns_and_minus_one_barrier(spark):
    rows = [
        # key 1: I at lsn=-5, D at lsn=-1 (the old sentinel!), U at lsn=0
        (1, -5, "I", "a", "x"),
        (1, -1, "D", None, None),
        (1, 0, "U", "b", None),
        # key 2: only a D at -1 — must be tombstoned, not resurrected
        (2, -1, "D", None, None),
        # key 3: I at -3 survives untouched
        (3, -3, "I", "c", "z"),
    ]
    df = spark.createDataFrame(rows, "k long, lsn long, op string, c1 string, c2 string")
    out = {r.k: r for r in apply_patches(df, ["k"], "lsn", ["c1", "c2"]).collect()}
    assert set(out) == {1, 3}
    # key 1: U-after-D builds over empty base — c1 set post-D, c2 wiped by D
    assert out[1].c1 == "b" and out[1].c2 is None and out[1].lsn == 0
    assert out[3].c1 == "c" and out[3].c2 == "z" and out[3].lsn == -3


# --- multi-partition CSV line numbers ----------------------------------------

def test_csv_line_numbers_multi_partition(spark, tmp_path):
    p = tmp_path / "contacts.csv"
    n = 500
    lines = ["email,first_name,last_name,company"]
    lines += [f"u{i}@ex.com,F{i},L{i},Co{i}" for i in range(n)]
    p.write_text("\n".join(lines) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        # assert the SCAN splits (the final df's partition count reflects
        # the numbering window's shuffle, which AQE may coalesce to 1)
        raw_parts = (
            spark.read.option("header", True).csv(str(p)).rdd.getNumPartitions()
        )
        assert raw_parts > 1, "test setup: want a split file"
        df = read_contacts_csv(spark, str(p))
        got = {r.email: r._row_number for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(got) == n
    for i in range(n):
        assert got[f"u{i}@ex.com"] == i + 2, f"row {i}"


# --- bucketed re-registration safety -----------------------------------------

def test_ensure_bucketed_detects_stale_path_and_sort(spark, tmp_path):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame([(3, "c"), (4, "d")], "k long, v string")
    t = "adv_bucket_t"
    p1, p2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    try:
        out1 = ensure_bucketed(spark, t, p1, ["k"], 2, lambda: df1)
        assert {r.k for r in out1.collect()} == {1, 2}
        # same table name, different path: must re-point, not reuse stale
        out2 = ensure_bucketed(spark, t, p2, ["k"], 2, lambda: df2)
        assert {r.k for r in out2.collect()} == {3, 4}
        # same path but different sort spec: spec mismatch → rewrite
        out3 = ensure_bucketed(spark, t, p2, ["k"], 2, lambda: df2, sort_cols=["k"])
        assert {r.k for r in out3.collect()} == {3, 4}
        spec = json.load(open(os.path.join(p2, "_BUCKET_SPEC.json")))
        assert spec["sort"] == ["k"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
