"""Cogrouped-pandas as-of ≡ window-plan as-of (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from data_ingestion_resolution_platform_spark.operators.asof import (
    asof_join,
    asof_join_cogroup,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m) if m is not None else None


def test_cogroup_matches_window_plan(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),
            (2, 1, _ts(5)),   # before any right row → unmatched
            (3, 2, _ts(30)),
            (4, 3, _ts(12)),  # key with no right rows at all
            (5, 1, None),     # NULL ts → passthrough unmatched
            (6, 2, _ts(40)),
        ],
        "l_id long, k long, l_ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (101, 1, _ts(8)),
            (102, 1, _ts(10)),  # equal ts matches (>=)
            (103, 2, _ts(25)),
            (104, 2, None),     # NULL right ts must never match
            (105, 4, _ts(1)),   # right-only key
        ],
        "r_id long, k long, r_ts timestamp_ntz",
    )
    kw = dict(on=["k"], left_ts="l_ts", right_ts="r_ts", right_cols=["r_id", "r_ts"])
    a = asof_join(left, right, **kw)
    b = asof_join_cogroup(left, right, **kw)
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    ra = sorted(tuple(str(x) for x in r) for r in a.select(*cols).collect())
    rb = sorted(tuple(str(x) for x in r) for r in b.select(*cols).collect())
    assert ra == rb
    got = {r.l_id: r.r_id for r in b.collect()}
    assert got == {1: 102, 2: None, 3: 103, 4: None, 5: None, 6: 103}
