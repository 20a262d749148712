"""Gap filling + window frames (q_events_gapfill's plan on sparse data).

The driver tables are dense (every day×type cell has events), so the
zero-fill branch never fires there; this exercises it on a feed with
real holes and checks the moving-average frame across them.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_zero_fill_and_frame(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 5), "a"),
        (dt.datetime(2024, 1, 1, 9), "a"),
        (dt.datetime(2024, 1, 4, 1), "a"),  # days 2,3 missing for 'a'
        (dt.datetime(2024, 1, 2, 3), "b"),  # b missing on 1,3,4
    ]
    ev = spark.createDataFrame(rows, "ts timestamp_ntz, event_type string")
    days = ev.agg(
        F.date_trunc("DAY", F.min("ts")).alias("lo"),
        F.date_trunc("DAY", F.max("ts")).alias("hi"),
    ).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    scaffold = days.crossJoin(ev.select("event_type").distinct())
    counts = ev.groupBy(
        F.date_trunc("DAY", "ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    filled = scaffold.join(counts, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("n", F.lit(0)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    out = filled.withColumn(
        "ma3", F.sum("n_events").over(w) / F.count(F.lit(1)).over(w)
    )
    got = {
        (r.day.day, r.event_type): (r.n_events, r.ma3) for r in out.collect()
    }
    assert len(got) == 8  # 4 days × 2 types, gaps materialized
    assert got[(2, "a")][0] == 0 and got[(3, "a")][0] == 0
    assert got[(1, "a")] == (2, pytest.approx(2.0))       # frame of 1
    assert got[(3, "a")][1] == pytest.approx(2 / 3)        # (2+0+0)/3
    assert got[(4, "a")][1] == pytest.approx(1 / 3)        # (0+0+1)/3
    assert got[(4, "b")][1] == pytest.approx(1 / 3)        # b: (1+0+0)/3
