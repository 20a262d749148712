"""Tests: interval (range) join strategies and exact rank percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.ranges import interval_join
from data_ingestion_resolution_platform_spark.operators.stats import group_percentiles


def _bands(spark):
    return spark.createDataFrame(
        [(1, "low", 0.0, 150.0), (2, "mid", 100.0, 300.0), (3, "high", 250.0, 500.0)],
        "band_id long, band string, lo double, hi double",
    )


def _points(spark):
    rows = [(i, v) for i, v in enumerate(
        [0.0, 99.9, 100.0, 149.9, 150.0, 250.0, 299.9, 300.0, 499.9, 500.0, None]
    )]
    return spark.createDataFrame(rows, "pid long, value double")


def test_interval_join_half_open_bounds(spark):
    got = interval_join(_points(spark), _bands(spark), "value", "lo", "hi")
    pairs = {(r.pid, r.band_id) for r in got.collect()}
    assert pairs == {
        (0, 1), (1, 1), (2, 1), (3, 1),       # [0,150): 0.0, 99.9, 100.0, 149.9
        (2, 2), (3, 2), (4, 2), (5, 2), (6, 2),  # [100,300): 100.0..299.9
        (5, 3), (6, 3), (7, 3), (8, 3),       # [250,500): 250.0..499.9
    }
    # 150.0 not in band 1 (hi exclusive), 500.0 and NULL match nothing


def test_interval_join_bucketed_equals_broadcast(spark):
    pts = _points(spark)
    bands = _bands(spark)
    bcast = interval_join(pts, bands, "value", "lo", "hi")
    for width in (10.0, 50.0, 1000.0):  # spans >1, ~1, <1 bucket per interval
        bucketed = interval_join(pts, bands, "value", "lo", "hi", bucket_width=width)
        assert bucketed.exceptAll(bcast).count() == 0
        assert bcast.exceptAll(bucketed).count() == 0


def test_group_percentiles_nearest_rank(spark):
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
        + [("b", 0, 7.0)],
        "g string, id long, v double",
    )
    got = {
        r.g: r
        for r in group_percentiles(
            df, ["g"], "v", [0.25, 0.5, 0.75, 0.95], tie_cols=["id"]
        ).collect()
    }
    a = got["a"]
    # n=4: k = ceil(4p) -> 1, 2, 3, 4
    assert (a.n_rows, a.p25, a.p50, a.p75, a.p95) == (4, 10.0, 20.0, 30.0, 40.0)
    b = got["b"]  # singleton: every percentile is the one value
    assert (b.n_rows, b.p25, b.p95) == (1, 7.0, 7.0)


def test_group_percentiles_ties_deterministic(spark):
    # repeated values: rank selection must stay deterministic via tie col
    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(10)], "g string, id long, v double"
    )
    row = group_percentiles(df, ["g"], "v", [0.5], tie_cols=["id"]).collect()[0]
    assert (row.n_rows, row.p50) == (10, 5.0)


def test_percentile_approx_is_the_scale_path(spark):
    """The sketch alternative group_percentiles' docstring points to:
    percentile_approx (mergeable partials, no per-group sort) stays
    within its accuracy bound of the exact nearest-rank answer."""
    import random

    rnd = random.Random(7)
    rows = [("g", i, float(rnd.lognormvariate(0, 1))) for i in range(20_000)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    exact = group_percentiles(df, ["g"], "v", [0.5, 0.95], tie_cols=["id"]).first()
    approx = df.groupBy("g").agg(
        F.percentile_approx("v", [0.5, 0.95], 10_000).alias("ap")
    ).first()["ap"]
    vals = sorted(r[2] for r in rows)
    # accuracy=10000 => rank error <= n/accuracy = 2 ranks
    for got, p in zip(approx, (0.5, 0.95)):
        k = max(1, -(-len(vals) * p // 1))
        lo = vals[max(0, int(k) - 1 - 4)]
        hi = vals[min(len(vals) - 1, int(k) - 1 + 4)]
        assert lo <= got <= hi
    assert abs(approx[0] - exact.p50) <= (exact.p50 * 0.01 + 1e-9)
