"""Stream-stream interval join: watermark-bounded state and late-data
dropping under controlled arrival order (the part the driver gate's
deterministic huge-watermark configuration cannot exercise —
plans/queries.q_stream_stream_join)."""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import functions as F

SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"

T = datetime  # noqa: N816 - terse fixture timestamps


def _write(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)
    time.sleep(1.1)  # distinct mtimes => deterministic micro-batch order


def _stream(spark, d, prefix):
    s = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select(
            F.col("event_id").alias(f"{prefix}_event_id"),
            F.col("user_id").alias(f"{prefix}_user_id"),
            F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
        )
    )
    return s.withWatermark(f"{prefix}_ts", "10 minutes")


def test_interval_join_drops_late_click_and_bounds_state(spark, tmp_path):
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    os.makedirs(pdir), os.makedirs(cdir)
    # batch 1: P1 10:00 + C1 09:30 -> pair; watermark -> 09:20
    _write(spark, pdir, [(1, 1, "purchase", T(2026, 1, 1, 10, 0))])
    _write(spark, cdir, [(10, 1, "click", T(2026, 1, 1, 9, 30))])
    # batch 2: next-day traffic advances the watermark to Jan2 09:45
    _write(spark, pdir, [(2, 2, "purchase", T(2026, 1, 2, 10, 0))])
    _write(spark, cdir, [(11, 2, "click", T(2026, 1, 2, 9, 55))])
    # batch 3: unmatched padding traffic — state eviction runs at batch
    # END with a one-batch-lagged watermark, so this batch is what
    # flushes P1 (p_ts Jan1 10:00 < watermark Jan2 09:45) out of state
    _write(spark, cdir, [(13, 3, "click", T(2026, 1, 2, 9, 56))])
    # batch 4: C2 is a DAY-late click for P1 — behind the watermark,
    # must be dropped, even though the batch join would pair it
    _write(spark, cdir, [(12, 1, "click", T(2026, 1, 1, 9, 40))])

    p, c = _stream(spark, pdir, "p"), _stream(spark, cdir, "c")
    joined = p.join(
        c,
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("p_event_id", "c_event_id")
    ckpt = str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_late")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table("ssj_late").collect())
    assert got == [(1, 10), (2, 11)]  # (1, 12) dropped: late beyond watermark

    # the unwatermarked batch join DOES pair the late click — proving
    # the stream result reflects eviction, not absence of a match
    allp = spark.read.parquet(pdir)
    allc = spark.read.parquet(cdir)
    batch = allp.alias("p").join(
        allc.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c.ts") <= F.col("p.ts")),
    )
    assert batch.count() == 3


def test_outer_interval_join_emits_null_match_on_expiry(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unmatched purchase is emitted
    with a NULL click only once the watermark proves no matching click
    can still arrive — the outer row is a statement about the future,
    so it must wait for state expiry."""
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    os.makedirs(pdir), os.makedirs(cdir)
    # batch 1: a purchase with no click anywhere near it
    _write(spark, pdir, [(1, 1, "purchase", T(2026, 1, 1, 10, 0))])
    _write(spark, cdir, [(10, 9, "click", T(2026, 1, 1, 10, 0))])
    # batch 2: far-future traffic pushes the watermark past P1's window
    _write(spark, pdir, [(2, 2, "purchase", T(2026, 1, 3, 10, 0))])
    _write(spark, cdir, [(11, 2, "click", T(2026, 1, 3, 9, 55))])
    # batch 3: padding so the (one-batch-lagged) expiry actually runs
    _write(spark, cdir, [(12, 8, "click", T(2026, 1, 3, 9, 58))])

    p, c = _stream(spark, pdir, "p"), _stream(spark, cdir, "c")
    joined = p.join(
        c,
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("p_event_id", "c_event_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r) for r in spark.table("ssj_outer").collect()
    )
    assert (2, 11) in got  # the matched pair
    assert (1, None) in got  # the expired unmatched purchase, null-joined
