"""Sessionization + time-bucket aggregation — stream-analytics operators
beyond the reference's inventory (SURVEY.md §2.6 notes it has none),
added as first-class training-pipeline components.

Both are pure compositions of built-in DataFrame ops (window lag +
cumulative sum; ``F.window`` tumbling buckets) — no UDFs, fully
whole-stage-codegen, one shuffle each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_double(df: DataFrame, col: str) -> Column:
    """Seconds-since-epoch as double, tolerant of TIMESTAMP_NTZ (which
    cannot cast straight to double) and of numeric time columns."""
    dt = dict(df.dtypes).get(col, "")
    c = F.col(col)
    if "timestamp" in dt:
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign gap-based session ids per key.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_seconds``. Classic lag + cumulative-sum plan: one
    shuffle+sort per key, then two windowed passes over the sorted
    partitions (no extra shuffle — same partitioning).

    Output: input columns + ``session_seq`` (1-based per key).
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    ep = _epoch_double(df, ts_col)
    prev = F.lag(ep).over(w)
    is_new = (prev.isNull() | ((ep - prev) > gap_seconds)).cast("long")
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """One row per (key, session): start/end/duration/event count."""
    s = sessionize(df, key_cols, ts_col, gap_seconds)
    ep = _epoch_double(s, ts_col)
    # duration as BIGINT whole seconds (floor): representation-robust
    # across engines — DuckDB epoch() returns BIGINT or DOUBLE depending
    # on version, and "1800" vs "1800.0" hash differently downstream.
    return s.groupBy(*key_cols, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.floor(F.max(ep) - F.min(ep)).cast("long").alias("duration_secs"),
        F.count(F.lit(1)).alias("n_events"),
    )


def session_window_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Spark-native session windows (``F.session_window``) — the same
    gap-merge semantics as :func:`sessionize` but expressed with the
    built-in operator, which also works under Structured Streaming with
    a watermark (state-store-merged sessions, no window function).

    Output: keys..., w_start, w_end (= last event + gap), n_events.
    In batch mode this equals the lag+cumsum plan with
    ``session_end + gap`` as the window end.
    """
    w = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        df.groupBy(w.alias("w"), *[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Tumbling-window counts per (bucket, group): ``F.window`` buckets,
    start exposed as ``w_start`` so oracles can reproduce it with
    epoch-floor arithmetic."""
    w = F.window(F.col(ts_col), f"{width_seconds} seconds")
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), *group_cols, "n_events")
    )
