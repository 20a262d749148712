"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only cross-batch state is its DB tables (issue/status
rows persist between queue messages — SURVEY.md §2.9). For a streaming
engine, first-class keyed state replaces that: state lives in the
checkpoint, sharded by key across executors, and survives restarts.

``running_dedup_stream``: emit each natural key's row only the FIRST
time it is ever seen across the whole stream (cross-micro-batch exact
dedup — the streaming analogue of ``dedup_exact``). State per key is a
single marker (+ optional TTL via processing-time timeout), so state
size is O(distinct keys), not O(events). Arrow-batched per key group —
no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts_stream(
    stream: DataFrame,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream.

    Late rows within ``watermark`` update their window; older ones are
    dropped and the window state is finalized and evicted — bounded
    state for unbounded streams. LWW semantics downstream make a
    late-finalized window idempotent to re-merge (SURVEY.md §2.9: the
    engine's late-data answer is LSN ordering, not arrival ordering).
    """
    from pyspark.sql import functions as F

    w = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), *group_cols, "n_events")
    )


def session_counts_stream(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked streaming sessionization via native session windows.

    Sessions merge in the state store while open; once the watermark
    passes ``last_event + gap`` the session finalizes, is emitted
    (append mode), and its state is evicted — bounded state for
    unbounded streams. The batch twin is
    ``operators.sessions.session_window_agg`` (same gap-merge
    semantics; pinned by test)."""
    from pyspark.sql import functions as F

    w = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "15 minutes",
    watermark: str = "30 minutes",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join.

    Each left row joins right rows with equal ``keys`` whose timestamp
    falls in ``[left_ts - lookback, left_ts]`` (e.g. purchases joined to
    the clicks that preceded them). Both sides are watermarked and the
    join condition carries the time range, so Spark bounds the buffered
    state on each side and evicts rows once the watermark passes their
    join window — without the range condition a stream-stream join
    would buffer forever. Right columns are prefixed to avoid clashes;
    the right key copies are dropped after the join.

    ``how="left_outer"`` is the enrichment variant: a left row with no
    in-window right match is emitted with NULL right columns — but only
    once the watermark passes its join window (Spark must be sure no
    match can still arrive), so outer results trail the watermark.

    Batch twin for testing: the same condition as a plain join.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r} (inner|left_outer)")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(right_prefix + c) for c in rw.columns])
    cond = None
    for k in keys:
        e = F.col(k) == F.col(right_prefix + k)
        cond = e if cond is None else cond & e
    rts = F.col(right_prefix + right_ts)
    cond = (
        cond
        & (rts >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (rts <= F.col(left_ts))
    )
    return lw.join(rw, cond, how).drop(*[right_prefix + k for k in keys])


def running_dedup_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ttl_minutes: int | None = None,
) -> DataFrame:
    """First-seen filter over an unbounded keyed stream.

    Returns a stream with the input schema containing, per key, only
    rows of the micro-batch where the key was not seen before. With
    ``ttl_minutes`` the marker expires (sliding re-admission window) —
    unbounded key spaces then hold bounded state.
    """
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def first_seen(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # key already emitted in a previous batch: drop everything
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.head(1)
                break
        state.update((True,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if first is not None:
            yield first

    return stream.groupBy(*key_cols).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
