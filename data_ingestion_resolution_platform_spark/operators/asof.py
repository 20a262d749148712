"""As-of (temporal) join — a training-pipeline operator the reference
lacks (its only join shapes are equi/semi/point, SURVEY.md §2.4), added
per the engine brief as a first-class component.

``asof_join`` matches each left row to the most recent right row of the
same key with ``right_ts <= left_ts`` (backward direction; ``forward``
symmetric). Implemented Spark-first as a **union + ordered window**, the
scalable plan:

1. tag left/right rows, union them on (key, ts, side),
2. one shuffle+sort per key (``Window.partitionBy(keys).orderBy(ts,
   side, order)``),
3. ``last(right_payload, ignorenulls=True)`` carries the latest right
   row forward to each left row.

Cost is one shuffle of |L|+|R| rows — never a cross/theta join, no
per-key fan-out, hot keys handled by AQE like any other sort. At equal
timestamps the right row is visible to the left row (inclusive bound,
matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_ORD = "__asof_ord"
_R = "__asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
    right_order: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row + columns of its matched right row
    (NULL when no right row precedes it / is within ``tolerance``).

    ``right_order`` breaks ties deterministically when several right
    rows share (key, ts): the greatest wins for ``backward``, the least
    for ``forward``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # NULL right timestamps must never match (DuckDB ASOF `l.ts >= r.ts`
    # is NULL-false); without this filter Spark's nulls-first window
    # ordering would sort a NULL-ts right row before everything and
    # last(ignorenulls) would carry its payload forward. NULL-ts left
    # rows sort first in their partition and come out unmatched — the
    # correct passthrough — so only the right side needs filtering.
    right = right.filter(F.col(right_ts).isNotNull())
    keys = list(on)
    rcols = [c for c in (right_cols or right.columns) if c not in keys]
    lcols = left.columns

    # forward = backward on negated time: keep ONE code path
    sign = 1 if direction == "backward" else -1

    def ts_key(c: Column) -> Column:
        # TIMESTAMP_NTZ cannot cast straight to double; hop via timestamp
        return (c.cast("timestamp").cast("double") * sign).alias(_TS)

    ordv = F.struct(*[F.col(c) for c in right_order]) if right_order else F.lit(0)
    r_struct = F.struct(*[F.col(c) for c in rcols], F.col(right_ts).alias("__rts"))
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_type = left.select(
        F.struct(*[F.col(c) for c in lcols]).alias("s")
    ).schema["s"].dataType
    l = left.select(
        *keys,
        ts_key(F.col(left_ts)),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("int").alias(_ORD) if not right_order else F.lit(None).cast(
            right.select(ordv.alias("o")).schema["o"].dataType
        ).alias(_ORD),
        F.struct(*[F.col(c) for c in lcols]).alias("__asof_l"),
        F.lit(None).cast(r_type).alias(_R),
    )
    r = right.select(
        *keys,
        ts_key(F.col(right_ts)),
        F.lit(0).alias(_SIDE),
        ordv.alias(_ORD),
        F.lit(None).cast(l_type).alias("__asof_l"),
        r_struct.alias(_R),
    )
    u = l.unionByName(r)
    # ``last`` picks the frame-final right row: greatest right_order for
    # backward; for forward (negated time) the least must win, so flip.
    ord_sorted = F.col(_ORD).asc() if sign == 1 else F.col(_ORD).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), ord_sorted)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col(_R), ignorenulls=True).over(w)
    out = (
        u.withColumn("__m", matched)
        .filter(F.col(_SIDE) == 1)
        .select(F.col("__asof_l").alias("__asof_l"), F.col("__m"))
    )
    if tolerance is not None:
        within = (
            F.col(f"__asof_l.{left_ts}").cast("timestamp").cast("double")
            - F.col("__m.__rts").cast("timestamp").cast("double")
        ) * sign <= tolerance.cast("double")
        out = out.withColumn(
            "__m", F.when(within, F.col("__m")).otherwise(F.lit(None))
        )
    return out.select(
        *[F.col(f"__asof_l.{c}").alias(c) for c in lcols],
        *[F.col(f"__m.{c}").alias(c) for c in rcols],
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """:func:`asof_join` semantics through the cogrouped-pandas UDF
    surface: ``left.groupBy(keys).cogroup(right.groupBy(keys))
    .applyInPandas(merge_asof)`` — the §2.10 member the union+window
    plan doesn't exercise.

    Per key group both sides arrive as Arrow batches; the vectorized
    ``pd.merge_asof`` (backward) does the per-group work. Same output
    as the window plan (property-tested): NULL right timestamps never
    match, NULL-ts left rows pass through unmatched.

    Use the window plan by default — one shuffle, no Python. This path
    exists for (a) API parity with engines whose as-of is UDF-based and
    (b) per-group logic that outgrows window expressions; cost is one
    shuffle per side plus Arrow transfer.
    """
    import pandas as pd

    from pyspark.sql import types as T

    keys = list(on)
    rcols = [c for c in (right_cols or right.columns) if c not in keys]
    l_fields = list(left.schema.fields)
    # The output StructType cannot hold duplicate field names, and a
    # colliding right column would silently surface LEFT-side values
    # under the right name — reject up front (rename before joining).
    collisions = sorted(set(rcols) & {f.name for f in l_fields})
    if collisions:
        raise ValueError(
            f"right_cols collide with left columns {collisions}; rename "
            "the right-side columns before asof_join_cogroup"
        )
    r_schema = right.schema
    out_fields = l_fields + [
        T.StructField(c, r_schema[c].dataType, True) for c in rcols
    ]
    out_schema = T.StructType(out_fields)
    l_names = [f.name for f in l_fields]
    r_merge_cols = list(dict.fromkeys([right_ts, *rcols]))
    # columns materialized by reindex on empty matches come back float64
    # NaN; Arrow refuses double→timestamp, so coerce them to NaT
    ts_like = {
        c
        for c in rcols
        if isinstance(r_schema[c].dataType, (T.TimestampType, T.TimestampNTZType))
    }

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        lg = lg[l_names]
        matched = lg[lg[left_ts].notna()].sort_values(left_ts, kind="mergesort")
        passthru = lg[lg[left_ts].isna()]
        rg = rg[r_merge_cols][rg[right_ts].notna()].sort_values(
            right_ts, kind="mergesort"
        )
        if len(matched) and len(rg):
            out = pd.merge_asof(
                matched,
                rg,
                left_on=left_ts,
                right_on=right_ts,
                direction="backward",
                suffixes=("", "__r"),
            )
            # rcols are disjoint from left names (checked above), so the
            # only column merge_asof can suffix is the right key itself
            # (when right_ts equals a left name) — and it is dropped by
            # this selection unless explicitly requested via rcols.
            out = out[l_names + rcols]
        else:
            out = matched.reindex(columns=l_names + rcols)
        if len(passthru):
            passthru = passthru.reindex(columns=l_names + rcols)
            out = pd.concat([out, passthru], ignore_index=True)
        for c in ts_like:
            if not pd.api.types.is_datetime64_any_dtype(out[c]):
                out[c] = pd.to_datetime(out[c])
        return out

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(merge, out_schema)
    )
