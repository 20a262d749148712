"""Z-order (Morton) clustering: multi-dimensional file skipping.

Range-clustering a table on ONE column (``repartitionByRange('ts')``)
gives the file pruner (``sources/skipping.py``) tight per-file bounds
on that column and that column only — a predicate on any *other*
column still scans every file. Z-ordering interleaves the bits of
several columns into one sort key, so files end up tight-ish on ALL
participating dimensions at once: a query filtering on either (or
both) columns prunes most files from footer stats alone. This is
Iceberg/Delta's ``OPTIMIZE ZORDER BY`` re-expressed as a plain Spark
plan: scale each column to a ``bits``-wide integer rank, interleave
bits with shift/or expressions (whole-stage codegen'd, no UDF),
``repartitionByRange`` on the key, sort within partitions, write.

Scale shape: one pass to collect per-column min/max (an aggregate of 2
scalars per column), one range-shuffle of the data, done — the same
cost as any clustered rewrite; the payoff is every later selective
scan. Works for numeric and timestamp columns; anything else would
need rank sampling (not implemented — strings hash-cluster instead,
which preserves equality pruning but not ranges).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _to_double(col: Column, dtype) -> Column:
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # microsecond scale keeps sub-second ordering; NTZ → session-UTC
        # instant (session.py pins the zone, so this is a pure relabel)
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, _NUMERIC):
        return col.cast("double")
    raise TypeError(f"z-order needs numeric/timestamp columns, got {dtype}")


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> Column:
    """Morton key over ``cols`` as one LONG expression.

    Each column is min/max-scaled (bounds from one tiny aggregate on
    ``df``) to an integer in [0, 2^bits), then bit ``i`` of column
    ``j`` lands at position ``i*len(cols)+j`` of the key. NULLs sort
    first (rank 0). ``bits*len(cols)`` must fit in 63.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits({bits}) * cols({n}) must be <= 63")
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in cols:
        d = _to_double(F.col(c), fields[c])
        aggs += [F.min(d).alias(f"__mn_{c}"), F.max(d).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs).collect()[0]  # 2*n scalars — driver-safe
    max_rank = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
        d = _to_double(F.col(c), fields[c])
        if mn is None or mx is None or mx <= mn:
            rank = F.lit(0).cast("long")
        else:
            scaled = (d - F.lit(mn)) / F.lit(mx - mn) * F.lit(float(max_rank))
            rank = F.coalesce(
                F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(max_rank)))
                .cast("long"),
                F.lit(0).cast("long"),
            )
        for i in range(bits):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def write_clustered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` at ``path`` z-ordered on ``cols`` into ~``n_files``
    files, each with tight footer min/max bounds on every clustered
    column (verified by tests against ``sources/skipping.pruned_scan``)."""
    key = zorder_key(df, cols, bits=bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
