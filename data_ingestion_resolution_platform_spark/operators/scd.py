"""SCD Type-2 historization of a CDC change feed (SURVEY.md §2.5/§2.7).

The reference platform keeps only the *latest* resolved row per natural
key (``worker.py``'s resolve-then-upsert loop); a warehouse consumer of
the same feed usually also wants the full version history — every
attribute change as a validity interval. This module derives that
history from the same I/U/D feed the CDC family consumes:

- each I or U event whose tracked attributes actually *changed* opens a
  new version, valid from its LSN;
- the next boundary event (change, re-insert, or tombstone) closes it
  (``valid_to_lsn`` exclusive);
- a D tombstone closes the open version and opens nothing;
- the newest open version per key is flagged ``is_current``.

Scale notes (100 TB): the whole operator is two window functions over
ONE hash-partitioning on the natural key — a single shuffle, both sorts
share the (key, lsn) order so the exchange is reused. No state beyond
the window frame (lag/lead of one row); no collect, no UDF. Per-key
event counts bound the sort, not memory. A pathologically hot key is
sorted within one task — the same bound every LWW window carries — and
is mitigated upstream by epoch-sliced replay (each micro-batch
historizes only its own delta, then MERGEs on (keys, valid_from_lsn)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    feed: DataFrame,
    keys: Sequence[str],
    lsn_col: str,
    attr_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Collapse an ordered I/U/D feed into type-2 validity intervals.

    Returns one row per *distinct consecutive attribute state* per key:
    ``keys…, attr_cols…, valid_from_lsn, valid_to_lsn (nullable),
    is_current (int 0/1)``. No-op updates (attributes null-safe-equal
    to the previous surviving state, with no tombstone in between) are
    dropped; a re-insert after a D always opens a new version even if
    attributes match the deleted one.
    """
    w = Window.partitionBy(*keys).orderBy(lsn_col)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    prev_attrs = F.lag(attrs).over(w)
    prev_op = F.lag(F.col(op_col)).over(w)
    # Boundary = first event, tombstone, first event after a tombstone,
    # or attribute change. Comparing against the *immediate* predecessor
    # is equivalent to comparing against the previous survivor: a run of
    # equal-attribute events with no D inside collapses inductively.
    boundary = (
        (F.col(op_col) == F.lit("D"))
        | prev_op.isNull()
        | (prev_op == F.lit("D"))
        | ~attrs.eqNullSafe(prev_attrs)
    )
    b = feed.withColumn("__boundary", boundary).filter(F.col("__boundary"))
    # Same partitioning + ordering as `w`: Catalyst reuses the exchange.
    w2 = Window.partitionBy(*keys).orderBy(lsn_col)
    closed = b.withColumn("valid_to_lsn", F.lead(F.col(lsn_col)).over(w2))
    versions = closed.filter(F.col(op_col) != F.lit("D"))
    return versions.select(
        *keys,
        *attr_cols,
        F.col(lsn_col).alias("valid_from_lsn"),
        "valid_to_lsn",
        F.col("valid_to_lsn").isNull().cast("int").alias("is_current"),
    )


def scd2_as_of(history: DataFrame, lsn: int) -> DataFrame:
    """Point-in-time read of an SCD2 history: the version visible at
    ``lsn`` (valid_from ≤ lsn < valid_to). Plans as two pushed-down
    range predicates — partition/file pruning applies when the history
    is stored partitioned or z-ordered on ``valid_from_lsn``."""
    return history.filter(
        (F.col("valid_from_lsn") <= F.lit(lsn))
        & (F.col("valid_to_lsn").isNull() | (F.col("valid_to_lsn") > F.lit(lsn)))
    )
