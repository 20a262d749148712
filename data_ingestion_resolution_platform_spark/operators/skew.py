"""Skew-aware aggregation: explicit key salting (SURVEY.md §4, §7.4).

Hot natural keys (a repo with millions of files, one key with millions
of change events) concentrate shuffle input on single reducers. Two
mitigations, composable:

1. **AQE** (`spark.sql.adaptive.skewJoin.enabled`, on in session.py)
   splits skewed *join* partitions at runtime.
2. **Explicit salting** here for *aggregations*: phase 1 aggregates per
   (key, salt) — fan-out N_SALT — phase 2 merges the partials per key.
   Correct for any algebraic aggregate (max_by/min_by/count/sum):
   LWW's "max of maxes" property is what makes two-phase legal.

Note Spark's hash aggregate already does map-side partial aggregation
(per *input partition*), which usually suffices for max_by-style LWW;
explicit salting matters when the *post-shuffle* per-key state is
itself large (e.g. collect_list of candidates) or when a single key
exceeds one reducer's capacity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salt: int = 16, entropy: Column | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n_salt) derived from row content
    (hash of all columns unless ``entropy`` given) — no randomness, so
    replay produces identical partials."""
    src = entropy if entropy is not None else F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(SALT_COL, F.pmod(src, F.lit(n_salt)).cast("int"))


def salted_latest(
    df: DataFrame,
    keys: Sequence[str],
    lsn_col: str,
    n_salt: int = 16,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Two-phase explicit-salt LWW: max_by per (key, salt), then per key.

    Phase 1 shuffles on (key, salt) — a hot key spreads over n_salt
    reducers; phase 2 shuffles at most n_salt rows per key.
    Semantically identical to ``resolve_latest`` (including
    deterministic ``tie_breakers`` ordering after the LSN).
    """
    payload_cols = list(df.columns)
    ordering = F.struct(F.col(lsn_col), *[F.col(t) for t in tie_breakers])
    salted = with_salt(df, n_salt, entropy=F.xxhash64(F.col(lsn_col)))
    staged = salted.withColumn(
        "__p", F.struct(*[F.col(c) for c in payload_cols])
    ).withColumn("__o", ordering)
    partial = staged.groupBy(*keys, SALT_COL).agg(
        F.max_by("__p", F.col("__o")).alias("__p"), F.max("__o").alias("__o")
    )
    final = partial.groupBy(*keys).agg(F.max_by("__p", F.col("__o")).alias("__p"))
    return final.select(*[F.col(f"__p.{c}").alias(c) for c in payload_cols])


def salted_count(
    df: DataFrame, keys: Sequence[str], n_salt: int = 16
) -> DataFrame:
    """Two-phase count per key under explicit salt (sum of partial
    counts) — template for any algebraic aggregate."""
    salted = with_salt(df, n_salt)
    partial = salted.groupBy(*keys, SALT_COL).agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n_rows"))


def top_hot_keys(df: DataFrame, keys: Sequence[str], k: int = 20) -> DataFrame:
    """Diagnostic: the k heaviest keys (drives salting decisions)."""
    return (
        salted_count(df, keys)
        .orderBy(F.col("n_rows").desc(), *[F.col(c) for c in keys])
        .limit(k)
    )
