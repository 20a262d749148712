"""Generic exact grouped top-k with bounded reducer state (SURVEY.md
§2.6 O1/O2 generalized per-group; same two-phase salted shape as the
CDC candidate bound, `operators/cdc.py::bounded_candidates`).

The naive per-group top-k — ``row_number() OVER (PARTITION BY key
ORDER BY …) <= k`` — sorts EVERY row of every group on one reducer
before discarding all but k. Fine for balanced keys; a hot key at
10^10 events makes that reducer the job. Here:

- phase 1 groups by (key, salt): each reducer materializes a sorted
  slice of at most k rows per (key, salt) — collect_list state is
  bounded by the salt share, output by k;
- phase 2 merges ≤ n_salt pre-sliced partials per key (≤ n_salt·k rows
  of reducer state, a hard bound) and re-slices.

Top-k of per-salt top-ks is exact: any global top-k row is in its own
salt's top-k, since both phases use the same total struct ordering.
Note the bound that actually holds (same as ``cdc.py``'s
``bounded_candidates``): ``collect_list`` partials are NOT sliced until
the phase-1 reduce, so the first shuffle and its map-side state still
carry every row of each (key, salt) group — what salting buys is the
hard REDUCER-state bound (≤ salt share in phase 1, ≤ n_salt·k rows per
key in phase 2), which is where a hot key actually dies. Only the
phase-2 shuffle is k-truncated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ORD = "__ord"
_PAYLOAD = "__p"


def grouped_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    n_salt: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-k rows per key under the total DESC ordering of
    ``order_cols`` (build ascending tie-breakers by negating, e.g.
    ``[F.col("price"), -F.col("id")]`` = price DESC, id ASC). Output:
    every input column plus ``rank_col`` (1-based). Deterministic iff
    ``order_cols`` is a total order within each key."""
    from data_ingestion_resolution_platform_spark.operators.skew import SALT_COL, with_salt

    payload_cols = list(df.columns)
    staged = (
        with_salt(df, n_salt)
        .withColumn(_ORD, F.struct(*order_cols))
        .withColumn(_PAYLOAD, F.struct(F.col(_ORD), *[F.col(c) for c in payload_cols]))
    )
    partial = staged.groupBy(*keys, SALT_COL).agg(
        F.slice(F.sort_array(F.collect_list(_PAYLOAD), asc=False), 1, k).alias("__t")
    )
    merged = partial.groupBy(*keys).agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("__t")), asc=False), 1, k
        ).alias("__t")
    )
    exploded = merged.select(*keys, F.posexplode("__t").alias("__pos", _PAYLOAD))
    return exploded.select(
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload_cols if c not in keys],
        *keys,
        (F.col("__pos") + F.lit(1)).cast("int").alias(rank_col),
    )
