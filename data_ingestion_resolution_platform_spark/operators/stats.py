"""Distribution statistics: exact grouped percentiles by rank selection.

Exact percentiles need the k-th smallest element per group. Engines
disagree on *interpolated* quantiles down to FP operation order, so
this operator uses the nearest-rank definition — ``k = max(1,
ceil(p * n))``, value = k-th smallest under a total order — which is
integer-exact and therefore reproducible across engines (the DuckDB
oracle uses the identical window construction).

Physical shape: one shuffle to sort each group (`row_number` window)
plus a partial-aggregated groupBy. Exact percentiles fundamentally
cost a per-group distributed sort; groups sort in parallel, so with
many groups this scales with executors. For a single giant group at
100 TB prefer the sketch path (``F.percentile_approx``, mergeable
KLL-style partials, no global sort) and accept rank error.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float],
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Nearest-rank percentiles of ``value_col`` per group.

    Output: group cols + ``n_rows`` + one ``p<NN>`` column per
    requested percentile. ``tie_cols`` make the total order (and hence
    rank assignment) deterministic when values repeat.
    """
    order = [F.col(value_col).asc(), *[F.col(c).asc() for c in tie_cols]]
    w_rank = Window.partitionBy(*group_cols).orderBy(*order)
    w_grp = Window.partitionBy(*group_cols)
    ranked = df.withColumn("_rn", F.row_number().over(w_rank)).withColumn(
        "_n", F.count(F.lit(1)).over(w_grp)
    )
    aggs = [F.max("_n").cast("long").alias("n_rows")]
    for p in ps:
        k = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("_n") * F.lit(float(p))))
        aggs.append(
            F.max(F.when(F.col("_rn") == k, F.col(value_col))).alias(f"p{round(p * 100):02d}")
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def percentile_rank_sql(
    table_expr: str,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float],
    tie_cols: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`group_percentiles` (same rank arithmetic)."""
    grp = ", ".join(group_cols)
    order = ", ".join([value_col, *tie_cols])
    picks = ",\n       ".join(
        f"max(CASE WHEN rn = greatest(1, CAST(ceil(n * {float(p)!r}) AS BIGINT)) "
        f"THEN {value_col} END) AS p{round(p * 100):02d}"
        for p in ps
    )
    return f"""
WITH w AS (
  SELECT {grp}, {value_col},
         row_number() OVER (PARTITION BY {grp} ORDER BY {order}) AS rn,
         count(*) OVER (PARTITION BY {grp}) AS n
  FROM {table_expr}
)
SELECT {grp}, CAST(max(n) AS BIGINT) AS n_rows,
       {picks}
FROM w GROUP BY {grp}
"""
