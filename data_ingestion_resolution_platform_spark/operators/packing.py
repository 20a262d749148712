"""Distributed global prefix-sum and training-shard packing.

A training pipeline that concatenates documents into fixed-token-budget
shards (sequence packing) needs every document's GLOBAL token offset —
a running sum ordered over the whole table. That is the one window
shape that does not parallelize naively: ``Window.orderBy(...)`` with
no ``partitionBy`` moves every row into a single task (Spark even warns
about it), which is a non-starter at 10^9 documents.

The scalable form is the classic two-phase parallel scan:

1. **Range-partition** rows by the order key (``repartitionByRange``,
   globally ordered partitions) and sort within partitions.
2. **Per-partition totals**: one sum per physical partition. Only
   P = #partitions rows ever reach the driver — bounded by cluster
   size, not data size — and become exclusive per-partition offsets.
3. **Intra-partition cumulative sum** (window partitioned by the
   physical partition id → fully parallel) plus the broadcast-joined
   partition offset.

Cost: one range shuffle of (order key, value) + a P-row collect. The
frame is pinned with ``localCheckpoint`` so the partition ids seen by
step 2 and step 3 are the same physical partitioning (and the range
shuffle runs once, not twice); on a production cluster prefer reliable
checkpointing if executor loss must be survivable mid-query
(see ``util.reuse_for_self_join``).

Reference parity: the reference has no packing operator (it is a
row-at-a-time CSV worker, `/root/reference/backend/worker.py:231-415`);
this module is part of the large-scale training-data family the brief
adds on top of the reference inventory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.util import local_df

_PID = "__pid"
_OFFSET = "__part_offset"


def global_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "global_offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive global prefix sum of ``value_col`` in ``order_cols``
    order, without ever forming a single-task global window.

    ``order_cols`` must be a deterministic total order (include a
    unique tiebreaker column) or the assignment is ambiguous. Values
    are summed as BIGINT — token counts, byte sizes, row weights.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        # Pin the physical partitioning: totals (action below) and the
        # final cumsum must observe identical partition ids, and the
        # range shuffle should execute once.
        .localCheckpoint(eager=True)
    )

    # P rows — one per partition — never data-sized.
    totals = {
        r[_PID]: r["_t"]
        for r in part.groupBy(_PID).agg(F.sum(F.col(value_col).cast("long")).alias("_t")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += int(totals[pid] or 0)
    # JVM VALUES relation: a pickled-RDD createDataFrame would fork the
    # Python worker pool on first action (~7 s cold) for P metadata rows
    off_df = local_df(spark, offsets, f"{_PID} int, {_OFFSET} long")

    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = F.coalesce(F.sum(F.col(value_col).cast("long")).over(w), F.lit(0).cast("long"))
    return (
        part.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col(_OFFSET) + intra).cast("long"))
        .drop(_PID, _OFFSET)
    )


def pack_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: Sequence[str] = ("doc_id",),
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards by global
    token offset (document-contiguous packing).

    Each document's shard is the one its global start offset falls in:
    ``shard_id = floor(global_offset / budget)``. Documents may straddle
    a boundary (the downstream tokenizer splits them); the assignment is
    deterministic, replay-safe, and engine-portable — the whole
    computation is expressible as an ANSI-SQL window for the oracle.
    Adds ``global_offset``, ``shard_id``, ``offset_in_shard``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = global_prefix_sum(df, order_cols, token_col, "global_offset", num_partitions)
    shard = F.floor(F.col("global_offset") / F.lit(budget)).cast("long")
    return out.withColumn("shard_id", shard).withColumn(
        "offset_in_shard", (F.col("global_offset") - shard * F.lit(budget)).cast("long")
    )
