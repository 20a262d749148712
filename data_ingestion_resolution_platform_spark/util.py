"""Small plan-shaping utilities shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Repartition a DataFrame whose source has too few partitions.

    A single small parquet file scans as ONE partition, serializing
    every downstream expression (shingling, hashing, UDFs) onto one
    core. When the input has fewer than ``min_ratio * defaultParallelism``
    partitions, shuffle it out to the session's parallelism — the cost
    of shuffling a small input is microscopic next to running heavy
    per-row compute single-threaded. At production scale inputs arrive
    with many partitions and this is a no-op.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_ratio)):
        return df.repartition(target)
    return df


def reuse_for_self_join(df: DataFrame) -> DataFrame:
    """Materialize a small DataFrame once so a self-join doesn't
    recompute its (possibly expensive) lineage for each side.

    ``localCheckpoint(eager=False)`` truncates lineage and stores
    partitions on executors; both sides of the join then read the
    stored blocks. Use only for frames that are small relative to their
    compute cost (LSH band tables, signature tables). On a production
    cluster prefer reliable checkpointing if executor loss must be
    survivable mid-query.
    """
    return df.localCheckpoint(eager=False)
