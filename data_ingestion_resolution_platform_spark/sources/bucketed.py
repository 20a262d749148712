"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated fact⋈fact join is re-shuffling
both sides on the join key for every query. Spark's bucketing writes the
table ALREADY hash-partitioned on the key (`bucketBy` at write time, the
bucket spec recorded in the catalog), so a join between two tables
bucketed on the same key by compatible bucket counts needs **no Exchange
on either side** — the scan's output partitioning satisfies the join's
distribution requirement and the shuffle disappears from the plan. The
write-side cost is paid once; every subsequent join/groupBy on the
bucket key is map-side.

This is the persistent-table twin of the engine's other co-location
device (the linear-hashing bucket layout in
``sources/lake.py:PartitionedLakeTable``, which co-locates MERGE): use
bucketed tables for *analytical* joins that repeat across queries, and
the lake's hash buckets for *ingest* merge locality.

The reference re-reads and re-joins full tables per job with no layout
memory at all (`/root/reference/backend/worker.py:231-415` rebuilds its
dict-of-rows maps from scratch every message), so any repeated-join
locality is strictly new capability.

Mechanics / caveats encoded here:

- Bucket pruning & co-location need the table read THROUGH the catalog
  (``spark.table``) — reading the same parquet path directly discards
  the bucket spec.
- The in-memory catalog is session-scoped; ``ensure_bucketed`` is
  therefore idempotent-per-session and cheap to call before each query
  (re-registers if the session lost the table, reuses the files if the
  path already holds a committed copy for this spec).
- Joining two tables bucketed into the same ``n_buckets`` on the join
  key eliminates both Exchanges; one bucketed side still saves its own
  shuffle. ``sortBy`` at write time additionally lets SortMergeJoin
  skip the per-task sort.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_SPEC = "_BUCKET_SPEC.json"


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed catalog table at ``path``.

    ``bucketBy`` hash-partitions rows into ``n_buckets`` files per
    write-task group on ``keys`` (Spark's Murmur3 bucket hash — the
    same function the join planner assumes), ``sortBy`` orders rows
    within each bucket so downstream SortMergeJoins read presorted
    runs.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(table)
    spec = {"keys": list(keys), "n_buckets": n_buckets, "sort": list(sort_cols or [])}
    tmp = os.path.join(path, _SPEC + ".tmp")
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, os.path.join(path, _SPEC))


def _spec_matches(
    path: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> bool:
    """True iff the committed files at ``path`` were written with exactly
    this (keys, n_buckets, sort) spec. Sort order is part of the match:
    registering existing files with a DIFFERENT ``SORTED BY`` than they
    were written with makes the catalog promise an ordering the data
    doesn't have, and SortMergeJoin would trust it and return wrong
    results with one file per bucket."""
    try:
        with open(os.path.join(path, _SPEC)) as f:
            spec = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return False
    return (
        spec.get("keys") == list(keys)
        and spec.get("n_buckets") == n_buckets
        and spec.get("sort", []) == list(sort_cols or [])
    )


def _table_location(spark: SparkSession, table: str) -> str | None:
    """Filesystem path of a catalog table (scheme stripped), or None."""
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if row.col_name.strip() == "Location":
            loc = row.data_type.strip()
            if loc.startswith("file:"):
                loc = loc[len("file:"):]
            return os.path.normpath(loc)
    return None


def ensure_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int,
    builder,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Idempotently materialize + register a bucketed table, return it.

    - files at ``path`` already committed for this (keys, n_buckets)
      spec → re-register the existing files in this session's catalog
      (no rewrite; CREATE TABLE ... USING parquet CLUSTERED BY ...
      LOCATION is metadata-only);
    - otherwise → build the DataFrame via ``builder()`` and write it.

    Always returns ``spark.table(table)`` — the catalog read that
    carries the bucket spec into the planner.
    """
    if _spec_matches(path, keys, n_buckets, sort_cols):
        if spark.catalog.tableExists(table):
            # a stale same-name table registered over a DIFFERENT path
            # must not be returned as-is — re-point it at `path`
            if _table_location(spark, table) != os.path.normpath(path):
                spark.sql(f"DROP TABLE {table}")
        if not spark.catalog.tableExists(table):
            first = builder()
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in first.schema.fields
            )
            clustered = ", ".join(f"`{k}`" for k in keys)
            sorted_by = (
                " SORTED BY (" + ", ".join(f"`{c}`" for c in sort_cols) + ")"
                if sort_cols
                else ""
            )
            spark.sql(
                f"CREATE TABLE {table} ({cols}) USING parquet "
                f"CLUSTERED BY ({clustered}){sorted_by} INTO {n_buckets} BUCKETS "
                f"LOCATION '{path}'"
            )
        return spark.table(table)
    write_bucketed(builder(), table, path, keys, n_buckets, sort_cols=sort_cols)
    return spark.table(table)
