"""Per-file Bloom-filter index for point-lookup data skipping.

Footer min/max stats (``sources/skipping.py``) prune *ranged* scans,
but an equality probe on a high-cardinality, non-clustered column
(``user_id = 123``, ``path = 'src/x.py'``) matches every file's
[min, max] envelope — stats keep everything. Iceberg/Parquet solve
this with per-file Bloom filters; this module is that layer for the
plain-parquet lake:

- **build** (distributed): ONE Spark aggregation computes the filter
  bits for every file simultaneously — ``input_file_name()`` ×
  k seeded ``xxhash64`` bit positions, folded per (file, word) with
  ``bit_or`` — then a bounded collect (≤ files × m/64 rows, metadata-
  sized, never data-sized) writes the sidecar manifest. On a real
  deployment each writer would emit its file's filter at commit time
  (Iceberg puffin files); the lazy build here keeps every existing
  write path untouched.
- **probe** (driver-side): hash the literal with the same seeded
  function (one 1-row Spark job so JVM xxhash64 semantics match bit
  for bit), drop files missing any probe bit, read survivors with the
  equality predicate as a residual filter. False positives cost a
  redundant file read; false negatives are impossible — results never
  change, only I/O.
- **staleness-safe**: manifest entries are keyed by (relpath, size,
  mtime_ns) like ``StatsCache``; unknown or changed files are always
  kept.

Sizing: m=4096 bits / k=3 gives ~1% false-positive rate at ~500
distinct keys per file; build cost is one pass over the column only
(column-pruned scan).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.util import empty_df
from data_ingestion_resolution_platform_spark.sources.skipping import (
    _parquet_files,
    predicates_to_column,
)

_SEEDS = [0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35]


def _bit_positions(col, m_bits: int, k: int):
    """k seeded xxhash64 positions in [0, m_bits)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(_SEEDS[i % len(_SEEDS)] + i)), F.lit(m_bits))
        for i in range(k)
    ]


def _manifest_path(table_root: str, col: str) -> str:
    return os.path.join(table_root, f"_BLOOM_{col}.json")


def _file_key(path: str) -> dict:
    st = os.stat(path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


def build_bloom_index(
    spark: SparkSession,
    table_root: str,
    data_dirs: Sequence[str],
    col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> dict:
    """Build/refresh the per-file Bloom manifest for ``col``.

    One distributed aggregation over a column-pruned scan; the result
    (file → m_bits/64 longs) is manifest-sized and written as a JSON
    sidecar under ``table_root``.
    """
    files = _parquet_files(data_dirs)
    if not files:
        raise FileNotFoundError(f"no parquet files under {data_dirs}")
    df = spark.read.parquet(*files).select(
        F.input_file_name().alias("__file"), F.col(col)
    )
    pos = F.array(*_bit_positions(F.col(col), m_bits, k))
    words = (
        df.filter(F.col(col).isNotNull())
        .select("__file", F.explode(pos).alias("__pos"))
        .select(
            "__file",
            F.floor(F.col("__pos") / 64).cast("long").alias("__word"),
            # SQL shiftleft takes a column shift; the Python wrapper only
            # takes a literal int
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
                "__bit"
            ),
        )
        .groupBy("__file", "__word")
        .agg(F.bit_or("__bit").alias("__mask"))
        .collect()  # bounded: ≤ files × m_bits/64 rows (metadata-sized)
    )
    per_file: dict[str, dict[int, int]] = {}
    for r in words:
        path = r["__file"]
        if path.startswith("file:"):
            from urllib.parse import unquote, urlparse

            path = unquote(urlparse(path).path)
        per_file.setdefault(path, {})[int(r["__word"])] = int(r["__mask"])
    entries = {}
    for p in files:
        wm = per_file.get(p, {})
        entries[os.path.relpath(p, table_root)] = {
            **_file_key(p),
            "words": {str(w): m for w, m in wm.items()},
        }
    manifest = {"col": col, "m_bits": m_bits, "k": k, "files": entries}
    tmp = _manifest_path(table_root, col) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table_root, col))
    return {"files_indexed": len(entries), "m_bits": m_bits, "k": k}


def _probe_bits(spark: SparkSession, value, dtype, m_bits: int, k: int) -> list[int]:
    """Hash the probe literal exactly as the build did (JVM xxhash64 via
    a 1-row job — bit-identical to the distributed build)."""
    lit = F.lit(value).cast(dtype)
    row = spark.range(1).select(
        *[p.alias(f"p{i}") for i, p in enumerate(_bit_positions(lit, m_bits, k))]
    ).head()
    return [int(row[f"p{i}"]) for i in range(k)]


def bloom_pruned_scan(
    spark: SparkSession,
    table_root: str,
    data_dirs: Sequence[str],
    col: str,
    value,
    extra_predicates: Sequence[tuple] = (),
) -> tuple[DataFrame, dict]:
    """Equality scan ``col == value`` planned through the Bloom
    manifest: files whose filter lacks any probe bit are never read.

    Returns ``(df, report)``; unknown/stale files are always kept, and
    the equality + ``extra_predicates`` run as residual filters so
    results are exact regardless of pruning.
    """
    files = _parquet_files(data_dirs)
    if not files:
        raise FileNotFoundError(f"no parquet files under {data_dirs}")
    with open(_manifest_path(table_root, col)) as f:
        manifest = json.load(f)
    if manifest["col"] != col:
        raise ValueError(f"manifest indexes {manifest['col']!r}, not {col!r}")
    m_bits, kk = manifest["m_bits"], manifest["k"]
    dtype = spark.read.parquet(files[0]).schema[col].dataType
    probe = _probe_bits(spark, value, dtype, m_bits, kk)

    kept = []
    for p in files:
        e = manifest["files"].get(os.path.relpath(p, table_root))
        if e is None or _file_key(p) != {"size": e["size"], "mtime_ns": e["mtime_ns"]}:
            kept.append(p)  # unknown or rewritten since indexing → keep
            continue
        words = e["words"]
        if all(
            int(words.get(str(b // 64), 0)) & (1 << (b % 64)) for b in probe
        ):
            kept.append(p)
    report = {"files_total": len(files), "files_kept": len(kept)}
    preds = [(col, "==", value), *extra_predicates]
    residual = predicates_to_column(preds)
    if not kept:
        schema = spark.read.parquet(files[0]).schema
        return empty_df(spark, schema), report
    df = spark.read.schema(spark.read.parquet(files[0]).schema).parquet(*kept)
    return df.filter(residual), report
