"""File-level min/max data skipping for the lake tables.

Iceberg stores per-file column bounds in its manifests and plans scans
by pruning files whose [min, max] ranges cannot satisfy the query
predicate — the scan never opens the file at all. That metadata layer
is the difference between "filter pushdown" (row groups skipped inside
an opened file) and "manifest pruning" (files never listed into the
scan): at 100 TB a time- or key-ranged query should plan from
manifest-sized metadata, not from 10^5 parquet footers.

This module is that metadata layer over the plain-parquet lake:

- **harvest**: per-file column stats (min / max / null_count /
  num_rows) read driver-side from parquet FOOTERS via pyarrow — no
  Spark job, no data pages; exactly what an Iceberg writer records at
  commit time.
- **cache**: a ``_STATS.json`` sidecar per table keyed by
  ``(relpath, size, mtime_ns)`` — content-addressed, so it is a pure
  cache: stale or missing entries are re-harvested, never trusted.
  On a real deployment these rows live in the manifest written at
  commit; here the lazy sidecar keeps every write path untouched and
  crash-safe (losing the cache costs a re-harvest, never correctness).
- **prune**: conservative ``file_may_match`` evaluation of simple
  conjunctive predicates ``(col, op, literal)``. A file is dropped
  ONLY when its stats prove no row can match; unknown columns, missing
  stats, NaN bounds or type mismatches keep the file (skipping must
  never change results — the residual filter still runs on survivors).

The reference has no analogue (it re-reads full tables per job); this
implements the scan-planning half of SURVEY.md §2 S8/J4 at the file
granularity Iceberg uses.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.util import empty_df

# predicate ops understood by the pruner; everything else must stay in
# the residual filter only
_OPS = {"==", "=", "<", "<=", ">", ">=", "between", "in"}


# -- value (de)serialization ----------------------------------------------
def _enc(v):
    """JSON-safe encoding of a stats bound, tagged by type so decode
    restores a comparable Python value."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float, str)):
        if isinstance(v, float) and not math.isfinite(v):
            return None  # NaN/inf bounds are useless for pruning
        return v
    if isinstance(v, _dt.datetime):
        # canonical naive-UTC: parquet TIMESTAMP(isAdjustedToUTC) comes
        # back tz-aware from pyarrow, predicate literals are naive —
        # both sides normalize here and in _norm
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return {"$dt": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"$d": v.isoformat()}
    if isinstance(v, bytes):
        return None  # binary bounds not comparable portably; keep file
    return None


def _dec(v):
    if isinstance(v, dict):
        if "$dt" in v:
            return _dt.datetime.fromisoformat(v["$dt"])
        if "$d" in v:
            return _dt.date.fromisoformat(v["$d"])
    return v


def _norm(v):
    """Normalize a predicate literal to the harvested value domain."""
    if isinstance(v, str):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc)
        return v.replace(tzinfo=None)
    return v


def _comparable(a, b) -> bool:
    if a is None or b is None:
        return False
    na, nb = isinstance(a, (int, float)), isinstance(b, (int, float))
    if na != nb:
        return False
    if not na and type(a) is not type(b):
        return False
    return True


# -- footer harvest --------------------------------------------------------
def harvest_parquet_stats(path: str) -> dict:
    """Column stats for one parquet file, aggregated over its row
    groups, read from the footer only (O(KB) per file, driver-side)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    cols: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name:  # nested fields: not prunable here
                continue
            st = c.statistics
            ent = cols.setdefault(
                name, {"min": None, "max": None, "null_count": 0, "has_stats": True}
            )
            if st is None or not st.has_min_max:
                # one statless row group poisons the whole file's bounds
                ent["has_stats"] = False
                continue
            mn, mx = _enc(st.min), _enc(st.max)
            if mn is None or mx is None:
                ent["has_stats"] = False
            else:
                ent["min"] = mn if ent["min"] is None else _enc(min(_dec(ent["min"]), _dec(mn)))
                ent["max"] = mx if ent["max"] is None else _enc(max(_dec(ent["max"]), _dec(mx)))
            if st.null_count is not None and ent["null_count"] is not None:
                ent["null_count"] += st.null_count
            else:
                ent["null_count"] = None  # unknown: disables the all-null prune
    return {"num_rows": md.num_rows, "columns": cols}


# -- predicate evaluation ---------------------------------------------------
def file_may_match(stats: dict, predicates: Sequence[tuple]) -> bool:
    """Conservative: False ONLY when stats prove no row satisfies the
    conjunction. Any uncertainty (missing column, no stats, type
    mismatch) keeps the file."""
    for pred in predicates:
        col, op, val = pred[0], pred[1], pred[2]
        ent = stats.get("columns", {}).get(col)
        if ent is None or not ent.get("has_stats", False):
            continue
        mn, mx = _dec(ent["min"]), _dec(ent["max"])
        if mn is None or mx is None:
            # all-null column: no non-null value can satisfy a comparison
            nc = ent.get("null_count")
            if nc is not None and nc >= stats.get("num_rows", 0) > 0:
                return False
            continue
        if op == "between":
            lo, hi = _norm(val[0]), _norm(val[1])
            if _comparable(mx, lo) and mx < lo:
                return False
            if _comparable(mn, hi) and mn > hi:
                return False
        elif op == "in":
            vals = [_norm(v) for v in val]
            if all(_comparable(mn, v) for v in vals) and all(
                v < mn or v > mx for v in vals
            ):
                return False
        else:
            v = _norm(val)
            if not _comparable(mn, v):
                continue
            if op in ("==", "=") and (v < mn or v > mx):
                return False
            if op == "<" and mn >= v:
                return False
            if op == "<=" and mn > v:
                return False
            if op == ">" and mx <= v:
                return False
            if op == ">=" and mx < v:
                return False
    return True


def predicates_to_column(predicates: Sequence[tuple]) -> Column | None:
    """The same conjunction as a Spark Column — the residual filter
    applied to surviving files (pruning is planning, never semantics)."""
    out = None
    for col, op, val in predicates:
        c = F.col(col)
        if op == "between":
            e = (c >= F.lit(val[0])) & (c <= F.lit(val[1]))
        elif op == "in":
            e = c.isin(list(val))
        elif op in ("==", "="):
            e = c == F.lit(val)
        elif op == "<":
            e = c < F.lit(val)
        elif op == "<=":
            e = c <= F.lit(val)
        elif op == ">":
            e = c > F.lit(val)
        elif op == ">=":
            e = c >= F.lit(val)
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
        out = e if out is None else out & e
    return out


# -- sidecar cache -----------------------------------------------------------
class StatsCache:
    """Content-addressed per-table stats sidecar (``_STATS.json``)."""

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "_STATS.json")
        try:
            with open(self.path) as f:
                self._cache = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            self._cache = {}

    @staticmethod
    def _key(root: str, path: str) -> str:
        st = os.stat(path)
        return f"{os.path.relpath(path, root)}|{st.st_size}|{st.st_mtime_ns}"

    def stats_for(self, paths: Sequence[str]) -> dict[str, dict]:
        out, dirty = {}, False
        live_keys = set()
        for p in paths:
            k = self._key(self.root, p)
            live_keys.add(k)
            if k not in self._cache:
                self._cache[k] = harvest_parquet_stats(p)
                dirty = True
            out[p] = self._cache[k]
        # drop entries for files that no longer exist (vacuumed versions)
        stale = [k for k in self._cache if k not in live_keys]
        if len(stale) > len(live_keys) * 4:  # amortized; cache is pure
            for k in stale:
                del self._cache[k]
            dirty = True
        if dirty:
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self._cache, f)
            os.replace(tmp, self.path)
        return out


def _parquet_files(dirs: Sequence[str]) -> list[str]:
    out = []
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                out.append(os.path.join(d, name))
    return out


def pruned_scan(
    spark: SparkSession,
    table_root: str,
    data_dirs: Sequence[str],
    predicates: Sequence[tuple],
    schema=None,
) -> tuple[DataFrame, dict]:
    """Plan a predicate scan over a lake table's current file set:
    harvest/lookup footer stats, drop files whose bounds cannot match,
    read the survivors, apply the full predicate as a residual filter.

    Returns ``(df, report)`` with ``report = {files_total, files_kept,
    rows_skipped_bound}``. Empty survivor set → empty DataFrame with
    the table schema (requires ``schema`` or at least one file)."""
    files = _parquet_files(data_dirs)
    cache = StatsCache(table_root)
    stats = cache.stats_for(files)
    kept = [p for p in files if file_may_match(stats[p], predicates)]
    skipped_rows = sum(stats[p]["num_rows"] for p in files if p not in kept)
    report = {
        "files_total": len(files),
        "files_kept": len(kept),
        "rows_skipped_bound": skipped_rows,
    }
    residual = predicates_to_column(predicates)
    if not kept:
        if schema is None:
            if not files:
                raise FileNotFoundError(f"no parquet files under {data_dirs}")
            schema = spark.read.parquet(files[0]).schema
        return empty_df(spark, schema), report
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*kept)
    if residual is not None:
        df = df.filter(residual)
    return df, report
