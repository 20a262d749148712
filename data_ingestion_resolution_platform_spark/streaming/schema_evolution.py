"""Schema evolution: Arrow-batch reconciliation of drifting feeds.

The reference tolerates varying CSV headers while projecting a fixed
logical schema (`/root/reference/backend/worker.py:268,305-319`); our
feed analogue is change-event batches whose physical schema drifts —
added columns, renamed columns, missing columns. Two paths:

- ``reconcile_exprs``: pure column expressions when the batch already
  has a single known Spark schema (rename + null-backfill + cast +
  project). Zero Python — the fast path.
- ``reconcile_json_stream``: the genuinely dynamic case — a JSONL feed
  where *each file/row* may carry a different field set. Spark must fix
  one schema per DataFrame, so we read raw lines and reconcile inside
  an Arrow-batched ``mapInPandas``: parse, apply rename map, backfill
  missing fields as NULL, drop unknown fields, cast — per pandas batch,
  no per-row Python in the driver plan. This is the pandas-UDF
  reconciliation named by the north rule.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPARK_TO_PANDAS_CAST = {
    T.LongType: "Int64",
    T.IntegerType: "Int32",
    T.DoubleType: "float64",
    T.StringType: "object",
    T.BooleanType: "boolean",
}


def reconcile_exprs(
    df: DataFrame,
    canonical: T.StructType,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Align a statically-typed batch to the canonical schema.

    ``renames`` maps feed-column → canonical-column. Missing canonical
    columns are NULL-backfilled; extra feed columns are dropped; types
    are cast. Handles the Iceberg-style add/rename evolution cases.
    """
    renames = renames or {}
    cols = []
    have = {renames.get(c, c): c for c in df.columns}
    for field in canonical.fields:
        src = have.get(field.name)
        if src is not None:
            cols.append(F.col(src).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def reconcile_json_stream(
    lines_df: DataFrame,
    canonical: T.StructType,
    renames: dict[str, str] | None = None,
    line_col: str = "value",
) -> DataFrame:
    """Parse a heterogeneous JSONL feed into the canonical schema via
    Arrow-batched ``mapInPandas``.

    Each input row is one JSON object whose keys may be any mix of
    canonical names, renamed legacy names, and unknown extras. The
    pandas function reindexes every batch onto the canonical column
    set (vectorized: ``DataFrame.rename`` + ``reindex``), so late/old
    producers keep working — the reference's varying-CSV-header
    tolerance generalized.
    """
    renames = dict(renames or {})
    names = [f.name for f in canonical.fields]
    # backfilled columns are NULL by definition ⇒ output schema must be
    # nullable regardless of the canonical table's constraints
    canonical = T.StructType([T.StructField(f.name, f.dataType, True) for f in canonical.fields])
    casts = {}
    for f_ in canonical.fields:
        c = _SPARK_TO_PANDAS_CAST.get(type(f_.dataType))
        if c is not None:
            casts[f_.name] = c

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({n: pd.Series(dtype="object") for n in names})
                continue
            records = [json.loads(s) for s in pdf[line_col]]
            out = pd.DataFrame.from_records(records)
            out = out.rename(columns=renames)
            out = out.reindex(columns=names)  # backfill missing → NaN, drop extras
            for name, dtype in casts.items():
                if dtype == "object":
                    continue
                out[name] = out[name].astype(dtype)
            yield out

    return lines_df.mapInPandas(parse, canonical)
