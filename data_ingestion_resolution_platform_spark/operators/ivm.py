"""Incremental view maintenance (IVM) of additive aggregates from a
change-data feed.

The reference recomputes its summary/lineage counts by re-scanning the
resolved table after every job (`/root/reference/backend/worker.py`
finalize path). At 10^10 rows a full rescan per epoch is the wrong
shape: a grouped aggregate of additive measures (COUNT, SUM, and
anything derived from them — AVG = SUM/COUNT) can be maintained from
the change feed alone, touching only the groups the epoch changed.

The algebra (classic delta-propagation, e.g. DBToaster / Materialize):
every CDF row carries a sign —

    insert            → +1   (adds its contribution)
    update_postimage  → +1
    update_preimage   → -1   (subtracts the OLD contribution — this is
                              why the feed must be invertible, i.e.
                              produced with ``include_preimages=True``
                              by :func:`sources.lake.snapshot_diff`)
    delete            → -1   (delete rows carry the before-image)

so ``Δagg = changes.groupBy(group_keys).agg(sum(sign), sum(sign*m)…)``
and ``new_state = state ⊕ Δagg`` (pointwise add, drop groups whose
row count reaches 0). Updates that MOVE a row between groups (a
group-key column changed) are handled for free: the preimage subtracts
from the old group, the postimage adds to the new one.

Plan shape / scale:
- the delta aggregation shuffles ONLY the change batch (|Δ| rows, with
  map-side partial aggregation — sums and counts combine), never the
  base table and never the aggregate state;
- applying the delta is a join on the group key where one side is the
  per-epoch delta (small ⇒ broadcast) — with a bucketed state table the
  rewrite touches only the buckets holding changed groups.
MIN/MAX are NOT additive (a delete can require a rescan of the group)
and are deliberately not offered here — use ``resolve_latest`` /
rollup queries for those.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: CDF change_type → contribution sign
_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "update_preimage": -1,
    "delete": -1,
}


def delta_aggregate(
    changes: DataFrame,
    group_keys: Sequence[str],
    sum_cols: Mapping[str, str] | None = None,
    change_col: str = "change_type",
    count_alias: str = "n_rows",
) -> DataFrame:
    """Collapse a pre-image-bearing change feed into one signed delta
    row per touched group: ``group_keys + count_alias + <sum aliases>``.

    ``sum_cols`` maps output alias → input column/SQL expression, e.g.
    ``{"total_bytes": "length(content)"}``. Sums are computed as
    ``SUM(sign * expr)`` so NULL measures are ignored symmetrically on
    the add and the subtract side (matching SQL SUM semantics in the
    recomputed aggregate).
    """
    sum_cols = dict(sum_cols or {})
    sign = F.create_map(
        *[F.lit(x) for kv in _SIGN.items() for x in kv]
    )[F.col(change_col)]
    base = changes.withColumn("_sign", sign).filter(F.col("_sign").isNotNull())
    aggs = [F.sum("_sign").cast("long").alias(count_alias)]
    for alias, expr in sum_cols.items():
        aggs.append(
            F.sum(F.col("_sign") * F.expr(expr).cast("long")).cast("long").alias(alias)
        )
    return base.groupBy(*group_keys).agg(*aggs)


def merge_delta(
    state: DataFrame | None,
    delta: DataFrame,
    group_keys: Sequence[str],
    count_alias: str = "n_rows",
) -> DataFrame:
    """``state ⊕ delta``: pointwise-add every measure column, keep
    untouched groups as-is, drop groups whose row count reaches 0.

    One full-outer equi-join on the group key (delta side is per-epoch
    small ⇒ AQE broadcasts it); measure columns are everything that is
    not a group key, and must match between ``state`` and ``delta``.
    ``state=None`` bootstraps from an empty aggregate.
    """
    key_list = list(group_keys)
    measures = [c for c in delta.columns if c not in key_list]
    if state is None:
        return delta.filter(F.col(count_alias) > 0)
    if sorted(state.columns) != sorted(delta.columns):
        raise ValueError(
            f"state columns {sorted(state.columns)} != delta columns {sorted(delta.columns)}"
        )
    s = state.select(*key_list, *[F.col(c).alias(f"_s_{c}") for c in measures])
    d = delta.select(*key_list, *[F.col(c).alias(f"_d_{c}") for c in measures])
    j = s.join(d, on=key_list, how="full_outer")
    out = j.select(
        *key_list,
        *[
            (
                F.coalesce(F.col(f"_s_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).cast("long").alias(c)
            for c in measures
        ],
    )
    return out.filter(F.col(count_alias) > 0)


def maintain_aggregate(
    table,
    changes: DataFrame,
    group_keys: Sequence[str],
    sum_cols: Mapping[str, str] | None = None,
    epoch_id: str | int | None = None,
    change_col: str = "change_type",
    count_alias: str = "n_rows",
) -> dict:
    """Maintain a persisted grouped-aggregate ``LakeTable`` from one
    change-feed epoch, exactly-once.

    The MERGE batch contains ONLY groups the epoch touched (delta LEFT
    JOIN current state — the delta side stays the driver of batch
    size), so with a bucketed target the rewrite cost is O(|delta| +
    touched buckets), independent of how many groups exist. Groups
    whose row count reaches 0 are deleted via the MERGE delete clause.
    Rides the table's epoch ledger: re-delivering the same epoch is a
    no-op, which is what makes signed deltas safe under at-least-once
    feeds (applying a delta twice would double-count).
    """
    if epoch_id is not None and table.epoch_committed(epoch_id):
        return {"skipped": True, "epoch": str(epoch_id)}
    key_list = list(group_keys)
    delta = delta_aggregate(
        changes, key_list, sum_cols, change_col=change_col, count_alias=count_alias
    )
    # delta feeds both the semi-join key side and the batch body —
    # persist so the |changes| aggregation runs once (unpersisted in
    # the finally below; same pattern as LakeTable.merge itself)
    delta = delta.persist()
    measures = [c for c in delta.columns if c not in key_list]
    if table.exists():
        # two broadcast-shaped steps so the (big) state never shuffles:
        # 1) semi-join state down to the touched groups (delta keys are
        #    the small broadcast side), 2) left-join delta against that
        #    now-small touched set (broadcastable as the right side).
        # A direct `delta LEFT JOIN state` could NOT broadcast — Spark
        # only broadcasts the non-preserved side, which here is the
        # full state.
        cur = table.read().select(
            *key_list, *[F.col(c).alias(f"_s_{c}") for c in measures]
        )
        touched = cur.join(
            F.broadcast(delta.select(*key_list)), on=key_list, how="left_semi"
        )
        joined = delta.join(F.broadcast(touched), on=key_list, how="left")
        batch = joined.select(
            *key_list,
            *[
                (F.coalesce(F.col(f"_s_{c}"), F.lit(0)) + F.col(c))
                .cast("long")
                .alias(c)
                for c in measures
            ],
        )
    else:
        batch = delta
    try:
        return table.merge(
            batch,
            key_list,
            epoch_id=epoch_id,
            delete_condition=F.col(count_alias) <= 0,
        )
    finally:
        delta.unpersist()
