"""Group-pruned rescan maintenance — the strategy for per-group read
models that are NOT delta-decomposable.

`operators/ivm.py` maintains aggregates whose algebra admits signed
deltas (SUM-like), zero-crossing multiplicities (COUNT DISTINCT), or
bounded retraction rescans (MIN/MAX). Some reference read models resist
all three: an ordered funnel's "first click AT OR AFTER the first view"
makes every stage's value depend on the previous stage's — inserting
one early view can invalidate a user's click AND purchase stages at
once, and deleting it can resurrect them. There is no useful delta
algebra; the correct maintained form is:

    per epoch, recompute the aggregate for EXACTLY the groups the
    delta touched, from the post-epoch base table, and MERGE.

Cost is O(|affected groups| x group history), not O(table): the
affected-key frame is epoch-sized and broadcast, so the base-table read
is a broadcast-semi-join-pruned scan (partition/bucket-pruned too when
the base table is bucketed by the group key — the 100 TB layout), and
the MERGE batch is group-sized. This is the same shape the engine's
non-additive IVM uses for extreme retractions, promoted to a
first-class operator for whole-group read models.

Groups whose recompute returns no row (every contributing base row
deleted) are DELETED from the store — encoded with an ``alive``
sentinel column so the batch rides COW, MoR, and bucketed backends
unchanged (same convention as `graph_incremental`).

Exactly-once: one ledgered MERGE per epoch; the recompute reads the
post-epoch base table, so a re-delivered epoch recomputes identical
rows and the ledger makes the MERGE a no-op.

Reference parity: the platform recomputes its per-contact issue/status
read models whenever a contact's rows change
(/root/reference/backend/services/resolution.py) — this is that
recompute-on-touch semantic, pruned to the touched groups and run
distributed.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_group_rescan(
    store,
    keys: Sequence[str],
    affected: DataFrame,
    recompute: Callable[[DataFrame], DataFrame],
    epoch_id: str | int | None = None,
) -> dict:
    """Advance ``store`` by recomputing the affected groups only.

    ``affected``: the epoch's touched group keys (epoch-sized, carries
    exactly ``keys``). ``recompute(affected)`` must return the
    post-epoch store rows for those groups — the callable closes over
    the base table and is expected to prune its scan with the given
    frame (broadcast it; at scale the base table is bucketed by the
    group key so the join is also storage-pruned).
    """
    if epoch_id is not None and store.epoch_committed(epoch_id):
        return {"skipped": True, "epoch": str(epoch_id)}
    key_list = list(keys)
    aff = affected.select(*key_list).distinct().localCheckpoint(eager=False)
    rows = recompute(aff).localCheckpoint(eager=False)
    gone = aff.join(rows.hint("broadcast"), on=key_list, how="left_anti")
    batch = rows.withColumn("alive", F.lit(True)).unionByName(
        gone.withColumn("alive", F.lit(False)), allowMissingColumns=True
    )
    stats = store.merge(
        batch, key_list, epoch_id=epoch_id, delete_condition=~F.col("alive")
    )
    return {"store": stats, "epoch": str(epoch_id)}
