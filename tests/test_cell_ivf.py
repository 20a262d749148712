"""Cell-partitioned IVF index: partition-pruned probes + Δ-cell-rewrite
maintenance (operators/similarity.CellPartitionedIvf).

The maintained store must equal an index rebuilt from scratch on the
post-state, touch only the cells the epoch's vectors live in, drop
cells the epoch empties, and redeliver idempotently.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.similarity import (
    CellPartitionedIvf,
    ivf_index,
)
from data_ingestion_resolution_platform_spark.sources.lake import snapshot_diff

VEC_SCHEMA = "vec_id long, embedding array<float>"


def _vecs(spark):
    v1 = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),   # deleted in v2
            (3, [0.5, 0.5, 0.0, 0.0]),   # updated: vector moves cells
            (5, [0.9, 0.1, 0.0, 0.0]),
        ],
        VEC_SCHEMA,
    )
    v2 = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.5, 0.5]),
            (4, [0.0, 0.0, 0.0, 1.0]),   # inserted
            (5, [0.9, 0.1, 0.0, 0.0]),
        ],
        VEC_SCHEMA,
    )
    return v1, v2


def _index_rows(df):
    return sorted((r.neighbor_id, tuple(r.cq), r.cell) for r in df.collect())


def test_maintain_equals_rebuild_and_prunes(spark, tmp_path):
    v1, v2 = _vecs(spark)
    idx = CellPartitionedIvf(spark, str(tmp_path / "ivf"), n_cells=4, portable=True)
    idx.build(v1, "embedding", "vec_id", epoch_id="b1")
    # snapshot unaffected partitions' file mtimes
    before = {}
    for d in os.listdir(idx.data):
        if d.startswith("cell="):
            p = os.path.join(idx.data, d)
            before[d] = {f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)}
    changes = snapshot_diff(v1, v2, ["vec_id"], include_preimages=True)
    out = idx.maintain(changes, "embedding", "vec_id", epoch_id="e2")
    rebuilt = ivf_index(v2, "embedding", "vec_id", n_cells=4, portable=True)
    assert _index_rows(idx.read()) == _index_rows(rebuilt)
    # cells untouched by the epoch keep their exact files
    touched = {f"cell={c}" for c in out["cells"]}
    for d, files in before.items():
        if d in touched or d not in os.listdir(idx.data):
            continue
        p = os.path.join(idx.data, d)
        now = {f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)}
        assert now == files, f"unaffected partition {d} was rewritten"
    # the cells filter must reach the scan as PartitionFilters (the
    # probe plans as a partition-pruned read, not a full-index scan)
    import re

    cells = sorted({r.cell for r in rebuilt.collect()})[:2]
    plan = idx.read(cells)._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan
    # redelivery is a no-op
    assert idx.maintain(changes, "embedding", "vec_id", epoch_id="e2") == {
        "skipped": True,
        "epoch": "e2",
    }


def test_emptied_cell_partition_is_dropped(spark, tmp_path):
    # one lone vector in its own cell; deleting it must remove the
    # physical partition, not leave a stale row dynamic-overwrite skips
    v1, _ = _vecs(spark)
    idx = CellPartitionedIvf(spark, str(tmp_path / "ivf"), n_cells=4, portable=True)
    idx.build(v1, "embedding", "vec_id", epoch_id="b1")
    base = ivf_index(v1, "embedding", "vec_id", n_cells=4, portable=True)
    cell_of = {r.neighbor_id: r.cell for r in base.collect()}
    counts = {}
    for c in cell_of.values():
        counts[c] = counts.get(c, 0) + 1
    lone = [i for i, c in cell_of.items() if counts[c] == 1]
    assert lone, "fixture must contain a single-occupant cell"
    victim = lone[0]
    v2 = v1.filter(F.col("vec_id") != victim)
    changes = snapshot_diff(v1, v2, ["vec_id"], include_preimages=True)
    idx.maintain(changes, "embedding", "vec_id", epoch_id="e2")
    assert not os.path.exists(os.path.join(idx.data, f"cell={cell_of[victim]}"))
    rebuilt = ivf_index(v2, "embedding", "vec_id", n_cells=4, portable=True)
    assert _index_rows(idx.read()) == _index_rows(rebuilt)


def test_rewrite_is_idempotent_from_partial_state(spark, tmp_path):
    # simulate a crash AFTER the physical rewrite but BEFORE the ledger
    # record: redelivering the same epoch must converge, not double-apply
    v1, v2 = _vecs(spark)
    idx = CellPartitionedIvf(spark, str(tmp_path / "ivf"), n_cells=4, portable=True)
    idx.build(v1, "embedding", "vec_id", epoch_id="b1")
    changes = snapshot_diff(v1, v2, ["vec_id"], include_preimages=True)
    idx.maintain(changes, "embedding", "vec_id", epoch_id=None)  # no ledger mark
    idx.maintain(changes, "embedding", "vec_id", epoch_id="e2")  # full redelivery
    rebuilt = ivf_index(v2, "embedding", "vec_id", n_cells=4, portable=True)
    assert _index_rows(idx.read()) == _index_rows(rebuilt)
