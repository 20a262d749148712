"""IVF over a trained k-means codebook: recall vs the seeded-hyperplane
codebook, and structural invariants of the index/probe frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.kmeans import kmeans_fit
from data_ingestion_resolution_platform_spark.operators.similarity import (
    brute_force_topk,
    ivf_kmeans_index,
    ivf_kmeans_topk,
    ivf_topk,
    kmeans_probe_cells,
)

SF01 = "/root/testdata/sf0.01"
N_CELLS, N_PROBE, K = 16, 4, 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF01}/embeddings.parquet")


def _recall(approx_rows, exact_rows) -> float:
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = tot = 0
    for q, nbrs in exact.items():
        got = {r["neighbor_id"] for r in approx_rows if r["query_id"] == q}
        tot += len(nbrs)
        hit += len(nbrs & got)
    return hit / tot


def test_kmeans_codebook_beats_hyperplane_recall(spark, emb):
    """The r3 verdict's done-criterion: at equal n_probe, trained cells
    must beat the modular/hyperplane seeding (0.60 vs 0.45 measured at
    these parameters — assert a conservative margin)."""
    queries = emb.filter(F.col("vec_id") < 50)
    exact = brute_force_topk(emb, queries, "embedding", "vec_id", k=K).collect()
    hyper = ivf_topk(
        emb, queries, "embedding", "vec_id", k=K,
        n_cells=N_CELLS, n_probe=N_PROBE, portable=True,
    ).collect()
    trained = ivf_kmeans_topk(
        emb, queries, "embedding", "vec_id", k=K,
        n_cells=N_CELLS, n_probe=N_PROBE, iters=2,
    ).collect()
    r_hyper = _recall(hyper, exact)
    r_trained = _recall(trained, exact)
    assert r_trained > r_hyper, (r_trained, r_hyper)
    assert r_trained >= 0.5


def test_index_cells_match_kmeans_assignment(spark, emb):
    from data_ingestion_resolution_platform_spark.operators.kmeans import kmeans_assign

    cents = kmeans_fit(emb, "embedding", "vec_id", k=N_CELLS, iters=2)
    idx = {
        r["neighbor_id"]: r["cell"]
        for r in ivf_kmeans_index(emb, cents, "embedding", "vec_id", N_CELLS).collect()
    }
    asg = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, cents, "embedding", "vec_id", k=N_CELLS).collect()
    }
    assert idx == asg


def test_probe_cells_nearest_first_and_bounded(spark, emb):
    cents = kmeans_fit(emb, "embedding", "vec_id", k=N_CELLS, iters=2)
    probes = kmeans_probe_cells(
        emb.filter(F.col("vec_id") < 5), cents, "embedding", "vec_id",
        N_CELLS, n_probe=N_PROBE,
    )
    per_q = (
        probes.groupBy("query_id")
        .agg(F.count("*").alias("n"), F.countDistinct("cell").alias("d"))
        .collect()
    )
    assert all(r["n"] == N_PROBE and r["d"] == N_PROBE for r in per_q)
    # the query's own cell (its nearest centroid) is always probed
    asg_cells = {
        r["neighbor_id"]: r["cell"]
        for r in ivf_kmeans_index(
            emb.filter(F.col("vec_id") < 5), cents, "embedding", "vec_id", N_CELLS
        ).collect()
    }
    probed = {}
    for r in probes.collect():
        probed.setdefault(r["query_id"], set()).add(r["cell"])
    for q, own in asg_cells.items():
        assert own in probed[q]
