"""Connected components (hash-min label propagation) semantics."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.graph import connected_components


def _cc(spark, edge_rows, **kw):
    e = spark.createDataFrame(edge_rows, "id_a long, id_b long")
    return {
        r["id"]: r["cluster_id"]
        for r in connected_components(e, **kw).collect()
    }


def _union_find_oracle(edge_rows):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_cc_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter > 1 forces real iteration), pair 10-11,
    # triangle 20-21-22
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    out = _cc(spark, edges)
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (a, b)
        for _ in range(150)
        for a, b in [sorted(rng.sample(nodes, 2))]
    ]
    out = _cc(spark, edges)
    assert out == _union_find_oracle(edges)


def test_cc_long_path_needs_many_iters(spark):
    # a 40-node path: hash-min needs ~log-to-diameter iterations; the
    # fixed point must still be exact
    edges = [(i, i + 1) for i in range(40)]
    out = _cc(spark, edges)
    assert set(out.values()) == {0}
    assert len(out) == 41
