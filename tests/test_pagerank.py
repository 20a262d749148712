"""Fixed-iteration PageRank (operators/graph.py::pagerank)."""

from __future__ import annotations

import pytest

from data_ingestion_resolution_platform_spark.operators.graph import pagerank


def _py_pagerank(nodes, edges, iters, d=0.85):
    n = len(nodes)
    out = {}
    succ = {}
    for s, t in set(edges):
        out[s] = out.get(s, 0) + 1
        succ.setdefault(s, []).append(t)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out)
        inflow = {v: 0.0 for v in nodes}
        for s, ts in succ.items():
            for t in ts:
                inflow[t] += r[s] / out[s]
        r = {v: (1 - d) / n + d * (inflow[v] + dm / n) for v in nodes}
    return r


def test_matches_reference_fold_with_dangling(spark):
    nodes = [1, 2, 3, 4]
    edges = [(1, 2), (2, 1), (2, 3), (1, 2)]  # dup edge; 3 and 4 dangling
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(ndf, edf, iterations=4).collect()}
    want = _py_pagerank(nodes, edges, 4)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)  # mass conserved


def test_symmetric_cycle_uniform(spark):
    nodes = [(1,), (2,), (3,)]
    edges = [(1, 2), (2, 3), (3, 1)]
    ndf = spark.createDataFrame(nodes, "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = [r.rank for r in pagerank(ndf, edf, iterations=6).collect()]
    for g in got:
        assert g == pytest.approx(1.0 / 3.0, abs=1e-12)
