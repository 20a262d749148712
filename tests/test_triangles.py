"""Degree-oriented triangle counting (operators/graph.py triangle_count)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Row

from data_ingestion_resolution_platform_spark.operators.graph import triangle_count


def _run(spark, pairs):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])
    return triangle_count(df).collect()[0]


def test_known_graph(spark):
    pairs = [
        (1, 2), (2, 3), (1, 3),               # triangle -> 1
        (4, 5), (5, 6), (6, 7), (7, 4),        # square   -> 0
    ] + list(combinations([8, 9, 10, 11], 2))  # K4       -> 4
    # noise: duplicates, reversed duplicates, self-loops
    r = _run(spark, pairs + [(2, 1), (1, 2), (3, 3), (9, 8)])
    assert (r["n_triangles"], r["n_edges"]) == (5, 13)


def test_hub_star_has_no_triangles(spark):
    # a hub of degree 30 (the case naive wedge joins explode on)
    r = _run(spark, [(0, i) for i in range(1, 31)])
    assert (r["n_triangles"], r["n_edges"]) == (0, 30)


def test_matches_bruteforce_on_random_graph(spark):
    import random

    rng = random.Random(42)
    pairs = {(rng.randrange(25), rng.randrange(25)) for _ in range(120)}
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    brute = sum(
        1
        for x, y, z in combinations(sorted({n for e in und for n in e}), 3)
        if {(x, y), (x, z), (y, z)} <= und
    )
    r = _run(spark, sorted(pairs))
    assert (r["n_triangles"], r["n_edges"]) == (brute, len(und))
