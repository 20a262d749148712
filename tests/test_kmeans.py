"""Distributed k-means: exactness, empty clusters, determinism."""

from __future__ import annotations

import pytest

from data_ingestion_resolution_platform_spark.operators.kmeans import kmeans_fit_predict


def _py_kmeans(vecs: dict[int, list[int]], k: int, iters: int):
    """Reference single-node implementation of the same exact-integer
    algorithm (quantization assumed already applied)."""
    cents = {}
    for j in range(k):
        ids = sorted(i for i in vecs if i % k == j)
        if ids:
            cents[j] = list(vecs[ids[0]])

    def assign():
        out = {}
        for i, v in vecs.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)) * k + j)
                for j, c in sorted(cents.items())
            )
            out[i] = (best % k, (best - best % k) // k)
        return out

    for _ in range(iters):
        asg = assign()
        sums: dict[int, list[int]] = {}
        cnts: dict[int, int] = {}
        for i, (cl, _) in asg.items():
            s = sums.setdefault(cl, [0] * len(vecs[i]))
            for d, x in enumerate(vecs[i]):
                s[d] += x
            cnts[cl] = cnts.get(cl, 0) + 1
        for cl, s in sums.items():
            cents[cl] = [x // cnts[cl] for x in s]
    return assign()


@pytest.fixture(scope="module")
def emb(spark):
    # three tight groups in 4-d (values pre-scaled so quantization by
    # 1000 reproduces them exactly: x/1000 floats)
    raw = {
        0: [100, 0, 0, 0], 3: [110, 0, 0, 0], 6: [90, 0, 0, 0],
        1: [0, 500, 0, 0], 4: [0, 510, 0, 0],
        2: [0, 0, -300, 0], 5: [0, 0, -310, 0], 7: [0, 0, -290, 10],
    }
    rows = [(i, [x / 1000.0 for x in v]) for i, v in raw.items()]
    return raw, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.parametrize("k,iters", [(3, 1), (3, 2), (4, 2)])
def test_kmeans_matches_reference_impl(emb, k, iters):
    raw, df = emb
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_fit_predict(df, "embedding", "vec_id", k=k, iters=iters).collect()
    }
    assert got == _py_kmeans(raw, k, iters)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=4 but only 2 distinct points: two clusters go empty after the
    # first assignment; their centroids must carry forward (no NULLs,
    # no crash) and every row still lands on its nearest centroid
    rows = [(i, [1.0, 0.0] if i % 2 else [0.0, 1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_fit_predict(df, "embedding", "vec_id", k=4, iters=2).collect()
    assert len(out) == 8
    assert all(r["dist"] is not None and r["dist"] >= 0 for r in out)
    # the two point groups never share a cluster
    by_group = {0: set(), 1: set()}
    for r in out:
        by_group[r["vec_id"] % 2].add(r["cluster"])
    assert by_group[0].isdisjoint(by_group[1])


def test_kmeans_duplicate_points_tie_deterministically(spark):
    rows = [(i, [1.0, 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_fit_predict(df, "embedding", "vec_id", k=3, iters=1).collect()
    # all identical points: same dist everywhere, ties break to the
    # smallest cluster id — one cluster takes everything
    assert {r["cluster"] for r in out} == {0}
    assert {r["dist"] for r in out} == {0}


def test_kmeans_pandas_assign_bit_identical(emb):
    """The Arrow fallback must reproduce the codegen path exactly —
    same integer arithmetic, same (dist, j) tie-break encoding."""
    raw, df = emb
    a = sorted(
        map(tuple, kmeans_fit_predict(
            df, "embedding", "vec_id", k=3, iters=2, assign_mode="expr"
        ).collect())
    )
    b = sorted(
        map(tuple, kmeans_fit_predict(
            df, "embedding", "vec_id", k=3, iters=2, assign_mode="pandas"
        ).collect())
    )
    assert a == b


def test_kmeans_large_k_auto_falls_back_to_pandas(spark, sf_dir):
    """k=256 × dim=64 = 16384 > CODEGEN_KDIM_LIMIT: auto must route to
    the Arrow path (an unrolled least() at this size overruns codegen's
    method limit) and the job must plan + run end-to-end."""
    from data_ingestion_resolution_platform_spark.operators.kmeans import (
        CODEGEN_KDIM_LIMIT,
        kmeans_fit,
        kmeans_assign,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = 256
    assert k * 64 > CODEGEN_KDIM_LIMIT
    cents = kmeans_fit(emb, "embedding", "vec_id", k=k, iters=1)
    assert len(cents) >= 1 and all(len(c) == 64 for c in cents.values())
    out = kmeans_assign(emb, cents, "embedding", "vec_id", k=k)
    # the fallback plan must not contain the unrolled least() chain
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "least(" not in plan
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(r["dist"] >= 0 for r in rows)


def test_kmeans_fit_assign_composition_matches_fit_predict(emb):
    from data_ingestion_resolution_platform_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_fit,
    )

    raw, df = emb
    cents = kmeans_fit(df, "embedding", "vec_id", k=3, iters=2)
    via_parts = sorted(
        map(tuple, kmeans_assign(df, cents, "embedding", "vec_id", k=3).collect())
    )
    direct = sorted(
        map(tuple, kmeans_fit_predict(df, "embedding", "vec_id", k=3, iters=2).collect())
    )
    assert via_parts == direct
