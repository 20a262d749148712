"""Property-based maintained dup clusters: random epoch sequences
(inserts, neighbor-rewriting updates, deletes) driven through the
lake-backed `maintain_clusters`, checked against a pure-Python
union-find oracle over the surviving pair set.

The generator owns the ground truth the operator contract assumes:
per epoch, a pair survives iff both endpoints are untouched, or it is
re-emitted in the epoch's delta (pairs touching a changed doc are
stale by definition); delta = exactly the post-epoch pairs touching a
changed doc. The final labels table must equal min-id connected
components over the surviving pairs, singletons included.
"""

from __future__ import annotations

import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_resolution_platform_spark.operators.graph_incremental import (
    build_cluster_state,
    maintain_clusters,
)
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

N_SEED = 6  # seed universe: nodes 0..5
N_POOL = 12  # later inserts drawn from 6..11


# one epoch = (removals ⊆ live, {changed node -> neighbor picks})
epoch_strategy = st.tuples(
    st.sets(st.integers(0, N_POOL - 1), max_size=2),
    st.dictionaries(
        st.integers(0, N_POOL - 1),
        st.sets(st.integers(0, N_POOL - 1), max_size=3),
        max_size=3,
    ),
)

seed_edges_strategy = st.sets(
    st.tuples(st.integers(0, N_SEED - 1), st.integers(0, N_SEED - 1)),
    max_size=6,
)


def _canon(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def _oracle(live, edges):
    parent = {n: n for n in live}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {(n, find(n)) for n in live}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=seed_edges_strategy,
    epochs=st.lists(epoch_strategy, min_size=1, max_size=2),
)
def test_maintained_equals_union_find(spark, tmp_path_factory, seed, epochs):
    root = str(tmp_path_factory.mktemp("ccp"))
    shutil.rmtree(root, ignore_errors=True)
    labels = LakeTable(spark, root + "/labels")
    edge_store = LakeTable(spark, root + "/edges")

    live = set(range(N_SEED))
    edges = _canon(seed)
    build_cluster_state(
        labels,
        edge_store,
        spark.createDataFrame(
            [(a, b) for a, b in edges] or [], "id_a long, id_b long"
        ),
        spark.createDataFrame([(n,) for n in live], "doc_id long"),
        epoch_id="seed",
    )

    for i, (removals, changes) in enumerate(epochs):
        removals = removals & live
        # a changed node is live after the epoch; drop changes that this
        # same epoch removes, then apply the contract's edge algebra
        changes = {u: nbrs for u, nbrs in changes.items() if u not in removals}
        live = (live - removals) | set(changes)
        touched = removals | set(changes)
        post_changed = _canon(
            (u, v)
            for u, nbrs in changes.items()
            for v in nbrs
            if v in live and v != u
        )
        edges = {
            e for e in edges if not (set(e) & touched)
        } | post_changed
        delta = spark.createDataFrame(
            [(a, b) for a, b in post_changed] or [], "id_a long, id_b long"
        )
        maintain_clusters(
            labels,
            edge_store,
            delta,
            spark.createDataFrame([(u,) for u in changes] or [], "doc_id long"),
            spark.createDataFrame([(r,) for r in removals] or [], "doc_id long"),
            epoch_id=f"e{i}",
        )

    got = {
        (r.id, r.cluster_id)
        for r in labels.read().select("id", "cluster_id").collect()
    }
    assert got == _oracle(live, edges)
    surviving = {
        (r.id_a, r.id_b) for r in edge_store.read().select("id_a", "id_b").collect()
    }
    assert surviving == edges
