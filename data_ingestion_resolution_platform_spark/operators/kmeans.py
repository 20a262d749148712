"""Distributed k-means (Lloyd) over embedding columns — codebook
training for the IVF ANN index family (operators/similarity.py), the
classic Spark-MLlib-shaped plan in exact integer arithmetic.

Per iteration:

- **assign** is map-only: the k centroids are folded into the plan as
  literal arrays (k × dim longs — driver state bounded by the model,
  never the data), each row's nearest centroid computed via
  ``least(dist_j · k + j)`` in whole-stage codegen. The corpus is
  NEVER shuffled for assignment.
- **update** is ONE hash aggregation: per-dimension component sums +
  counts per cluster, map-side combined, shuffling k × (dim+1) longs
  per map task regardless of corpus size. The ≤ k-row result is
  collected (bounded) and becomes the next iteration's literals.

Exactness (what makes a DuckDB value-hash oracle possible): vectors
are quantized to longs (round(x·1000)); distances are integer dot
products; centroid updates use floor division ``sum // count``
(Python ``//`` ≡ the positive-mod formula the oracle SQL uses);
ties in assignment break toward the smaller cluster id via the
``dist·k + j`` encoding. Empty clusters keep their previous centroid.

At 100 TB: iterations cost one map-only pass + one tiny-payload
shuffle each; the only driver-side state is the k × dim codebook.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.functions.vectors import quantize_vector


def _dot_lit(qv: Column, c: list[int]) -> Column:
    """Exact integer dot product of a quantized vector column against a
    literal centroid (array of longs folded into the plan)."""
    arr = F.array(*[F.lit(int(x)).cast("long") for x in c])
    return F.aggregate(
        F.zip_with(qv, arr, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_fit_predict(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Train k centroids with ``iters`` Lloyd iterations and return the
    final assignment: ``(id_col, cluster int, dist long)`` where dist
    is the exact squared L2 distance in quantized integer space.

    Deterministic init: centroid j = the quantized vector of the
    smallest id with ``id % k == j``.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got k={k} iters={iters}")
    q = emb.select(
        F.col(id_col).alias("__vid"),
        quantize_vector(F.col(vec_col), scale).alias("__qv"),
    ).persist()
    try:
        seeds = (
            q.withColumn("__j", F.pmod(F.col("__vid"), F.lit(k)))
            .groupBy("__j")
            .agg(F.min_by("__qv", F.col("__vid")).alias("cv"))
        )
        # ids sparser than k leave some j unseeded: those clusters simply
        # never exist (assignment iterates the seeded ones only)
        cents: dict[int, list[int]] = {
            int(r["__j"]): [int(v) for v in r["cv"]] for r in seeds.collect()
        }
        if not cents:
            raise ValueError("kmeans_fit_predict: empty input")
        dim = len(next(iter(cents.values())))
        qq = F.aggregate(
            F.zip_with(F.col("__qv"), F.col("__qv"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

        def enc_expr() -> Column:
            # dist_j = |q|² - 2 q·c_j + |c_j|²; encode (dist, j) as
            # dist·k + j so least() breaks ties toward the smaller j
            terms = []
            for j in sorted(cents):
                c = cents[j]
                cc = sum(v * v for v in c)
                dist = qq - F.lit(2) * _dot_lit(F.col("__qv"), c) + F.lit(cc)
                terms.append(dist * F.lit(k) + F.lit(j))
            # F.least requires >= 2 columns; one seeded cluster (k=1, or
            # ids all in a single residue class mod k) is legal input
            return terms[0] if len(terms) == 1 else F.least(*terms)

        for _ in range(iters):
            asg = q.withColumn("__cl", F.pmod(enc_expr(), F.lit(k)))
            upd = asg.groupBy("__cl").agg(
                *[F.sum(F.col("__qv")[i]).alias(f"s{i}") for i in range(dim)],
                F.count(F.lit(1)).alias("n"),
            )
            for r in upd.collect():  # ≤ k rows (the codebook)
                n = int(r["n"])
                cents[int(r["__cl"])] = [int(r[f"s{i}"]) // n for i in range(dim)]

        enc = enc_expr()
        return q.select(
            F.col("__vid").alias(id_col),
            F.pmod(enc, F.lit(k)).cast("int").alias("cluster"),
            ((enc - F.pmod(enc, F.lit(k))) / F.lit(k)).cast("long").alias("dist"),
        )
    finally:
        q.unpersist()
