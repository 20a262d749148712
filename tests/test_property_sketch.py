"""Property-based sketch semantics: random small inputs vs pure-Python
oracles (same model as test_property_cdc — SURVEY.md §5 notes the
reference has no property tests; the sketches' merge/maintenance
algebra is exactly the kind of invariant worth fuzzing).

- kmv_sketch == python bottom-k of distinct mixed hashes
- merge homomorphism: sketch(A ∪ B) == kmv_merge(sketch(A), sketch(B))
- cms_cells == python counter grid; estimates never undercount
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.sketch import (
    HASH_SPACE,
    MIX_A,
    MIX_B,
    cms_cells,
    cms_seeds,
    kmv_merge,
    kmv_sketch,
)

K = 4

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.one_of(st.none(), st.text(alphabet="xy0", max_size=3)),
    ),
    min_size=1,
    max_size=14,
)


def _poly(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 131 + ord(c)) % HASH_SPACE
    return acc


def _kmv_py(rows):
    groups: dict[str, set[int]] = {}
    for g, v in rows:
        h = (_poly(v if v is not None else "") * MIX_A + MIX_B) % HASH_SPACE
        groups.setdefault(g, set()).add(h)
    return {g: sorted(hs)[:K] for g, hs in groups.items()}


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v string")


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy, cut=st.integers(0, 13))
def test_kmv_matches_oracle_and_merge_homomorphism(spark, rows, cut):
    got = {
        r["g"]: list(r["kmv"])
        for r in kmv_sketch(_df(spark, rows), ["g"], "v", k=K).collect()
    }
    assert got == _kmv_py(rows)
    # random split point: build halves independently, merge, compare
    a, b = rows[: cut % len(rows)], rows[cut % len(rows) :]
    if not a or not b:
        return
    sa = kmv_sketch(_df(spark, a), ["g"], "v", k=K).withColumnRenamed("kmv", "ka")
    sb = kmv_sketch(_df(spark, b), ["g"], "v", k=K).withColumnRenamed("kmv", "kb")
    empty = F.array().cast("array<bigint>")
    merged = sa.join(sb, "g", "full_outer").select(
        "g",
        kmv_merge(F.coalesce("ka", empty), F.coalesce("kb", empty), K).alias("kmv"),
    )
    assert {r["g"]: list(r["kmv"]) for r in merged.collect()} == _kmv_py(rows)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.text(alphabet="pq1", max_size=3), min_size=1, max_size=12),
    depth=st.integers(1, 3),
    width=st.sampled_from([4, 16]),
)
def test_cms_matches_oracle_and_never_undercounts(spark, vals, depth, width):
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_cells(df, F.col("x"), depth, width).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for v in vals:
        h = _poly(v)
        for d, (a, b) in enumerate(cms_seeds(depth)):
            cell = (d, ((h * a + b) % HASH_SPACE) % width)
            want[cell] = want.get(cell, 0) + 1
    assert got == want
    true = Counter(vals)
    for v, t in true.items():
        est = min(
            want[(d, ((_poly(v) * a + b) % HASH_SPACE) % width)]
            for d, (a, b) in enumerate(cms_seeds(depth))
        )
        assert est >= t
