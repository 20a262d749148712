"""Incremental MinHash-LSH: per-epoch pairs == full recompute restricted
to changed docs; index converges to the fresh-build state."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.dedup import (
    minhash_candidates,
)
from data_ingestion_resolution_platform_spark.operators.dedup_incremental import (
    build_minhash_index,
    incremental_minhash_epoch,
)
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable

MH = dict(k_shingle=3, num_hashes=16, num_bands=4)

BODY = "the quick brown fox jumps over the lazy dog again and again "
ALT = "pack my box with five dozen liquor jugs for the trip home now "


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_dict(df):
    return {(r.id_a, r.id_b): r.n_shared_bands for r in df.collect()}


def test_epoch_pairs_match_filtered_recompute(spark, tmp_path):
    v1 = [
        (1, BODY + "v one"),
        (2, BODY + "v two"),
        (3, ALT + "solo"),
        (4, ALT + "dup target"),
        (9, BODY + "stale version to be rewritten"),
    ]
    # epoch: insert 5 (near-dup of 4), update 9 (now near-dup of 1/2),
    # delete 3
    v2 = [
        (1, BODY + "v one"),
        (2, BODY + "v two"),
        (4, ALT + "dup target"),
        (5, ALT + "dup target!"),
        (9, BODY + "v nine"),
    ]
    changed = {5, 9, 3}
    idx = LakeTable(spark, str(tmp_path / "idx"))
    build_minhash_index(idx, _mk_docs(spark, v1), "text", "doc_id", epoch_id="seed", **MH)
    changes = _mk_docs(spark, [(5, ALT + "dup target!")]).withColumn(
        "change_type", F.lit("insert")
    ).unionByName(
        _mk_docs(spark, [(9, BODY + "v nine")]).withColumn(
            "change_type", F.lit("update_postimage")
        )
    ).unionByName(
        _mk_docs(spark, [(3, ALT + "solo")]).withColumn("change_type", F.lit("delete"))
    )
    got = _pairs_dict(
        incremental_minhash_epoch(idx, changes, "text", "doc_id", epoch_id="e1", **MH)
    )
    full = _pairs_dict(minhash_candidates(_mk_docs(spark, v2), "text", "doc_id", **MH))
    want = {p: n for p, n in full.items() if p[0] in changed or p[1] in changed}
    assert got == want
    assert got, "fixture should surface at least one pair"
    # no pair may touch the deleted doc
    assert all(3 not in p for p in got)


def test_index_converges_to_fresh_build(spark, tmp_path):
    v1 = [(i, BODY + f"v{i}") for i in range(6)]
    v2 = [(i, BODY + f"v{i}") for i in range(2, 6)] + [
        (2, ALT + "rewritten"),
        (10, ALT + "brand new"),
    ]
    v2 = {d: t for d, t in v2}  # doc 2 rewritten wins
    v2_rows = sorted(v2.items())
    idx = LakeTable(spark, str(tmp_path / "a"))
    build_minhash_index(idx, _mk_docs(spark, v1), "text", "doc_id", epoch_id="s", **MH)
    changes = (
        _mk_docs(spark, [(0, ""), (1, "")])
        .withColumn("change_type", F.lit("delete"))
        .unionByName(
            _mk_docs(spark, [(2, ALT + "rewritten")]).withColumn(
                "change_type", F.lit("update_postimage")
            )
        )
        .unionByName(
            _mk_docs(spark, [(10, ALT + "brand new")]).withColumn(
                "change_type", F.lit("insert")
            )
        )
    )
    incremental_minhash_epoch(idx, changes, "text", "doc_id", epoch_id="e1", **MH)
    fresh = LakeTable(spark, str(tmp_path / "b"))
    build_minhash_index(fresh, _mk_docs(spark, v2_rows), "text", "doc_id", **MH)
    a, b = idx.read(), fresh.read()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_epoch_redelivery_does_not_reapply_merge(spark, tmp_path):
    v1 = [(1, BODY), (2, ALT)]
    idx = LakeTable(spark, str(tmp_path / "idx"))
    build_minhash_index(idx, _mk_docs(spark, v1), "text", "doc_id", epoch_id="s", **MH)
    changes = _mk_docs(spark, [(3, BODY + "x")]).withColumn(
        "change_type", F.lit("insert")
    )
    incremental_minhash_epoch(idx, changes, "text", "doc_id", epoch_id="e1", **MH)
    v_after = idx.current_version()
    # same epoch re-delivered: index version must not advance
    incremental_minhash_epoch(idx, changes, "text", "doc_id", epoch_id="e1", **MH)
    assert idx.current_version() == v_after
    assert {r.doc for r in idx.read().select("doc").collect()} == {1, 2, 3}
