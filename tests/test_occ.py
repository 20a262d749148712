"""Optimistic concurrency on the versioned lake: claim/conflict/retry."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.sources.lake import (
    CommitConflict,
    LakeTable,
)


@pytest.fixture(scope="module")
def spark():
    from data_ingestion_resolution_platform_spark.session import get_spark

    return get_spark("test_occ", parallelism=4)


def _df(spark, ids, val):
    return spark.createDataFrame(
        [(i, val) for i in ids], "id int, val string"
    )


def test_claim_blocks_stale_merge(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(_df(spark, [1, 2], "base"))
    # a concurrent writer holds the next version
    t.versions.claim(2)
    with pytest.raises(CommitConflict):
        t.merge(_df(spark, [3], "mine"), ["id"])
    # state unchanged, claim released by the (simulated) winner crashing
    assert t.read().count() == 2
    t.versions.release(2)
    t.merge(_df(spark, [3], "mine"), ["id"])
    assert t.read().count() == 3


def test_claim_requires_committed_base(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t2"))
    t.overwrite(_df(spark, [1], "base"))  # current == 1
    with pytest.raises(CommitConflict):
        t.versions.claim(3)  # base 2 not committed yet


def test_failed_write_releases_claim(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t3"))
    t.overwrite(_df(spark, [1], "base"))
    poisoned = _df(spark, [2], "x").withColumn(
        "boom", F.raise_error(F.lit("injected write failure"))
    )
    with pytest.raises(Exception, match="injected"):
        t.merge(poisoned, ["id"])
    # the claim must not wedge the table
    t.merge(_df(spark, [2], "ok"), ["id"])
    assert t.read().count() == 2


def test_concurrent_writers_converge_with_retry(spark, tmp_path):
    """N racing writers, each retrying on CommitConflict, all land."""
    t = LakeTable(spark, str(tmp_path / "t4"))
    t.overwrite(_df(spark, [0], "seed"))
    errors: list[Exception] = []

    def writer(i: int) -> None:
        batch = _df(spark, [100 + i], f"w{i}")
        for _ in range(50):
            try:
                t.merge(batch, ["id"])
                return
            except CommitConflict:
                time.sleep(0.05 * (i % 3 + 1))
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
        errors.append(RuntimeError(f"writer {i} never committed"))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    got = {r.id for r in t.read().collect()}
    assert got == {0, 100, 101, 102, 103, 104, 105}
