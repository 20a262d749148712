"""Bucketed co-located joins: correctness + the no-Exchange plan claim."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.sources.bucketed import (
    ensure_bucketed,
    write_bucketed,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from data_ingestion_resolution_platform_spark.session import get_spark

    return get_spark("test_bucketed", parallelism=4)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def test_bucketed_join_no_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(
        orders, "tb_orders", str(tmp_path / "o"), ["o_custkey"], 4,
        sort_cols=["o_custkey"],
    )
    write_bucketed(
        customer, "tb_customer", str(tmp_path / "c"), ["c_custkey"], 4,
        sort_cols=["c_custkey"],
    )
    bo, bc = spark.table("tb_orders"), spark.table("tb_customer")
    # force SMJ so the Exchange count reflects the join distribution
    # requirement, not a broadcast dodge
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
            "o_orderkey", "c_name"
        )
        # both sides pre-bucketed on the join key: the join itself needs
        # zero shuffles; the plain path shuffles both sides
        assert _exchanges(bucketed) == 0
        assert _exchanges(plain) >= 2
        # same rows either way
        assert bucketed.exceptAll(plain).count() == 0
        assert plain.exceptAll(bucketed).count() == 0
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(orders, "tb_o2", str(tmp_path / "o2"), ["o_custkey"], 4)
    agg = spark.table("tb_o2").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert _exchanges(agg) == 0
    plain_agg = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert _exchanges(plain_agg) == 1
    assert agg.exceptAll(plain_agg).count() == 0


def test_ensure_bucketed_reuses_files(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    path = str(tmp_path / "reuse")
    df1 = ensure_bucketed(
        spark, "tb_reuse", path, ["o_custkey"], 4, lambda: orders
    )
    n1 = df1.count()
    files1 = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    # second call: spec matches → no rewrite (same files), table re-read
    # through the catalog still carries the bucket spec
    spark.sql("DROP TABLE tb_reuse")  # simulate a fresh session's catalog
    df2 = ensure_bucketed(
        spark, "tb_reuse", path, ["o_custkey"], 4,
        lambda: orders.limit(0),  # builder only used for schema here
    )
    files2 = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    assert files1 == files2
    assert df2.count() == n1
    agg = df2.groupBy("o_custkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_ensure_bucketed_respec_rewrites(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    path = str(tmp_path / "respec")
    ensure_bucketed(spark, "tb_respec", path, ["o_custkey"], 2, lambda: orders)
    df = ensure_bucketed(
        spark, "tb_respec", path, ["o_custkey"], 8, lambda: orders
    )
    assert df.count() == orders.count()
