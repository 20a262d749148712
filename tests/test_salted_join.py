"""salted_join: row-identity with the plain join, even under heavy skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def spark():
    from data_ingestion_resolution_platform_spark.session import get_spark

    return get_spark("test_salted_join", parallelism=4)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows on ONE hot key + a uniform tail
    big = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_row_identity(spark, skewed, how):
    big, small = skewed
    # left-join coverage: drop some keys from the small side
    small = small.filter(F.col("k") % 7 != 3)
    salted = salted_join(big, small, ["k"], n_salt=8, how=how)
    plain = big.join(small, on=["k"], how=how)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark, skewed):
    big, small = skewed
    # phase-1 evidence: the hot key's rows carry all n_salt salt values,
    # i.e. its shuffle input is spread over n_salt reducer keys
    from data_ingestion_resolution_platform_spark.operators.skew import (
        SALT_COL,
        with_salt,
    )

    n = (
        with_salt(big.filter(F.col("k") == 1), 8)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert n == 8


def test_salted_join_rejects_unsupported_how(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="full")
