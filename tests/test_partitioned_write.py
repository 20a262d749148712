"""Directory (identity) partitioning: write partitionBy → pruned scan.

The hash-bucket layout (``PartitionedLakeTable``) and footer-stats
skipping (``sources/skipping.py``) cover key- and range-pruning; this
covers Spark's NATIVE directory-partition pruning — the Iceberg
identity-transform analogue (``PARTITIONED BY (month)``): a filter on
the partition column must reach the scan as ``PartitionFilters`` so
non-matching directories are never listed into the scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def parted(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parted") / "events")
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    ev.write.partitionBy("month").parquet(out)
    return spark, out, ev


def test_partition_filter_reaches_scan(parted):
    spark, out, ev = parted
    df = spark.read.parquet(out).filter(F.col("month") == "2024-01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the month predicate must be a partition filter, not a data filter
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "month" in pf
    expected = ev.filter(F.col("month") == "2024-01").count()
    assert df.count() == expected > 0


def test_non_partition_filter_still_pushed(parted):
    spark, out, ev = parted
    df = spark.read.parquet(out).filter(
        (F.col("month") == "2024-01") & (F.col("value") >= 50.0)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(value), GreaterThanOrEqual(value,50.0)" in plan
    expected = ev.filter(
        (F.col("month") == "2024-01") & (F.col("value") >= 50.0)
    ).count()
    assert df.count() == expected
