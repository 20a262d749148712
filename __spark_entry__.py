"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC apply-changes query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry from
``data_ingestion_resolution_platform_spark.plans.queries`` — since
round 4 every registered query (119/119 as of round 5) has a DuckDB
oracle twin; no rows-only entries remain.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_resolution_platform_spark.plans.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["cdc_apply_changes"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
