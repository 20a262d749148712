"""Env-driven SparkSession conf overrides (SPARK_GRAFT_EXTRA_CONF)."""

from __future__ import annotations

from data_ingestion_resolution_platform_spark.session import _env_conf_pairs


def test_env_conf_pairs_basic():
    assert _env_conf_pairs(
        "spark.sql.parquet.compression.codec=zstd;spark.io.compression.codec=zstd"
    ) == [
        ("spark.sql.parquet.compression.codec", "zstd"),
        ("spark.io.compression.codec", "zstd"),
    ]


def test_env_conf_pairs_edges():
    assert _env_conf_pairs("") == []
    assert _env_conf_pairs(" ; ;") == []
    # value may itself contain '='; whitespace stripped
    assert _env_conf_pairs(" a.b = x=y ; ") == [("a.b", "x=y")]
    # key-less segments are dropped rather than producing ('', v)
    assert _env_conf_pairs("=v;k=1") == [("k", "1")]
