"""util.local_df / util.empty_df: JVM VALUES relations replacing
pickled-RDD createDataFrame for metadata-sized frames.

The contract: identical rows/schema to spark.createDataFrame for the
supported flat types, but planned as a pure-JVM LocalRelation (no
Python worker fork — measured 7-11 s cold at parallelism=32).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from data_ingestion_resolution_platform_spark.util import empty_df, local_df


def test_local_df_matches_create_dataframe(spark):
    rows = [(1, "a", 1.5, True), (2, None, None, False), (None, "x", -0.25, None)]
    ddl = "i long, s string, d double, b boolean"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    key = lambda r: repr(tuple(r))  # noqa: E731 — None-safe sort
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


def test_local_df_escapes_quotes_and_backslashes(spark):
    rows = [(1, "it's"), (2, "a\\b"), (3, "x'y\\'z")]
    got = {r.i: r.s for r in local_df(spark, rows, "i int, s string").collect()}
    assert got == {1: "it's", 2: "a\\b", 3: "x'y\\'z"}


def test_local_df_nonfinite_floats(spark):
    import math

    rows = [(1, math.nan), (2, math.inf), (3, -math.inf), (4, 0.5)]
    got = {r.i: r.d for r in local_df(spark, rows, "i int, d double").collect()}
    assert math.isnan(got[1])
    assert got[2] == math.inf and got[3] == -math.inf and got[4] == 0.5


def test_local_df_struct_type_schema(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    out = local_df(spark, [(7, "q")], schema)
    # names and types match; nullability may be TIGHTER (non-null
    # literals plan as non-nullable — unions coerce, so this is safe)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in schema.fields
    ]
    assert out.collect()[0].asDict() == {"k": 7, "v": "q"}


def test_local_df_empty_rows(spark):
    out = local_df(spark, [], "i int, s string")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["i", "s"]


def test_local_df_is_jvm_local_relation(spark):
    plan = local_df(spark, [(1, "a")], "i int, s string")._jdf.queryExecution().analyzed().toString()
    assert "LocalRelation" in plan or "Project" in plan
    # the defining property: no Python evaluation anywhere in the plan
    assert "Python" not in plan


def test_local_df_rejects_unsupported_literal(spark):
    with pytest.raises(TypeError, match="unsupported literal"):
        local_df(spark, [((1, 2),)], "p string")


def test_no_create_dataframe_in_engine_package():
    """spark.createDataFrame(py_list) is banned in the engine package:
    its first action forks the Python worker pool (7-11 s cold), which
    round 2 measured as the dominant cost of otherwise sub-second
    queries. util.local_df / util.empty_df are the JVM-side
    replacements; tests may still use createDataFrame freely."""
    import os
    import re

    pkg = os.path.join(os.path.dirname(__file__), "..",
                       "data_ingestion_resolution_platform_spark")
    offenders = []
    for root, _, files in os.walk(pkg):
        for fn in files:
            # util.py is the sanctioned wrapper (mentions it in docs)
            if not fn.endswith(".py") or fn == "util.py":
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                src = f.read()
            # strip comments/docstring mentions: flag only call sites
            code = re.sub(r"#[^\n]*", "", src)
            if re.search(r"\.createDataFrame\s*\(", code):
                offenders.append(os.path.relpath(path, pkg))
    assert offenders == [], (
        f"createDataFrame call sites in engine package: {offenders}; "
        "use util.local_df / util.empty_df instead"
    )


def test_empty_df_any_schema(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("emb", T.ArrayType(T.FloatType()), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    out = empty_df(spark, schema)
    assert out.count() == 0
    assert [f.dataType for f in out.schema.fields] == [
        f.dataType for f in schema.fields
    ]
