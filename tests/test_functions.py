"""Parity tests: Spark column expressions vs a Python oracle for the
reference's scalar semantics (SURVEY.md §2.2, §5 layer 1).

The oracle functions below are independent re-implementations of the
*documented behavior* (strip/lower/comment-strip/collapse; length/
separator/regex email validation) — used only as test oracles.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.functions import (
    clean_field,
    identity_signature,
    is_valid_email_format,
    normalize_email,
)

EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")


def oracle_normalize(email):
    if not email:
        return None
    e = re.sub(r"\s*\(.*?\)\s*$", "", email.strip().lower())
    e = " ".join(e.split())
    return e or None


def oracle_valid(email):
    if not email or len(email) > 254:
        return False
    if ";" in email or "," in email:
        return False
    return bool(EMAIL_RE.match(email))


def oracle_clean(v):
    if not v:
        return None
    return " ".join(v.strip().split()) or None


NORMALIZE_CASES = [
    "  John@Example.COM  ",
    "john@example.com (work)",
    "john@example.com (work) (home)",
    "",
    None,
    "a  b@c.com",
    "UPPER@CASE.ORG\t",
    "x@y.z (unclosed",
    "   ",
    "tab\there@x.co",
]

VALID_CASES = [
    "john@example.com",
    "john.doe+tag@sub.example.co",
    "john@@example.com",
    "john@example..com",
    "a@b",
    "@example.com",
    "john@",
    "two@a.com;three@b.com",
    "two@a.com,three@b.com",
    "no-at-sign.com",
    "x" * 250 + "@a.com",
    "john doe@example.com",
    None,
    "",
]


@pytest.fixture(scope="module")
def results(spark):
    rows = [(e,) for e in set(NORMALIZE_CASES) | set(VALID_CASES) if True]
    df = spark.createDataFrame(rows, "email string")
    out = df.select(
        "email",
        normalize_email(F.col("email")).alias("norm"),
        is_valid_email_format(F.col("email")).alias("valid"),
        clean_field(F.col("email")).alias("clean"),
    ).collect()
    return {r["email"]: r for r in out}


def test_normalize_parity(results):
    for case in NORMALIZE_CASES:
        assert results[case]["norm"] == oracle_normalize(case), repr(case)


def test_valid_email_parity(results):
    for case in VALID_CASES:
        got = results[case]["valid"]
        assert bool(got) == oracle_valid(case), repr(case)


def test_clean_field_parity(results):
    for case in NORMALIZE_CASES:
        assert results[case]["clean"] == oracle_clean(case), repr(case)


def test_identity_signature(spark):
    df = spark.createDataFrame(
        [("  John ", "DOE", None), (None, "", " Acme Inc ")],
        "first_name string, last_name string, company string",
    )
    rows = df.select(
        identity_signature(F.col("first_name"), F.col("last_name"), F.col("company")).alias("sig")
    ).collect()
    assert rows[0]["sig"].asDict() == {"fn": "john", "ln": "doe", "co": ""}
    assert rows[1]["sig"].asDict() == {"fn": "", "ln": "", "co": "acme inc"}
