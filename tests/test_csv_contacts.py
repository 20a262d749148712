"""Golden end-to-end CSV contact ingest — the reference suite's shape.

Mirrors the reference's fixture strategy (`uploads/test-*.csv`, see
SURVEY.md §5): one exemplar per issue class, silent-dedup vs conflict
distinction, pick-first winner semantics. Fixtures are authored here
(not copied) with the same semantic coverage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.cdc import (
    detect_conflicts,
    normalize_contacts,
    resolve_first,
)
from data_ingestion_resolution_platform_spark.sources.feed import read_contacts_csv


@pytest.fixture()
def csv_dir(tmp_path):
    return tmp_path


def _write(p, text):
    p.write_text(text, encoding="utf-8")
    return str(p)


def test_missing_email_column_rejected(spark, csv_dir):
    path = _write(csv_dir / "nohdr.csv", "name,company\nJohn,Acme\n")
    with pytest.raises(ValueError, match="email"):
        read_contacts_csv(spark, path)


def test_bom_header_tolerated(spark, csv_dir):
    path = _write(csv_dir / "bom.csv", "﻿email,first_name\na@b.co,Jo\n")
    df = read_contacts_csv(spark, path)
    assert df.count() == 1


def test_valid_file_no_issues(spark, csv_dir):
    """test-valid analogue: clean rows ⇒ zero issues, all finalized."""
    path = _write(
        csv_dir / "valid.csv",
        "email,first_name,last_name,company\n"
        "a@x.com,Al,Ada,Acme\n"
        "b@x.com,Bo,Bee,Bits\n"
        "c@x.com,Cy,Cee,Corp\n",
    )
    norm = normalize_contacts(read_contacts_csv(spark, path))
    assert norm.filter(~F.col("is_valid")).count() == 0
    final = resolve_first(
        norm.filter(F.col("is_valid")), ["normalized_email"], "_row_number"
    )
    assert final.count() == 3


def test_duplicates_conflict_vs_silent_dedup(spark, csv_dir):
    """test-duplicates analogue: same email + same identity ⇒ silent
    dedup (no conflict); same email + different identity ⇒ conflict
    with full candidate list."""
    path = _write(
        csv_dir / "dups.csv",
        "email,first_name,last_name,company\n"
        "same@x.com,Jo,Doe,Acme\n"
        "same@x.com,Jo,Doe,Acme\n"          # identical ⇒ silent dedup
        "diff@x.com,Jo,Doe,Acme\n"
        "diff@x.com,Jo,Doe,TechCo\n",        # company differs ⇒ conflict
    )
    norm = normalize_contacts(read_contacts_csv(spark, path))
    conf = detect_conflicts(
        norm, ["normalized_email"], F.col("signature"), "_row_number",
        candidate_cols=["first_name", "last_name", "company"],
    )
    rows = {r.normalized_email: r for r in conf.collect()}
    assert set(rows) == {"diff@x.com"}
    assert rows["diff@x.com"].n_signatures == 2
    assert len(rows["diff@x.com"].candidates) == 2
    # winner = first row in input order (reference pick-first)
    final = resolve_first(norm, ["normalized_email"], "_row_number")
    w = {r.normalized_email: r.company for r in final.collect()}
    assert w == {"same@x.com": "Acme", "diff@x.com": "Acme"}


def test_invalid_issue_classes(spark, csv_dir):
    """test-invalid analogue: one exemplar per issue type."""
    path = _write(
        csv_dir / "bad.csv",
        "email,first_name,last_name,company\n"
        ",Jo,Doe,Acme\n"                       # MISSING_EMAIL
        "notanemail,Jo,Doe,Acme\n"             # INVALID_EMAIL
        "two@x.com;three@x.com,Jo,Doe,Acme\n"  # multi-email ⇒ invalid
        "ok@x.com,,Doe,Acme\n"                 # MISSING_FIRST_NAME
        "ok2@x.com,Jo,,Acme\n"                 # MISSING_LAST_NAME
        "ok3@x.com,Jo,Doe,\n",                 # MISSING_COMPANY
    )
    norm = normalize_contacts(read_contacts_csv(spark, path))
    got = {
        r.email: set(r.issues)
        for r in norm.select(
            "email", "issues"
        ).collect()
    }
    assert got[None] == {"MISSING_EMAIL"}
    assert got["notanemail"] == {"INVALID_EMAIL_FORMAT"}
    assert got["two@x.com;three@x.com"] == {"INVALID_EMAIL_FORMAT"}
    assert got["ok@x.com"] == {"MISSING_FIRST_NAME"}
    assert got["ok2@x.com"] == {"MISSING_LAST_NAME"}
    assert got["ok3@x.com"] == {"MISSING_COMPANY"}


def test_normalization_comment_strip(spark, csv_dir):
    """P1: trailing parenthesized comment removed, case folded,
    whitespace collapsed — the reference's normalize_email."""
    path = _write(
        csv_dir / "norm.csv",
        "email,first_name,last_name,company\n"
        "  John.DOE@X.com (work)  ,Jo,Doe,Acme\n",
    )
    norm = normalize_contacts(read_contacts_csv(spark, path))
    assert norm.first().normalized_email == "john.doe@x.com"


def test_extra_columns_dropped_missing_null(spark, csv_dir):
    """P8/schema surface: extra CSV columns are ignored, absent
    optional columns read as NULL."""
    path = _write(
        csv_dir / "extra.csv",
        "email,first_name,nickname\na@x.com,Jo,Johnny\n",
    )
    df = read_contacts_csv(spark, path)
    row = df.first()
    assert row.email == "a@x.com" and row.last_name is None and row.company is None
    assert "nickname" not in df.columns
