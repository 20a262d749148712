"""Property-based SCD2: random feeds vs a pure-Python interval oracle,
and epoch-split invariance of the incremental apply (the invariant the
lake-backed ``historize_epoch`` MERGE relies on)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_resolution_platform_spark.operators.scd import (
    scd2_apply_increment,
    scd2_history,
)

KEYS = ["k0", "k1"]
OPS = ["I", "U", "D"]
SCHEMA = "key string, lsn long, op string, attr string"

feed_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(OPS),
        st.one_of(st.none(), st.text(alphabet="ab", min_size=0, max_size=2)),
    ),
    min_size=0,
    max_size=10,
)


def oracle(rows):
    """Pure-Python SCD2: versions per key as (attr, from, to, current)."""
    by_key: dict[str, list[tuple[int, str, object]]] = {}
    for lsn, (key, op, attr) in enumerate(rows):
        by_key.setdefault(key, []).append((lsn, op, attr))
    out = set()
    for key, evs in by_key.items():
        bounds = []
        prev = None  # (op, attr) of previous event
        for lsn, op, attr in evs:
            is_boundary = (
                op == "D" or prev is None or prev[0] == "D" or attr != prev[1]
            )
            if is_boundary:
                bounds.append((lsn, op, attr))
            prev = (op, attr)
        for i, (lsn, op, attr) in enumerate(bounds):
            if op == "D":
                continue
            to = bounds[i + 1][0] if i + 1 < len(bounds) else None
            out.add((key, attr, lsn, to, 1 if to is None else 0))
    return out


def _spark_rows(spark, rows):
    data = [(k, lsn, op, attr) for lsn, (k, op, attr) in enumerate(rows)]
    return spark.createDataFrame(data, SCHEMA)


def _collect(df):
    return {
        (r["key"], r["attr"], r["valid_from_lsn"], r["valid_to_lsn"], r["is_current"])
        for r in df.collect()
    }


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=feed_strategy)
def test_scd2_matches_python_oracle(spark, rows):
    got = _collect(scd2_history(_spark_rows(spark, rows), ["key"], "lsn", ["attr"]))
    assert got == oracle(rows)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=feed_strategy, cut=st.integers(min_value=0, max_value=10))
def test_scd2_increment_split_invariance(spark, rows, cut):
    """scd2_history(prefix) advanced by scd2_apply_increment(delta)
    must equal scd2_history(whole), for EVERY split point."""
    cut = min(cut, len(rows))
    df_all = _spark_rows(spark, rows)
    prefix = df_all.filter(f"lsn < {cut}")
    delta = df_all.filter(f"lsn >= {cut}")
    hist = scd2_history(prefix, ["key"], "lsn", ["attr"])
    if delta.count() == 0:
        got = _collect(hist)
    else:
        open_v = hist.filter("is_current = 1")
        batch = scd2_apply_increment(open_v, delta, ["key"], "lsn", ["attr"])
        # emulate MERGE ON (key, valid_from_lsn): batch rows override
        merged = {
            (r["key"], r["valid_from_lsn"]): r for r in hist.collect()
        }
        for r in batch.collect():
            merged[(r["key"], r["valid_from_lsn"])] = r
        got = {
            (r["key"], r["attr"], r["valid_from_lsn"], r["valid_to_lsn"], r["is_current"])
            for r in merged.values()
        }
    assert got == oracle(rows)
