"""Incrementally-maintained inverted index (`operators/search.py
maintain_search_index`): after any invertible change-feed epoch the four
index tables — postings (term, doc, tf), termstats (term, df, cf),
doclen, global stats — must equal a from-scratch build over the live
corpus, BM25 served from the index must equal BM25 over the corpus, and
redelivering a committed epoch must be a no-op everywhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_resolution_platform_spark.operators.search import (
    bm25_from_index,
    bm25_topk,
    doc_lengths,
    maintain_search_index,
    postings,
    seed_search_index,
)
from data_ingestion_resolution_platform_spark.sources.lake import LakeTable


def _tables(spark, root):
    return (
        LakeTable(spark, f"{root}/postings"),
        LakeTable(spark, f"{root}/termstats"),
        LakeTable(spark, f"{root}/doclen"),
        LakeTable(spark, f"{root}/stats"),
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _assert_equals_rebuild(p, ts, dl, st, corpus):
    want_p = postings(corpus).select(
        "term", "doc_id", F.col("tf").cast("long").alias("_mult")
    )
    assert p.read().exceptAll(want_p).count() == 0
    assert want_p.exceptAll(p.read()).count() == 0
    want_ts = want_p.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("_mult").cast("long").alias("cf"),
    )
    assert ts.read().exceptAll(want_ts).count() == 0
    assert want_ts.exceptAll(ts.read()).count() == 0
    want_dl = doc_lengths(corpus)
    assert dl.read().exceptAll(want_dl).count() == 0
    assert want_dl.exceptAll(dl.read()).count() == 0
    got = st.read().collect()[0]
    want = want_dl.agg(F.count("*"), F.sum("dl")).collect()[0]
    assert (got.n_docs, got.sum_dl) == (want[0], want[1])


V1 = [
    (1, "the quick brown fox"),
    (2, "the lazy dog sleeps"),
    (3, "quick quick quick drill"),
    (4, "ghost doc to delete entirely"),
]
# epoch: update doc 2 (drops 'lazy', adds 'brown'), delete doc 4
# (kills 'ghost'/'entirely' postings and their terms), insert doc 5
# (new term 'zebra', bumps df of 'the')
CHANGES = [
    (2, "the lazy dog sleeps", "update_preimage"),
    (2, "the brown dog runs", "update_postimage"),
    (4, "ghost doc to delete entirely", "delete"),
    (5, "zebra the striped one", "insert"),
]
FINAL = [
    (1, "the quick brown fox"),
    (2, "the brown dog runs"),
    (3, "quick quick quick drill"),
    (5, "zebra the striped one"),
]


def test_maintained_index_equals_rebuild(spark, tmp_path):
    p, ts, dl, st = _tables(spark, str(tmp_path))
    seed_search_index(p, ts, dl, st, _docs(spark, V1))
    _assert_equals_rebuild(p, ts, dl, st, _docs(spark, V1))
    changes = spark.createDataFrame(
        CHANGES, "doc_id long, text string, change_type string"
    )
    maintain_search_index(p, ts, dl, st, changes, epoch_id="e1")
    final = _docs(spark, FINAL)
    _assert_equals_rebuild(p, ts, dl, st, final)
    # zero-crossing checks by hand: 'ghost' must be gone from termstats,
    # 'lazy' gone (last occurrence died), 'zebra' present with df=1,
    # 'the' df grew to 3
    got = {r.term: (r.df, r.cf) for r in ts.read().collect()}
    assert "ghost" not in got and "lazy" not in got
    assert got["zebra"] == (1, 1)
    assert got["the"] == (3, 3)
    assert got["quick"] == (2, 4)


def test_maintained_index_redelivery_noop(spark, tmp_path):
    p, ts, dl, st = _tables(spark, str(tmp_path))
    seed_search_index(p, ts, dl, st, _docs(spark, V1))
    changes = spark.createDataFrame(
        CHANGES, "doc_id long, text string, change_type string"
    )
    maintain_search_index(p, ts, dl, st, changes, epoch_id="e1")
    before = {
        t.root: sorted(map(tuple, t.read().collect())) for t in (p, ts, dl, st)
    }
    out = maintain_search_index(p, ts, dl, st, changes, epoch_id="e1")
    assert out.get("skipped")
    after = {
        t.root: sorted(map(tuple, t.read().collect())) for t in (p, ts, dl, st)
    }
    assert before == after


def test_bm25_from_index_equals_corpus_bm25(spark, tmp_path):
    p, ts, dl, st = _tables(spark, str(tmp_path))
    seed_search_index(p, ts, dl, st, _docs(spark, V1))
    changes = spark.createDataFrame(
        CHANGES, "doc_id long, text string, change_type string"
    )
    maintain_search_index(p, ts, dl, st, changes, epoch_id="e1")
    queries = [(1, "quick brown"), (2, "zebra"), (3, "the dog")]
    got = bm25_from_index(spark, p, ts, dl, st, queries, k=3)
    want = bm25_topk(_docs(spark, FINAL), queries, k=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_half_committed_epoch_raises(spark, tmp_path):
    """stats/doclen committed but the maintain_distinct pair not yet:
    redelivery must still converge (their ledgers no-op, the term-level
    maintenance runs); the REVERSE half-state (postings committed,
    termstats not) is maintain_distinct's own guarded invariant."""
    p, ts, dl, st = _tables(spark, str(tmp_path))
    seed_search_index(p, ts, dl, st, _docs(spark, V1))
    changes = spark.createDataFrame(
        CHANGES, "doc_id long, text string, change_type string"
    )
    # simulate the crash: commit stats + doclen only, as the real call
    # would right before maintain_distinct
    from data_ingestion_resolution_platform_spark.operators.search import (
        maintain_search_index as msi,
    )
    import data_ingestion_resolution_platform_spark.operators.ivm as ivm

    orig = ivm.maintain_distinct

    def boom(*a, **kw):
        raise RuntimeError("crash before term-level maintenance")

    ivm.maintain_distinct = boom
    try:
        with pytest.raises(RuntimeError, match="crash before"):
            msi(p, ts, dl, st, changes, epoch_id="e1")
    finally:
        ivm.maintain_distinct = orig
    # redelivery completes the epoch and converges to the rebuild
    maintain_search_index(p, ts, dl, st, changes, epoch_id="e1")
    _assert_equals_rebuild(p, ts, dl, st, _docs(spark, FINAL))
