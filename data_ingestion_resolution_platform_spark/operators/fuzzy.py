"""Blocked fuzzy-match join for entity resolution (SURVEY.md §2 dedup
family; reference semantics: `backend/worker.py`'s duplicate detection,
generalized from exact signature equality to bounded edit distance).

All-pairs similarity is O(n²) and never survives scale. The standard
entity-resolution answer is *blocking*: only rows sharing a cheap
deterministic blocking key are compared, so the join is a plain
equi-shuffle on the block key and the quadratic term is bounded by the
largest block, not the table.

Scale notes (100 TB): one shuffle on the block columns; the expensive
``levenshtein`` runs JVM-side inside whole-stage codegen, gated behind
a cheap length-difference pre-filter (edit distance ≥ |len(a)-len(b)|,
so the conjunct order prunes most pairs before the DP kicks in). Hot
blocks are a data-quality smell (a blocking key shared by millions of
rows compares nothing useful); mitigate by refining the key — add a
length bucket via ``length_bucket`` — rather than salting, since the
semantics *require* co-locating the whole block.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def length_bucket(col: Column, width: int = 4) -> Column:
    """Blocking refinement: rows whose lengths differ by more than
    ``max_dist`` can't be within ``max_dist`` edits, so bucketing by
    length(width ≥ 2·max_dist) loses no true pair across at most two
    adjacent buckets. Callers who need exact recall under bucketing
    join each row to its own and the next bucket."""
    return (F.length(col) / F.lit(width)).cast("int")


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Candidate near-duplicate pairs within blocks: (id_a < id_b,
    levenshtein(text_a, text_b) ≤ max_dist). Output columns:
    ``block_cols…, id_a, id_b, text_a, text_b, extra pairs…,
    edit_dist``."""
    keep = [id_col, text_col, *extra_cols]
    a = df.select(
        *block_cols, *[F.col(c).alias(f"{c}_a") for c in keep]
    )
    b = df.select(
        *block_cols, *[F.col(c).alias(f"{c}_b") for c in keep]
    )
    dist = F.levenshtein(F.col(f"{text_col}_a"), F.col(f"{text_col}_b"))
    pairs = (
        a.join(b, on=list(block_cols))
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        # cheap bound first: |len difference| ≤ max_dist is necessary
        .filter(
            F.abs(
                F.length(F.col(f"{text_col}_a")) - F.length(F.col(f"{text_col}_b"))
            )
            <= F.lit(max_dist)
        )
        .filter(dist <= F.lit(max_dist))
    )
    return pairs.select(
        *block_cols,
        F.col(f"{id_col}_a").alias("id_a"),
        F.col(f"{id_col}_b").alias("id_b"),
        F.col(f"{text_col}_a").alias("text_a"),
        F.col(f"{text_col}_b").alias("text_b"),
        *[F.col(f"{c}_a").alias(f"{c}_a") for c in extra_cols],
        *[F.col(f"{c}_b").alias(f"{c}_b") for c in extra_cols],
        dist.alias("edit_dist"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    block_cols: Sequence[str],
    max_dist: int,
) -> DataFrame:
    """Two-table blocked fuzzy join: every (left, right) pair sharing
    the block key with edit distance ≤ ``max_dist``, plus the distance
    as ``edit_dist``. Caller projects/aliases columns; both inputs must
    carry ``block_cols`` and disjoint non-block column names — enforced
    up front, because a silent duplicate column would make every
    downstream reference ambiguous (and ``edit_dist`` is reserved)."""
    overlap = (set(left.columns) & set(right.columns)) - set(block_cols)
    if overlap:
        raise ValueError(
            f"fuzzy_join requires disjoint non-block column names; "
            f"colliding: {sorted(overlap)}"
        )
    if "edit_dist" in (*left.columns, *right.columns):
        raise ValueError("'edit_dist' is reserved for the output distance")
    dist = F.levenshtein(F.col(left_text), F.col(right_text))
    return (
        left.join(right, on=list(block_cols))
        .filter(
            F.abs(F.length(F.col(left_text)) - F.length(F.col(right_text)))
            <= F.lit(max_dist)
        )
        .filter(dist <= F.lit(max_dist))
        .withColumn("edit_dist", dist)
    )
