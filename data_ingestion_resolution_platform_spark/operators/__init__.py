"""Composite dataflow operators.

- ``cdc``        change-feed resolution: LWW winners, conflict detection,
                 validation, apply-changes (the reference worker's dataflow).
- ``merge``      MERGE-INTO semantics over the parquet lake table.
- ``dedup``      exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                 embedding near-dup families.
- ``similarity`` brute-force + LSH-bucketed ANN over embeddings.
- ``skew``       salted two-phase aggregation helpers.
- ``multimodal`` binary-column decode/feature plumbing (Arrow-batched).
"""
