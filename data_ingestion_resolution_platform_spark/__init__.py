"""PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch re-expression of the semantics of the reference platform
``erkamkrs/data-ingestion-resolution-platform`` (see SURVEY.md) as idiomatic
PySpark: declarative DataFrame plans optimized by Catalyst, Structured
Streaming for the change feed, vectorized Arrow UDFs for the (rare) cases
built-ins cannot express.

Layout
------
- ``functions/``  pure Column-expression scalar functions (normalization,
  validation, text analysis, hashing, vector math) — JVM-side, codegen'd.
- ``operators/``  composite dataflow operators (CDC resolve/merge, dedup
  families, similarity search, skew-aware aggregation, multimodal plumbing).
- ``sources/``    change-feed synthesis + readers, parquet lake table with
  MERGE semantics and an exactly-once epoch ledger.
- ``streaming/``  Structured Streaming pipeline (foreachBatch exactly-once,
  lineage/metrics emission, schema evolution via Arrow reconciliation).
- ``plans/``      the named query registry backing ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
