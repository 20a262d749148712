"""Structured Streaming layer: exactly-once CDC pipeline, lineage,
Arrow-schema reconciliation."""
