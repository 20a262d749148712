"""Named query registry (driver contract + bench headline queries)."""
