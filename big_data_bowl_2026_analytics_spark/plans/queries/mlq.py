"""ML scoring/evaluation queries (filled in incrementally)."""
