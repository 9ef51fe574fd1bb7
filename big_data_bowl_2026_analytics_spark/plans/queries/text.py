"""Text / dedup pipeline queries (filled in incrementally)."""
