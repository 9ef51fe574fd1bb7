"""Embedding similarity queries (filled in incrementally)."""
