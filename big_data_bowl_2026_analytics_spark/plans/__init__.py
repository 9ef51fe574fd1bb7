from .registry import QuerySpec, all_queries, builders, oracles, query

__all__ = ["QuerySpec", "all_queries", "builders", "oracles", "query"]
