"""Query registry: named engine queries paired with DuckDB oracles.

Every operator class from SURVEY.md §2 is exercised by at least one
named query over the driver's synthetic tables. A query is a
``(spark, sf_dir) -> DataFrame`` builder; its oracle is an ANSI-SQL
string DuckDB runs over the same parquet files. The driver compares
row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides,
- float aggregates are rounded identically on both sides,
- any top-k has a fully deterministic tie-break.

Queries without an oracle (``oracle=None``) are genuinely
non-SQL-expressible (iterative / stateful) and get the driver's weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryBuilder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryBuilder], QueryBuilder]:
    """Register a named query (decorator)."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once.
    from . import queries  # noqa: F401

    return dict(_REGISTRY)


def builders() -> dict[str, QueryBuilder]:
    return {name: spec.builder for name, spec in all_queries().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
