"""Skew-mitigation operators.

AQE's skew-join handling covers sort-merge joins at runtime; these
explicit forms cover the cases AQE can't see:

- ``salted_aggregation``: two-phase aggregation for hot grouping keys
  (a handful of group values would otherwise serialize into a few
  reducers). Phase 1 aggregates on (key, salt) spreading each hot key
  over N partitions; phase 2 merges the N partials per key. Identical
  results to a direct groupBy for sum/count/min/max (any commutative
  mergeable aggregate).
- ``salted_join``: replicate the small side N times with explicit
  salt, salt the large side's key randomly-but-deterministically, join
  on (key, salt) — every hot key spreads over N partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _det_salt(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic pseudo-random salt derived from row content:
    xxhash of all columns mod n (rand() would break retries/replays —
    a failed task would re-salt differently on re-execution)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_aggregation(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase groupBy for skewed/low-cardinality keys.

    ``aggs`` maps output column -> 'sum:col' | 'count' | 'min:col' |
    'max:col' (the mergeable subset; avg = sum+count at the call site).
    """
    salt = _det_salt(list(salt_source or df.columns), n_salts)
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            partial_exprs.append(fn(col).alias(f"_p_{out}"))
            merge = F.sum if op == "sum" else {"min": F.min, "max": F.max}[op]
            final_exprs.append(merge(f"_p_{out}").alias(out))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with explicit key salting: the small side is
    replicated ``n_salts`` times, the large side salts each row
    deterministically, and the join key becomes (key..., salt).

    The salt hashes the large side's NON-key columns (override with
    ``salt_source``): salting from the join keys themselves would give
    every row of a hot key the same salt and spread nothing. Payload
    hashing spreads a hot key across reducers as long as its rows
    vary, while staying deterministic per row (rand() would break
    task retries/replays under speculative execution)."""
    on = list(on)
    if salt_source is None:
        salt_source = [c for c in large.columns if c not in on] or on
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    large_salted = large.withColumn(
        "_salt", _det_salt(list(salt_source), n_salts)
    )
    joined = large_salted.join(small_rep, [*on, "_salt"], how)
    return joined.drop("_salt")
