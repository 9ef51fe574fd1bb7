"""Bucketed-table helpers: pre-shuffled storage so repeated joins and
aggregations on the bucket key run with NO exchange.

At 100 TB the fact tables are written once, joined thousands of times;
bucketing both sides of a recurring join on the join key (same bucket
count) makes every subsequent join shuffle-free — the storage-level
equivalent of co-partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Save as a bucketed managed table (bucket metadata lives in the
    catalog, so only ``saveAsTable`` works — not path-based writes)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key: with matching
    bucket counts Catalyst plans a SortMergeJoin with zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
