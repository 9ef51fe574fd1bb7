"""Table writers.

The reference writes CSV per-week files by hand
(src/io/datasets.py:35-47, src/core/settings.py:57-58). Here the
weekly layout is a first-class ``partitionBy`` parquet write: readers
then prune partitions from predicates instead of resolving filename
templates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    sort_within_partitions: Sequence[str] | None = None,
) -> None:
    """Parquet sink; optional hive-style partitioning + in-file ordering.

    ``sort_within_partitions`` keeps row-group ordering (e.g. by
    (game_id, play_id, frame_id)) so min/max statistics stay selective
    for point lookups — the scalable replacement for the reference's
    sorted CSV output (tracking.py:529-536).
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink for raw-output parity (reference src/io/datasets.py:35-47)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format of text/training-data
    pipelines (one JSON document per line, splittable, appendable)."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — second columnar format (predicate pushdown + column
    pruning work identically to parquet through the same scan API)."""
    df.write.mode(mode).orc(path)
