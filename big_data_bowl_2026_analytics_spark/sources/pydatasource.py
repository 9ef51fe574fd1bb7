"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-events generator.

The reference's only sources are CSV files (reference
src/io/datasets.py:14-29). This adds the engine's extension point for
sources Spark has no built-in reader for (internal services, synthetic
load, custom formats): a ``DataSource`` subclass whose reader declares
explicit input partitions, so generation/ingest runs
partition-parallel across executors instead of driver-side.

Determinism: every cell is a pure function of ``event_id`` (splitmix64
bit mixer), so any (rows, partitions) layout yields the same table —
re-runs, retries, and different cluster sizes agree bit-for-bit.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 100000).option("partitions", 16).load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Public-domain splitmix64 mixer — a stateless PRNG keyed by id."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def synth_row(i: int) -> tuple[int, int, str, float]:
    h = _splitmix64(i)
    user_id = h % 1000
    etype = _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)]
    value = ((h >> 16) % 1_000_000) / 1000.0
    return (i, user_id, etype, value)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.partitions_n = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.rows // self.partitions_n))
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return _SyntheticEventsReader(self.options)
