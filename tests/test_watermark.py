"""Late-data semantics: a watermarked streaming aggregate must count
late-but-within-watermark events and drop too-late ones, across query
restarts sharing a checkpoint."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from big_data_bowl_2026_analytics_spark.streaming import (
    hourly_event_aggregates,
    read_events_stream,
)

_HOUR_NS = 3_600_000_000_000
_BASE = 1_700_000_000_000_000_000  # not hour-aligned; windows align themselves


def _write(path, rows):
    """rows: list of (event_id, hour_float, user, type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [int(1_699_999_200_000_000_000 + r[1] * _HOUR_NS) for r in rows],
                pa.int64(),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _drain(spark, src, out, ckpt):
    stream = read_events_stream(spark, src)
    q = (
        hourly_event_aggregates(stream, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermark_late_data(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # Batch 1: one event in each of hours 0..3. Watermark after the
    # batch = 03:10 - 1h = 02:10 -> windows ending <= 02:10 finalize.
    _write(
        src / "batch1.parquet",
        [
            (1, 0.17, 1, "view", 1.0),
            (2, 1.17, 1, "view", 1.0),
            (3, 2.17, 1, "view", 1.0),
            (4, 3.17, 1, "view", 1.0),
        ],
    )
    _drain(spark, str(src), out, ckpt)

    # Batch 2 (same checkpoint): a late-but-acceptable event for the
    # hour-2 window (still open), a TOO-late event for hour 0 (already
    # finalized -> dropped), and an hour-5 event pushing the watermark
    # to 04:10 so hours 2 and 3 finalize.
    _write(
        src / "batch2.parquet",
        [
            (5, 2.33, 1, "view", 1.0),   # late, within watermark
            (6, 0.33, 1, "view", 1.0),   # too late, must be dropped
            (7, 5.17, 1, "view", 1.0),   # advances the watermark
        ],
    )
    _drain(spark, str(src), out, ckpt)

    rows = spark.read.parquet(out).collect()
    counts = {}
    for r in rows:
        counts[r["window_start"]] = counts.get(r["window_start"], 0) + r["n"]
    finalized = sorted(counts.items())
    # hours 0..3 finalized; hour 5 still open (watermark 04:10 < 06:00)
    assert len(finalized) == 4
    ns = [n for _, n in finalized]
    assert ns[0] == 1  # too-late event NOT counted in hour 0
    assert ns[1] == 1
    assert ns[2] == 2  # late-but-acceptable event counted in hour 2
    assert ns[3] == 1
