"""Event-time windowed aggregation — the batch face of the streaming
module. The reference has no streaming surface (SURVEY §2.10); these
queries define the tumbling-window semantics that
``streaming/events.py`` reproduces incrementally with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...functions.scalar import fround
from ...sources.readers import read_table
from ..registry import query


@query(
    "q25_tumbling_window_hourly",
    tags=("timeseries", "window-agg"),
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value) + 1e-9, 2) AS total_value,
       round(avg(value) + 1e-9, 4) AS avg_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def q25_tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregates per event type using the
    native event-time window operator.

    Scale: F.window assigns each row to its hour bucket map-side; the
    groupBy shuffles on (bucket, type) with partial aggregation — the
    same plan Structured Streaming runs incrementally with a watermark.
    """
    ev = read_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fround(F.sum("value"), 2).alias("total_value"),
            fround(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
            "avg_value",
        )
    )


@query(
    "q26_daily_active_users",
    tags=("timeseries", "distinct"),
    oracle="""
SELECT date_trunc('day', ts) AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events
FROM events
GROUP BY date_trunc('day', ts)
""",
)
def q26_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users — exact distinct per day. At 100 TB the same
    query would switch to approx_count_distinct (HLL sketch, mergeable,
    no expand); exact form kept here because the oracle hashes values.
    """
    ev = read_table(spark, sf_dir, "events", ["ts", "user_id"])
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )
