"""SparkSession factory.

One place to configure the engine so every entry point (tests, bench,
driver contract) runs with the same scale-aware defaults:

- AQE on (runtime re-plan: coalescing, skew joins, join-strategy switch)
- Arrow on (pandas-UDF exchange is columnar batches, not pickled rows)
- shuffle partitions sized to the machine, not the Spark default of 200
- UTC session timezone so timestamp semantics match the DuckDB oracle

In production this engine targets a multi-executor cluster; everything
here also applies there except ``master``/memory, which the cluster
manager supplies.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "bdb2026-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the configured SparkSession.

    ``shuffle_partitions`` defaults to the core count: at local scale a
    shuffle partition per core keeps every task busy without tiny-task
    scheduling overhead; on a real cluster AQE coalescing makes the
    initial number mostly a ceiling.
    """
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # PySpark 4's DataFrame-debugging call-site capture costs THREE
        # py4j round trips per wrapped DataFrame-API call (conf.get +
        # PySparkCurrentOrigin.set/clear in pyspark/errors/utils.py::
        # _with_origin) — measured ~30% of the sf0.1 serial bench, and
        # pure plan-construction overhead at any scale. It only
        # enriches error messages with user line numbers; disable it
        # in engine sessions. (The value is cached process-wide at the
        # first wrapped call, so it must be set at session build.)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
