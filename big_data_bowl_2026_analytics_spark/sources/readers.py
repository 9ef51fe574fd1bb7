"""Table readers.

Parquet is the engine's native format (columnar, statistics, partition
pruning). CSV ingest keeps parity with the reference's raw inputs
(reference: src/io/datasets.py:14-29) but with explicit schemas and
FAILFAST instead of inferred dtypes + hand-rolled column checks
(reference: src/data_processing/cleaning/plays.py:67-72).

At 100 TB the scan is where the query is won or lost: we always read
through these helpers so column pruning and predicate pushdown reach
the parquet footer (check ``ReadSchema``/``PushedFilters`` in
``df.explain``), and partitioned layouts get pruned by partition
predicates rather than read-and-filter.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Read one testdata table; optional projection (pruned at the scan).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    refuses to read natively; we read it as a long (legacy conf) and
    truncate to microseconds — matching DuckDB, which truncates
    NANOS to its microsecond TIMESTAMP on read.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Runtime-settable SQL confs the queries depend on are set HERE,
    # not at session build time: the driver supplies its own
    # SparkSession (CLAUDE.md footgun #7), so timestamp semantics
    # (date_trunc, toPandas conversion) must not rely on the session
    # having been built by core/session.py. UTC matches the DuckDB
    # oracle's default.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TPCH_TABLES
) -> None:
    """Register every table as a temp view so ``spark.sql`` works as a
    front end alongside the DataFrame API (same Catalyst plans)."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    limit: int | None = None,
) -> DataFrame:
    """CSV scan with an explicit schema, fail-fast on malformed rows.

    Mirrors the reference CSVReader (src/io/datasets.py:14-29) whose
    optional row limit becomes a ``LocalLimit`` the optimizer pushes
    toward the scan.
    """
    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )
    if limit is not None:
        df = df.limit(limit)
    return df
