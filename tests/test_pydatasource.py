"""Custom Python DataSource (Spark 4 API) + JSONL/ORC sink tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.sources.pydatasource import (
    SyntheticEventsDataSource,
    synth_row,
)
from big_data_bowl_2026_analytics_spark.sources.readers import read_jsonl
from big_data_bowl_2026_analytics_spark.sources.writers import write_jsonl, write_orc


class TestSyntheticEventsSource:
    def _load(self, spark, rows, partitions):
        spark.dataSource.register(SyntheticEventsDataSource)
        return (
            spark.read.format("synthetic_events")
            .option("rows", rows)
            .option("partitions", partitions)
            .load()
        )

    def test_rows_and_partition_parallelism(self, spark):
        df = self._load(spark, 1000, 8)
        assert df.rdd.getNumPartitions() == 8
        assert df.count() == 1000
        assert df.select("event_id").distinct().count() == 1000

    def test_layout_independent_content(self, spark):
        # same rows regardless of partitioning — generation is a pure
        # function of event_id, so retries/cluster size can't change data
        a = self._load(spark, 500, 2).orderBy("event_id").collect()
        b = self._load(spark, 500, 7).orderBy("event_id").collect()
        assert a == b
        assert tuple(a[37]) == synth_row(37)

    def test_schema_and_domains(self, spark):
        df = self._load(spark, 2000, 4)
        assert [f.name for f in df.schema.fields] == [
            "event_id",
            "user_id",
            "event_type",
            "value",
        ]
        bad = df.where(
            (F.col("user_id") < 0)
            | (F.col("user_id") >= 1000)
            | ~F.col("event_type").isin("view", "click", "purchase", "signup", "error")
            | (F.col("value") < 0)
            | (F.col("value") >= 1000)
        )
        assert bad.count() == 0


class TestSinks:
    def test_jsonl_round_trip(self, spark, tmp_path):
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("g"), F.lit("x").alias("s")
        )
        path = str(tmp_path / "jl")
        write_jsonl(df, path)
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        schema = StructType([
            StructField("id", LongType()),
            StructField("g", LongType()),
            StructField("s", StringType()),
        ])
        back = read_jsonl(spark, path, schema)
        assert back.count() == 100
        assert back.agg(F.sum("id")).first()[0] == 4950
        assert read_jsonl(spark, path, schema, limit=7).count() == 7

    def test_read_jsonl_failfast_on_corrupt_line(self, spark, tmp_path):
        import os

        from pyspark.sql.types import LongType, StructField, StructType

        d = tmp_path / "bad"
        os.makedirs(d)
        (d / "part-0.json").write_text('{"id": 1}\n{"id": not-json}\n')
        schema = StructType([StructField("id", LongType())])
        with pytest.raises(Exception, match="FAILFAST|Malformed|corrupt"):
            read_jsonl(spark, str(d), schema).count()

    def test_orc_round_trip_with_pushdown(self, spark, tmp_path):
        df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
        path = str(tmp_path / "orc")
        write_orc(df, path)
        back = spark.read.orc(path).where(F.col("id") < 10)
        assert back.count() == 10
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "orc" in plan.lower()
