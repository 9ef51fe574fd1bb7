"""Skew-salting equivalence tests and bucketed-join plan tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from big_data_bowl_2026_analytics_spark.operators.skew import (
    salted_aggregation,
    salted_join,
)
from big_data_bowl_2026_analytics_spark.plans.explain import physical_plan
from big_data_bowl_2026_analytics_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def test_salted_aggregation_equals_direct_groupby(spark):
    li = read_table(spark, SF, "lineitem")
    direct = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 6), r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], round(r["qty"], 6), r["mx"])
        for r in salted_aggregation(
            li,
            ["l_returnflag"],
            {"n": "count", "qty": "sum:l_quantity", "mx": "max:l_extendedprice"},
            n_salts=8,
        ).collect()
    }
    assert direct == salted


def test_salted_aggregation_spreads_partitions(spark):
    li = read_table(spark, SF, "lineitem")
    partial = salted_aggregation(
        li, ["l_returnflag"], {"n": "count"}, n_salts=8
    )
    # 3 hot keys x 8 salts = up to 24 phase-1 groups instead of 3
    assert partial.count() == 3  # final output still one row per key


def test_salted_join_equals_plain_join(spark):
    li = read_table(spark, SF, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    part = read_table(spark, SF, "part", ["p_partkey", "p_brand"]).withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    plain = (
        li.join(part, ["l_partkey"])
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, part, ["l_partkey"], n_salts=4)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_is_deterministic_across_runs(spark):
    li = read_table(spark, SF, "lineitem", ["l_orderkey", "l_partkey"])
    part = read_table(spark, SF, "part", ["p_partkey"]).withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    a = salted_join(li, part, ["l_partkey"], n_salts=4).count()
    b = salted_join(li, part, ["l_partkey"], n_salts=4).count()
    assert a == b  # content-derived salt, not rand(): retry-safe


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = read_table(spark, SF, "orders", ["o_orderkey", "o_totalprice"])
        li = read_table(spark, SF, "lineitem", ["l_orderkey", "l_quantity"]).withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"])
        write_bucketed(li, "b_lineitem", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"])
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located by storage, no shuffle
        assert joined.count() == 6000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
