"""Property tests for the third-session query machinery:

1. The q154 gaps-and-islands interval merge equals a brute-force
   union of spans (hypothesis-generated span sets).
2. The q172/q176 descending-rank flip over bucketed_rank equals the
   plain global window rank.
3. The q153 hash-sample membership is partition-independent
   (repartitioning must not change which rows are sampled).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def _merge_brute(spans):
    """Reference model of the query's semantic: islands merge on
    OVERLAP (start <= running max end), not on mere adjacency; the
    covered-token count is identical under either interpretation
    because islands are disjoint."""
    covered = set()
    for s, e in spans:
        covered.update(range(s, e + 1))
    islands = 0
    prev_end = None
    for s, e in sorted(spans):
        if prev_end is None or s > prev_end:
            islands += 1
        prev_end = e if prev_end is None else max(prev_end, e)
    return islands, len(covered)


def _merge_spark(spark, spans):
    df = spark.createDataFrame(
        [(1, s, s + 2) for s in spans], "doc_id int, st int, en int"
    ).dropDuplicates(["st"])
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("st")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("doc_id")
        .orderBy("st")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = df.withColumn(
        "ni",
        F.when(
            F.max("en").over(prev).isNull()
            | (F.col("st") > F.max("en").over(prev)),
            1,
        ).otherwise(0),
    )
    islanded = marked.withColumn("island", F.sum("ni").over(run))
    merged = islanded.groupBy("doc_id", "island").agg(
        F.min("st").alias("s"), F.max("en").alias("e")
    )
    row = merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("e") - F.col("s") + 1).alias("covered"),
    ).first()
    return row["n"], row["covered"]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=12))
def test_interval_merge_matches_bruteforce(spark, starts):
    spans = [(s, s + 2) for s in set(starts)]
    want = _merge_brute(spans)
    got = _merge_spark(spark, sorted(set(starts)))
    assert got == want


def test_descending_flip_equals_global_rank(spark):
    from big_data_bowl_2026_analytics_spark.operators.rankops import (
        bucketed_rank,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.explode(F.split("text", " ")).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n = df.count()
    flipped = (
        bucketed_rank(df, "c", [F.desc("tok")], out_col="r_asc")
        .withColumn("r", F.lit(n) + 1 - F.col("r_asc"))
        .select("tok", "r")
    )
    plain = df.withColumn(
        "r_w", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
    ).select("tok", "r_w")
    diff = (
        flipped.join(plain, "tok")
        .where(F.col("r") != F.col("r_w"))
        .count()
    )
    assert diff == 0


def test_ht_sample_membership_partition_independent(spark):
    from big_data_bowl_2026_analytics_spark.plans import all_queries

    b = all_queries()["q153_horvitz_thompson_audit"].builder
    base = b(spark, "/root/testdata/sf0.001").orderBy("l_returnflag").collect()
    # the builder reads fresh; force a different partitioning of the
    # input by changing shuffle partitions for the second run
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = (
            b(spark, "/root/testdata/sf0.001").orderBy("l_returnflag").collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert [r.asDict() for r in base] == [r.asDict() for r in again]


def test_bucketed_cumsum_equals_global_window(spark):
    from big_data_bowl_2026_analytics_spark.operators.rankops import (
        bucketed_rank_cumsum,
    )

    rev = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("cents")
        )
    )
    two_level = bucketed_rank_cumsum(
        rev, "cents", ["l_partkey"], "cents", rank_out="r", cum_out="cs"
    ).select("l_partkey", "r", "cs")
    w = Window.orderBy("cents", "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    plain = rev.select(
        "l_partkey",
        F.count(F.lit(1)).over(w).alias("r_w"),
        F.sum("cents").over(w).alias("cs_w"),
    )
    diff = (
        two_level.join(plain, "l_partkey")
        .where((F.col("r") != F.col("r_w")) | (F.col("cs") != F.col("cs_w")))
        .count()
    )
    assert diff == 0
