"""Dataset-assembly query internals: the 16-bit md5 decode against
Python's hashlib, split stability under repartitioning, and the
80/10/10 shape on a real-ish id domain."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.plans.queries.splits import _hash16


def _py_hash16(seed: str, key: int) -> int:
    return int(hashlib.md5(f"{seed}{key}".encode()).hexdigest()[:4], 16)


def test_hash16_matches_hashlib(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", _hash16("split|", F.col("doc_id")).alias("h")
        ).collect()
    }
    for i in range(200):
        assert got[i] == _py_hash16("split|", i)


def test_split_assignment_partition_independent(spark):
    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    bucket = _hash16("split|", F.col("doc_id")) % 1000
    split = (
        F.when(bucket < 800, "train").when(bucket < 900, "valid").otherwise("test")
    )
    one = {r.doc_id: r.s for r in df.coalesce(1).select("doc_id", split.alias("s")).collect()}
    many = {
        r.doc_id: r.s
        for r in df.repartition(17).select("doc_id", split.alias("s")).collect()
    }
    assert one == many
    n = len(one)
    train = sum(1 for s in one.values() if s == "train") / n
    valid = sum(1 for s in one.values() if s == "valid") / n
    assert abs(train - 0.8) < 0.03 and abs(valid - 0.1) < 0.02


def test_bucketed_rank_equals_global_window(spark):
    # the extracted two-level rank must reproduce the global
    # row_number total order exactly, including heavy ties.
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_bowl_2026_analytics_spark.operators.rankops import (
        bucketed_rank,
    )

    rnd = random.Random(5)
    rows = [(i, rnd.choice([1, 2, 3, 7, 1000, 10**9])) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.rank
        for r in bucketed_rank(df, "v", ["k"]).collect()
    }
    w = Window.orderBy("v", "k")
    want = {
        r.k: r.rank
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_bucketed_rank_partition_independent(spark):
    import random

    from pyspark.sql import functions as F

    from big_data_bowl_2026_analytics_spark.operators.rankops import (
        bucketed_rank,
    )

    rnd = random.Random(23)
    rows = [(i, rnd.randint(1, 10**6)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v long")
    one = {
        r.k: r.rank for r in bucketed_rank(df.coalesce(1), "v", ["k"]).collect()
    }
    many = {
        r.k: r.rank
        for r in bucketed_rank(df.repartition(13), "v", ["k"]).collect()
    }
    assert one == many
