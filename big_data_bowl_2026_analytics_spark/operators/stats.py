"""Distributed rank-test machinery: tie-corrected Mann-Whitney U.

The estimator runs on the (pair, distinct-value) HISTOGRAM, not the
row grain: average ranks for a tied value are prev_count + (t+1)/2 —
an exact half — so rank sums, U, and the tie-correction Σ(t³−t) are
all exact doubles and the normal-approximation z is the only float
expression (fixed tree, identical on any engine). Windows partition
by the test pair; per-pair work is bounded by the pair's distinct
value count (quantize continuous columns first if a single pair's
support outgrows a partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mann_whitney_z(tagged: DataFrame) -> DataFrame:
    """Tie-corrected Mann-Whitney U with normal-approximation z per
    test pair.

    Input: one row per observation with columns ``ta, tb`` (the pair
    labels), ``value`` (the measured variable) and ``is_a`` (1 if the
    observation belongs to group ``ta``). Output: one row per pair —
    ``(type_a, type_b, n_a, n_b, u_a, z)`` with ``u_a``/``z``
    UNROUNDED (callers apply the fround pair); ``z`` is NULL when the
    variance is zero (a pair with a single distinct value).
    """
    hist = tagged.groupBy("ta", "tb", "value").agg(
        F.sum("is_a").alias("ca"),
        (F.count(F.lit(1)) - F.sum("is_a")).alias("cb"),
        F.count(F.lit(1)).alias("tot"),
    )
    w = (
        Window.partitionBy("ta", "tb")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = hist.withColumn(
        "avg_rank",
        F.sum("tot").over(w) - F.col("tot") + (F.col("tot") + 1) / 2.0,
    )
    stats = ranked.groupBy("ta", "tb").agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * F.col("avg_rank")).alias("r_a"),
        F.sum(
            F.col("tot") * F.col("tot") * F.col("tot") - F.col("tot")
        ).alias("ties"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    pre = stats.select(
        "ta",
        "tb",
        "n_a",
        "n_b",
        (F.col("r_a") - n_a * (n_a + 1) / 2.0).alias("u_a"),
        (
            (n_a * n_b / 12.0)
            * (
                (n_a + n_b + 1)
                - F.col("ties") * 1.0 / ((n_a + n_b) * (n_a + n_b - 1.0))
            )
        ).alias("sigma2"),
    )
    return pre.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        "u_a",
        F.when(
            F.col("sigma2") > 0,
            (F.col("u_a") - n_a * n_b / 2.0) / F.sqrt(F.col("sigma2")),
        ).alias("z"),
    )
