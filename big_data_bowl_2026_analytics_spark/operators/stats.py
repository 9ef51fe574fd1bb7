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


def spearman_rho(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One-row frame with Spearman rank correlation of two ROUNDED
    metric columns: ``(n, spearman_rho)``.

    Average ranks with ties come from each metric's distinct-value
    histogram (windows bounded by the distinct-rounded-value grain —
    the q227 argument, never a data-sized global window), doubled to
    stay integer (2·avg_rank = 2·cum_before + c + 1 — the q211 rank
    algebra), so the Pearson-of-ranks sums are exact BIGINTs cast to
    double once (q204 rule). ρ carries the sign-of-zero guard; a
    degenerate (constant) metric yields NULL identically.
    """
    from pyspark.sql import Window

    joined = df.select(col_a, col_b).localCheckpoint(eager=False)

    def ranks(col: str, out: str):
        hist = joined.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        wv = Window.orderBy("v")
        return hist.select(
            F.col("v").alias(col),
            (
                2
                * F.coalesce(
                    F.sum("c").over(
                        wv.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
                + F.col("c")
                + 1
            ).cast("bigint").alias(out),
        )

    ranked = joined.join(ranks(col_a, "ra"), col_a).join(
        ranks(col_b, "rb"), col_b
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(F.col("ra") * F.col("rb")).alias("sab"),
        F.sum(F.col("ra") * F.col("ra")).alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).alias("sbb"),
    )
    n_d = F.col("n").cast("double")
    sa_d, sb_d = F.col("sa").cast("double"), F.col("sb").cast("double")
    va = n_d * F.col("saa").cast("double") - sa_d * sa_d
    vb = n_d * F.col("sbb").cast("double") - sb_d * sb_d
    num = n_d * F.col("sab").cast("double") - sa_d * sb_d
    rho = F.when(va * vb <= 0, F.lit(None).cast("double")).otherwise(
        F.round(num / F.sqrt(va * vb) + 1e-9, 6) + 0
    )
    return sums.select(F.col("n").cast("bigint").alias("n"), rho.alias("spearman_rho"))
