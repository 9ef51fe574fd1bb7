"""Model evaluation as DataFrame aggregates (SURVEY §2.9 U8).

ROC-AUC via the rank-sum (Mann-Whitney) identity computed over
*distinct rounded probabilities* — the ordered window runs over at
most 10^6 distinct values regardless of row count, so the metric
scales (no global sort of the full scored set, no driver collect).
LogLoss/Brier/calibration are plain column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_metrics(
    df: DataFrame, prob_col: str = "probability", label_col: str = "target"
) -> DataFrame:
    """One-row DataFrame: auc, log_loss, brier, n_pos, n_neg.

    Probabilities are rounded to 6 decimals first, which makes the
    fractional-rank AUC deterministic and engine-portable.
    """
    p = F.round(F.col(prob_col) + 1e-9, 6)
    y = F.col(label_col).cast("double")

    scored = df.select(p.alias("p"), y.alias("y"))
    # Single pass: y is binary, so the row-wise loss terms are exactly
    # recoverable from the per-p group counts —
    #   Σ_rows -[y ln p + (1-y) ln(1-p)] = Σ_p [n_pos·(-ln p) + n_neg·(-ln(1-p))]
    #   Σ_rows (p-y)²                    = Σ_p [n_pos·(1-p)² + n_neg·p²]
    # — which folds log-loss/Brier into the SAME groupBy(p) aggregate
    # the AUC rank-sum needs. One scan of the scored input instead of
    # two (the scoring pipeline above it may contain a Python UDF
    # stage; executing it twice doubles the Arrow exchange), and no
    # final crossJoin of two one-row aggregates.
    eps = 1e-12
    by_p = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos_p")
    )
    n_neg_p = F.col("n") - F.col("n_pos_p")
    by_p = by_p.withColumn(
        "loss_sum",
        F.col("n_pos_p") * -F.log(F.greatest(F.col("p"), F.lit(eps)))
        + n_neg_p * -F.log(F.greatest(1 - F.col("p"), F.lit(eps))),
    ).withColumn(
        "brier_sum",
        F.col("n_pos_p") * F.pow(1 - F.col("p"), 2)
        + n_neg_p * F.pow(F.col("p"), 2),
    )
    # by_p feeds two branches below (bucket offsets + ranked rows).
    # Distributed prefix sum (two-level, single-branch): a global
    # ordered window would funnel all distinct probabilities through
    # one partition. Instead, bucket p into B ranges and decompose the
    # rank sum as
    #   Σ_p n_pos_p·(cum_before_p + (n_p+1)/2)
    #     = Σ_p n_pos_p·(in_bucket_before_p + (n_p+1)/2)   [per bucket]
    #       + Σ_b pos_b·bucket_before_b                    [B rows]
    # (bucket_before is constant within a bucket). The in-bucket
    # cumulative AND the per-bucket totals come out of ONE window stage
    # over partitionBy(bucket); the follow-up groupBy(bucket) reuses
    # that partitioning (no exchange), and the B-row cross-bucket
    # prefix + final aggregate both run inside the resulting single
    # partition. Net plan: 3 exchanges (p-shuffle, bucket-shuffle,
    # B-row funnel) — the round-3 form paid 6, with an extra bucket
    # shuffle and a broadcast of the offsets frame. Every rank summand
    # is an exact half in float64, so any association order (including
    # the oracle's one-window form) gives the identical value.
    n_buckets = 1024
    bucketed = by_p.withColumn(
        "bucket",
        F.least(F.floor(F.col("p") * n_buckets), F.lit(n_buckets - 1)).cast("int"),
    )
    w_in_bucket = (
        Window.partitionBy("bucket")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = bucketed.withColumn(
        "in_before", F.coalesce(F.sum("n").over(w_in_bucket), F.lit(0))
    )
    per_bucket = ranked.groupBy("bucket").agg(
        F.sum(
            (F.col("in_before") + (F.col("n") + 1) / 2.0) * F.col("n_pos_p")
        ).alias("rank_pos_in"),
        F.sum("n").alias("bucket_n"),
        F.sum("n_pos_p").alias("pos_b"),
        F.sum(F.col("n") - F.col("n_pos_p")).alias("neg_b"),
        F.sum("loss_sum").alias("loss_b"),
        F.sum("brier_sum").alias("brier_b"),
    )
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offset = per_bucket.withColumn(
        "bucket_before", F.coalesce(F.sum("bucket_n").over(w_bucket), F.lit(0))
    )
    agg = offset.agg(
        F.sum(
            F.col("rank_pos_in") + F.col("pos_b") * F.col("bucket_before")
        ).alias("sum_rank_pos"),
        F.sum("pos_b").alias("n_pos"),
        F.sum("neg_b").alias("n_neg"),
        F.sum("loss_b").alias("loss_total"),
        F.sum("brier_b").alias("brier_total"),
        F.sum("bucket_n").alias("n_rows"),
    )
    return agg.select(
        F.round(
            (
                F.col("sum_rank_pos")
                - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
            )
            / (F.col("n_pos") * F.col("n_neg"))
            + 1e-9,
            6,
        ).alias("auc"),
        F.round(F.col("loss_total") / F.col("n_rows") + 1e-9, 6).alias("log_loss"),
        F.round(F.col("brier_total") / F.col("n_rows") + 1e-9, 6).alias("brier"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str = "probability",
    label_col: str = "target",
    n_bins: int = 10,
) -> DataFrame:
    """Calibration curve: decile bins of predicted probability vs the
    observed positive rate (reference src/training/evaluate.py:29-70)."""
    p = F.round(F.col(prob_col) + 1e-9, 6)
    bin_col = F.least(F.floor(p * n_bins), F.lit(n_bins - 1)).cast("bigint")
    return (
        df.select(
            bin_col.alias("bin"),
            p.alias("p"),
            F.col(label_col).cast("double").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p") + 1e-9, 6).alias("mean_predicted"),
            F.round(F.avg("y") + 1e-9, 6).alias("observed_rate"),
        )
    )


def binary_metrics_by_group(
    df: DataFrame,
    group_col: str,
    prob_col: str = "probability",
    label_col: str = "target",
) -> DataFrame:
    """Per-slice binary metrics (auc, log_loss, brier, n_pos, n_neg)
    — the model-monitoring cut that catches a model failing on one
    segment while the global number looks fine.

    Same single-pass per-(slice, p) fold as :func:`binary_metrics`,
    but the rank window partitions by the SLICE, so no two-level
    bucket machinery is needed: each partition holds at most the 10^6
    distinct rounded probabilities of one slice — the documented
    bounded-window case, at any corpus scale. Every rank summand is an
    exact half in float64, so the sum is association-order-exact
    cross-engine.
    """
    eps = 1e-12
    p = F.round(F.col(prob_col) + 1e-9, 6)
    y = F.col(label_col).cast("double")
    by_p = (
        df.select(F.col(group_col).alias("slice"), p.alias("p"), y.alias("y"))
        .groupBy("slice", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos_p"))
    )
    n_neg_p = F.col("n") - F.col("n_pos_p")
    by_p = by_p.withColumn(
        "loss_sum",
        F.col("n_pos_p") * -F.log(F.greatest(F.col("p"), F.lit(eps)))
        + n_neg_p * -F.log(F.greatest(1 - F.col("p"), F.lit(eps))),
    ).withColumn(
        "brier_sum",
        F.col("n_pos_p") * F.pow(1 - F.col("p"), 2) + n_neg_p * F.pow(F.col("p"), 2),
    )
    w = (
        Window.partitionBy("slice")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = by_p.withColumn(
        "before", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    agg = ranked.groupBy("slice").agg(
        F.sum(
            (F.col("before") + (F.col("n") + 1) / 2.0) * F.col("n_pos_p")
        ).alias("sum_rank_pos"),
        F.sum("n_pos_p").alias("n_pos"),
        F.sum(F.col("n") - F.col("n_pos_p")).alias("n_neg"),
        F.sum("loss_sum").alias("loss_total"),
        F.sum("brier_sum").alias("brier_total"),
        F.sum("n").alias("n_rows"),
    )
    return agg.select(
        "slice",
        F.round(
            (F.col("sum_rank_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg"))
            + 1e-9,
            6,
        ).alias("auc"),
        F.round(F.col("loss_total") / F.col("n_rows") + 1e-9, 6).alias("log_loss"),
        F.round(F.col("brier_total") / F.col("n_rows") + 1e-9, 6).alias("brier"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
    )
