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
    eps = 1e-12
    loss_terms = scored.agg(
        F.avg(
            -(
                F.col("y") * F.log(F.greatest(F.col("p"), F.lit(eps)))
                + (1 - F.col("y")) * F.log(F.greatest(1 - F.col("p"), F.lit(eps)))
            )
        ).alias("log_loss_raw"),
        F.avg(F.pow(F.col("p") - F.col("y"), 2)).alias("brier_raw"),
    )

    by_p = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos_p")
    )
    # Distributed prefix sum (two-level): a global ordered window would
    # funnel all distinct probabilities through one partition. Instead,
    # bucket p into B ranges, compute per-bucket offsets with a window
    # over only B rows, broadcast them back, and run the ordered window
    # partitioned by bucket — every step is parallel except the B-row
    # offset scan. All summands are exact halves in float64, so the
    # result is bit-identical to the single-window form.
    n_buckets = 1024
    bucketed = by_p.withColumn(
        "bucket",
        F.least(F.floor(F.col("p") * n_buckets), F.lit(n_buckets - 1)).cast("int"),
    )
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("n").alias("bucket_n"))
        .withColumn(
            "bucket_before", F.coalesce(F.sum("bucket_n").over(w_bucket), F.lit(0))
        )
        .select("bucket", "bucket_before")
    )
    w_in_bucket = (
        Window.partitionBy("bucket")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        bucketed.join(F.broadcast(bucket_offsets), "bucket")
        .withColumn(
            "cum_before",
            F.col("bucket_before")
            + F.coalesce(F.sum("n").over(w_in_bucket), F.lit(0)),
        )
        .withColumn("frac_rank", F.col("cum_before") + (F.col("n") + 1) / 2.0)
    )
    agg = ranked.agg(
        F.sum(F.col("frac_rank") * F.col("n_pos_p")).alias("sum_rank_pos"),
        F.sum("n_pos_p").alias("n_pos"),
        F.sum(F.col("n") - F.col("n_pos_p")).alias("n_neg"),
    )
    return (
        agg.crossJoin(loss_terms)
        .select(
            F.round(
                (
                    F.col("sum_rank_pos")
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (F.col("n_pos") * F.col("n_neg"))
                + 1e-9,
                6,
            ).alias("auc"),
            F.round(F.col("log_loss_raw") + 1e-9, 6).alias("log_loss"),
            F.round(F.col("brier_raw") + 1e-9, 6).alias("brier"),
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
        )
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
