"""Scale-safe global ranking: the bucketed two-level rank.

A global ``row_number() OVER (ORDER BY v)`` funnels the whole frame
through ONE partition — the exact anti-pattern ml/evaluate.py's AUC
and q119's Gini carefully avoid. This operator extracts their shared
machinery: bucket rows by ``floor(log2(v))`` (monotone in v, ≤64
buckets for any bigint magnitude), rank inside each bucket with a
partitioned window, then add per-bucket offsets computed by a window
over the ≤64-row bucket summary — the only unpartitioned stage is
that bounded summary scan. Output ranks are identical to the global
window's (same total order), at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    out_col: str = "rank",
) -> DataFrame:
    """``df`` plus a dense global 1-based row_number by
    ``(value_col, *tiebreak_cols)`` ascending, computed without a
    data-sized single-partition window. ``value_col`` must be
    positive (log2 bucketing); tiebreak columns must make the order
    total — same contract as every top-k in this repo.
    """
    v = F.col(value_col)
    bucket = F.when(v <= 1, F.lit(0)).otherwise(
        F.floor(F.log2(v))
    ).cast("int")
    b = df.withColumn("_rk_bucket", bucket)
    w_in = (
        Window.partitionBy("_rk_bucket")
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = b.withColumn("_rk_in", F.count(F.lit(1)).over(w_in))
    sizes = ranked.groupBy("_rk_bucket").agg(
        F.count(F.lit(1)).alias("_rk_n")
    )
    w_b = Window.orderBy("_rk_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "_rk_before", F.coalesce(F.sum("_rk_n").over(w_b), F.lit(0))
    ).select("_rk_bucket", "_rk_before")
    return (
        ranked.join(F.broadcast(offsets), "_rk_bucket")
        .withColumn(out_col, (F.col("_rk_before") + F.col("_rk_in")).cast("bigint"))
        .drop("_rk_bucket", "_rk_in", "_rk_before")
    )


def bucketed_cummax_prev(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    max_col: str,
    out_col: str = "prev_max",
) -> DataFrame:
    """``df`` plus the running maximum of ``max_col`` over all rows
    STRICTLY BEFORE the current one in ``(value_col, *tiebreak_cols)``
    ascending order — the prefix-MAX member of the two-level family
    (rank/cumsum above). NULL on the first row (nothing precedes).

    Skyline/Pareto-front queries are the canonical consumer: a point
    is dominated iff the prefix max of the competing dimension over
    strictly-better rows already reaches it. Same contract as
    bucketed_rank: positive ``value_col``, total order; unlike the
    float cumsum, MAX is order-insensitive, so the output is exactly
    the global window's on any engine.
    """
    v = F.col(value_col)
    bucket = F.when(v <= 1, F.lit(0)).otherwise(
        F.floor(F.log2(v))
    ).cast("int")
    b = df.withColumn("_cm_bucket", bucket)
    w_in = (
        Window.partitionBy("_cm_bucket")
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    inmax = b.withColumn("_cm_in", F.max(max_col).over(w_in))
    sizes = inmax.groupBy("_cm_bucket").agg(F.max(max_col).alias("_cm_n"))
    w_b = Window.orderBy("_cm_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "_cm_before", F.max("_cm_n").over(w_b)
    ).select("_cm_bucket", "_cm_before")
    return (
        inmax.join(F.broadcast(offsets), "_cm_bucket")
        .withColumn(out_col, F.greatest("_cm_in", "_cm_before"))
        .drop("_cm_bucket", "_cm_in", "_cm_before")
    )


def bucketed_rank_cumsum(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    sum_col: str,
    rank_out: str = "rank",
    cum_out: str = "cum_sum",
) -> DataFrame:
    """:func:`bucketed_rank` plus the running sum of ``sum_col`` in
    the same total order — the prefix-SUM generalization of the same
    two-level trick (in-bucket running sum by a partitioned window,
    cross-bucket offsets from the ≤64-row bucket summary). The
    cumulative sum equals a global ``sum() OVER (ORDER BY ...)``
    without the data-sized single-partition window.

    Same contract as bucketed_rank: positive ``value_col``, total
    (value, *tiebreaks) order. The running-sum VALUES match a global
    window's up to float association order within/across buckets —
    callers round derived shares (CLAUDE.md rule 2).
    """
    v = F.col(value_col)
    bucket = F.when(v <= 1, F.lit(0)).otherwise(
        F.floor(F.log2(v))
    ).cast("int")
    b = df.withColumn("_rk_bucket", bucket)
    w_in = (
        Window.partitionBy("_rk_bucket")
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = b.withColumn("_rk_in", F.count(F.lit(1)).over(w_in)).withColumn(
        "_cs_in", F.sum(sum_col).over(w_in)
    )
    sizes = ranked.groupBy("_rk_bucket").agg(
        F.count(F.lit(1)).alias("_rk_n"), F.sum(sum_col).alias("_cs_n")
    )
    w_b = Window.orderBy("_rk_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        sizes.withColumn(
            "_rk_before", F.coalesce(F.sum("_rk_n").over(w_b), F.lit(0))
        )
        .withColumn(
            "_cs_before", F.coalesce(F.sum("_cs_n").over(w_b), F.lit(0.0))
        )
        .select("_rk_bucket", "_rk_before", "_cs_before")
    )
    return (
        ranked.join(F.broadcast(offsets), "_rk_bucket")
        .withColumn(
            rank_out, (F.col("_rk_before") + F.col("_rk_in")).cast("bigint")
        )
        .withColumn(cum_out, F.col("_cs_before") + F.col("_cs_in"))
        .drop("_rk_bucket", "_rk_in", "_cs_in", "_rk_before", "_cs_before")
    )
