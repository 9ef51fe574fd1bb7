"""Ranking, ordered aggregation, and percentile queries — engine
capabilities beyond the reference's row_number-only window usage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...functions.scalar import fround
from ...sources.readers import read_table
from ..registry import query


@query(
    "q56_ranking_functions",
    tags=("window", "ranking"),
    oracle="""
SELECT o_orderkey, o_orderstatus,
       rank() OVER w AS price_rank,
       dense_rank() OVER w AS price_dense_rank,
       ntile(4) OVER w AS price_quartile,
       round(percent_rank() OVER w + 1e-9, 6) AS price_pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q56_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family (rank / dense_rank / ntile /
    percent_rank) per order status — deterministic because the window
    order carries the unique o_orderkey tie-break.

    Scale: one shuffle on the partition key; all four functions share
    one sorted pass.
    """
    orders = read_table(
        spark, sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
        fround(F.percent_rank().over(w), 6).alias("price_pct_rank"),
    )


@query(
    "q57_ordered_string_agg",
    tags=("agg", "collect"),
    oracle="""
SELECT o_custkey,
       count(*) AS n_orders,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders
GROUP BY o_custkey
""",
)
def q57_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct-set aggregation rendered as a string —
    collect_set has no deterministic order, so the engine form is
    array_sort(collect_set(...)) before join; emitting a string keeps
    the result portable across engines/hashers."""
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
    )


@query(
    "q58_percentiles",
    tags=("agg", "percentile"),
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25) + 1e-9, 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50) + 1e-9, 4) AS median,
       round(quantile_cont(o_totalprice, 0.90) + 1e-9, 4) AS p90
FROM orders
GROUP BY o_orderstatus
""",
)
def q58_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per status (Spark ``percentile``
    == DuckDB ``quantile_cont``). At 100 TB the same query swaps to
    approx_percentile (t-digest sketch, mergeable) — the exact form
    stays here because the oracle hashes values."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    return orders.groupBy("o_orderstatus").agg(
        fround(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        fround(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("median"),
        fround(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
    )


@query(
    "q96_approx_percentile_bound",
    tags=("sketch", "approx", "percentile"),
    oracle="""
WITH per_group AS (
  SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, n AS n_rows, TRUE AS median_within_rank_bound
FROM per_group
""",
)
def q96_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable quantile sketch — the 100 TB
    replacement for the exact q58 form) driver-verified via its RANK
    guarantee: the sketch's median v must satisfy
    count(x < v) <= n/2 + err and count(x <= v) >= n/2 - err with
    err = n/accuracy (tie-robust two-sided form — the sketch returns a
    data value whose rank is within err, but ties move strict and
    non-strict counts apart). The boolean is computed from the data
    and pinned TRUE by the oracle, so a sketch regression past its
    contract fails the hash gate — same strict-plus-bound pattern as
    q44.

    Scale: two passes over the grouped column (sketch, then rank
    counts conditioned on the 3-row broadcast sketch result) — the
    verification join broadcasts, never shuffles the fact table twice.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    accuracy = 10_000
    sk = orders.groupBy("o_orderstatus").agg(
        F.expr(f"approx_percentile(o_totalprice, 0.5, {accuracy})").alias("_v")
    )
    joined = orders.join(F.broadcast(sk), "o_orderstatus")
    agg = joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("o_totalprice") < F.col("_v")).cast("long")).alias("_below"),
        F.sum((F.col("o_totalprice") <= F.col("_v")).cast("long")).alias("_at_or_below"),
    )
    err = F.col("n_rows") / accuracy + 1
    target = F.col("n_rows") / 2.0
    return agg.select(
        "o_orderstatus",
        "n_rows",
        (
            (F.col("_below") <= target + err)
            & (F.col("_at_or_below") >= target - err)
        ).alias("median_within_rank_bound"),
    )


@query(
    "q176_quantile_transform",
    tags=("ranking", "ml-features", "normalization"),
    oracle="""
WITH ranked AS (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
         count(*) OVER () AS n
  FROM orders
)
SELECT o_orderkey, o_totalprice,
       CAST(r AS BIGINT) AS rank,
       round((r - 1) * 1.0 / (n - 1) + 1e-9, 6) AS quantile
FROM ranked
WHERE o_orderkey % 19 = 0
""",
)
def q176_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-integral transform of a skewed monetary feature:
    map each value to its global quantile position — the
    distribution-free normalization (uniform output whatever the
    input shape) a feature pipeline applies before distance-based
    models, with the added property that the transform is STABLE
    under re-ingestion because the order is total.

    The global rank comes from operators/rankops.py::bucketed_rank
    (magnitude-bucket windows + a ≤64-row offset scan) — the oracle's
    plain ``row_number() OVER (ORDER BY ...)`` is exactly the
    single-partition funnel the operator exists to avoid at 100 TB.
    The output filter keeps every 19th key so the checked frame stays
    bounded while sampling the whole range.

    Quantiles are integer-rank ratios — IEEE-exact on both engines
    before the defensive round.
    """
    from ...operators.rankops import bucketed_rank

    orders = read_table(
        spark, sf_dir, "orders", ["o_orderkey", "o_totalprice"]
    )
    n = orders.agg(F.count(F.lit(1)).alias("n"))
    ranked = bucketed_rank(
        orders, "o_totalprice", ["o_orderkey"], out_col="rank"
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .where(F.col("o_orderkey") % 19 == 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            "rank",
            fround(
                (F.col("rank") - 1) * 1.0 / (F.col("n") - 1), 6
            ).alias("quantile"),
        )
    )
