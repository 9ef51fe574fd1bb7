"""Training-data-pipeline operator queries (beyond the reference):
gap-filled time series, deterministic splits/samples, statistical
moments, column profiling (unpivot), funnel analysis, histogram
binning, and Z-order layout keys.

The reference's pipeline has exactly one split (week-range train/test,
reference src/data_processing/training/create_datasets.py:102-103) and
no sampling, profiling, or layout operators — these are the pieces a
100 TB training-data pipeline needs around the same engine core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...functions.scalar import fround, zorder_key, zorder_sql
from ...operators.sampling import deterministic_group_sample, hash_split
from ...operators.temporal import gap_fill_locf
from ...sources.readers import read_table
from ..registry import query
from ...core.session import local_frame
from .splits import _hash16_sql


@query(
    "q70_gap_fill_locf",
    tags=("timeseries", "gap-fill"),
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         round(sum(value) + 1e-9, 2) AS hourly_value
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
  FROM span
), filled AS (
  SELECT g.user_id, g.hour, h.hourly_value
  FROM grid g LEFT JOIN hourly h USING (user_id, hour)
)
SELECT user_id, hour,
       last_value(hourly_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_locf,
       CASE WHEN hourly_value IS NOT NULL THEN 1 ELSE 0 END AS observed
FROM filled
""",
)
def q70_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user activity regularized onto a dense hour grid with
    gaps forward-filled (LOCF) — the hypertable
    ``time_bucket_gapfill + locf`` pattern via
    ``operators/temporal.py::gap_fill_locf``.

    Scale: the grid explodes from each user's (min, max) span over the
    ALREADY-AGGREGATED hourly frame (thousands of times smaller than
    the fact table); the fill window shuffles once on user_id.
    """
    ev = read_table(spark, sf_dir, "events", ["user_id", "ts", "value"])
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(fround(F.sum("value"), 2).alias("hourly_value"))
    filled = gap_fill_locf(hourly, "user_id", "hour", ("hourly_value",))
    return filled.select(
        "user_id",
        "hour",
        F.col("hourly_value").alias("value_locf"),
        "observed",
    )


@query(
    "q71_hash_split",
    tags=("sampling", "split"),
    oracle="""
WITH b AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_custkey,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT % 100
           AS bucket
  FROM orders
)
SELECT CASE WHEN bucket < 10 THEN 'test'
            WHEN bucket < 30 THEN 'validation'
            ELSE 'train' END AS split,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(cents) AS BIGINT) / 100.0 AS total_price
FROM b GROUP BY 1
""",
)
def q71_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10/20/70 test/validation/train split by md5 hash
    bucket of the order key (``operators/sampling.py::hash_split``) —
    stable across runs, engines, partition layouts, and data growth
    (cumulative ranges), unlike ``df.sample``. The reference's only
    split is the week-range partition split (create_datasets.py:102).

    Scale: the assignment is a map-side expression; one shuffle for
    the per-split aggregate. total_price is an EXACT BIGINT cents sum
    divided once (rebased round 13: at the 100x probe the 3-way split
    sums reach ~2.6e12 where the engines' float partial-sum orders
    diverge past the fround half-gap — the q01 class).
    """
    orders = read_table(
        spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    )
    split = hash_split(
        F.col("o_orderkey").cast("string"),
        [("test", 10), ("validation", 20), ("train", 70)],
    )
    return (
        orders.select(
            split.alias("split"),
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            (F.sum("cents").cast("bigint") / 100.0).alias("total_price"),
        )
    )


@query(
    "q72_stats_moments",
    tags=("agg", "statistics"),
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice) + 1e-9, 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice) + 1e-9, 2) AS covar_qty_price,
       round(covar_pop(l_quantity, l_extendedprice) + 1e-9, 2) AS covar_pop_qty_price,
       round(stddev_samp(l_extendedprice) + 1e-9, 4) AS stddev_price,
       round(var_pop(l_quantity) + 1e-9, 4) AS var_qty,
       round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 6) AS slope_price_per_qty,
       round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 2) AS intercept_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q72_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics library per return flag: correlation,
    sample/population covariance, stddev, variance, and the OLS
    regression line — the data-profiling aggregates a feature pipeline
    runs before training (the reference computes none of these; its
    closest is the mean in A2, reference tracking.py:420-424).

    Scale: all are single-pass mergeable co-moment aggregates
    (partial aggregation map-side, one shuffle on the 3-value flag;
    skew-safe because partials merge).
    """
    li = read_table(
        spark, sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    return li.groupBy("l_returnflag").agg(
        fround(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        fround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        fround(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias(
            "covar_pop_qty_price"
        ),
        fround(F.stddev_samp("l_extendedprice"), 4).alias("stddev_price"),
        fround(F.var_pop("l_quantity"), 4).alias("var_qty"),
        fround(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias(
            "slope_price_per_qty"
        ),
        fround(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 2).alias(
            "intercept_price"
        ),
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       min({c}) AS min_value, max({c}) AS max_value,
       round(avg({c}) + 1e-9, 4) AS avg_value FROM lineitem"""
    for c in _PROFILE_COLS
)


@query(
    "q73_column_profile",
    tags=("profiling", "unpivot"),
    oracle=_PROFILE_ORACLE,
)
def q73_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling: per-column (rows, nulls, min, max, mean) in
    long/unpivoted form — the pre-training data-quality report.

    Scale: ONE pass computes every column's aggregates in a single
    partial-aggregated row (no per-column rescans — the oracle's
    UNION ALL of scalar queries would scan 4x); the unpivot to long
    form happens on that single 1-row result via inline(array(...)),
    which is free. min/max pass raw doubles through (identical bits);
    only the derived mean is rounded.
    """
    li = read_table(spark, sf_dir, "lineitem", list(_PROFILE_COLS))
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}_n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            fround(F.avg(c), 4).alias(f"{c}_avg"),
        ]
    one = li.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}_n").alias("n_rows"),
            F.col(f"{c}_nulls").alias("n_null"),
            F.col(f"{c}_min").alias("min_value"),
            F.col(f"{c}_max").alias("max_value"),
            F.col(f"{c}_avg").alias("avg_value"),
        )
        for c in _PROFILE_COLS
    ]
    return one.select(F.inline(F.array(*structs)))


@query(
    "q74_funnel_conversion",
    tags=("events", "funnel"),
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1
)
SELECT stage, count(*) AS n_users FROM (
  SELECT '1_view' AS stage, user_id FROM v
  UNION ALL SELECT '2_click', user_id FROM c
  UNION ALL SELECT '3_purchase', user_id FROM p
) GROUP BY stage
""",
)
def q74_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → later click → later purchase):
    users surviving each stage, with strict temporal ordering — the
    sequential-pattern query behind conversion analysis.

    Scale: three min-aggregates on user_id + two joins on the same
    key — every stage shuffles on user_id, so the exchanges line up
    and reuse; stage frames shrink monotonically.
    """
    ev = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"])
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    stages = (
        v.select(F.lit("1_view").alias("stage"), "user_id")
        .unionByName(c.select(F.lit("2_click").alias("stage"), "user_id"))
        .unionByName(p.select(F.lit("3_purchase").alias("stage"), "user_id"))
    )
    return stages.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q75_histogram_bins",
    tags=("agg", "histogram"),
    oracle="""
WITH s AS (
  SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
), b AS (
  SELECT CAST(least(floor((o_totalprice - mn) / ((mx - mn) / 20)), 19)
              AS INTEGER) AS bin,
         mn, mx
  FROM orders, s
)
SELECT bin,
       round(mn + bin * ((mx - mn) / 20) + 1e-9, 2) AS bin_lo,
       round(mn + (bin + 1) * ((mx - mn) / 20) + 1e-9, 2) AS bin_hi,
       count(*) AS n_orders
FROM b GROUP BY 1, 2, 3
""",
)
def q75_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of order value (width_bucket
    semantics via portable floor arithmetic, top edge closed).

    Scale: two passes — a 1-row global (min, max) broadcast onto the
    fact scan, then a map-side bin expression and a 20-group partial
    aggregate. No sort, no full shuffle of the facts.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_totalprice"])
    stats = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / 20
    binned = orders.crossJoin(F.broadcast(stats)).withColumn(
        "bin",
        F.least(
            F.floor((F.col("o_totalprice") - F.col("mn")) / width), F.lit(19)
        ).cast("int"),
    )
    return (
        binned.withColumn("bin_lo", fround(F.col("mn") + F.col("bin") * width, 2))
        .withColumn("bin_hi", fround(F.col("mn") + (F.col("bin") + 1) * width, 2))
        .groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q76_group_sample",
    tags=("sampling", "window"),
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_orderkey, l_partkey,
         md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey))
           AS sample_key,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey,
                                  l_suppkey))
         ) AS sample_rank
  FROM lineitem
)
SELECT l_returnflag, l_orderkey, l_partkey, sample_key, sample_rank
FROM ranked WHERE sample_rank <= 5
""",
)
def q76_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-group sample by md5 order
    (``operators/sampling.py::deterministic_group_sample``) — the
    re-runnable form of per-group reservoir sampling; membership is a
    pure function of the row, independent of partition layout.

    Scale: one shuffle on the group key; the rank<=k filter plans as
    WindowGroupLimit, so each task keeps only its top-5 by hash before
    the final per-group merge (no full-group sort materialization).
    """
    li = read_table(
        spark,
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )
    sampled = deterministic_group_sample(
        li,
        ["l_returnflag"],
        5,
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )
    return sampled.select(
        "l_returnflag", "l_orderkey", "l_partkey", "sample_key", "sample_rank"
    )


@query(
    "q77_zorder_layout",
    tags=("layout", "zorder"),
    oracle=f"""
WITH z AS (
  SELECT ({zorder_sql("l_partkey", "l_suppkey")}) AS zkey,
         l_partkey, l_suppkey
  FROM lineitem
)
SELECT zkey >> 16 AS zbucket,
       count(*) AS n_rows,
       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
FROM z GROUP BY 1
""",
)
def q77_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order layout key over (part, supplier) with per-bucket
    min/max ranges (``functions/scalar.py::zorder_key``) — the
    space-filling-curve clustering behind Delta/Iceberg Z-ordering.
    The per-bucket min/max output IS the point: both dimensions stay
    range-bounded per bucket, which is exactly what makes parquet
    min/max statistics prune 2-D predicates after a
    ``repartitionByRange(zkey)`` write.

    Scale: the key is map-side integer bit math; one partial-aggregated
    shuffle on the bucket. Pure-integer output — engine-exact.
    """
    li = read_table(spark, sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    z = li.withColumn(
        "zkey", zorder_key(F.col("l_partkey"), F.col("l_suppkey"))
    )
    return z.groupBy(F.shiftright("zkey", 16).alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )


@query(
    "q104_weighted_bernoulli_sample",
    tags=("sampling", "llm-pipeline"),
    oracle="""
WITH w AS (
  SELECT doc_id, source, n_chars,
         (('0x' || substr(md5(md5(CAST(doc_id AS VARCHAR)) || 'mix1'), 1, 8))::BIGINT
           + 0.5) / 4294967296.0 AS sample_u
  FROM documents WHERE n_chars > 0
), tot AS (SELECT CAST(sum(n_chars) AS DOUBLE) AS W FROM w)
SELECT doc_id, source, n_chars, round(sample_u + 1e-9, 6) AS u_round
FROM w CROSS JOIN tot
WHERE sample_u < 200 * n_chars / W
""",
)
def q104_weighted_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling of the
    corpus (weights = characters, expected 200 docs): the
    training-mixture draw every LLM data pipeline runs, made
    reproducible by deriving the uniform from md5 of the key instead
    of rand() (``operators/sampling.py::weighted_bernoulli_sample``).

    Every arithmetic step is IEEE-exact or correctly rounded (no
    pow/ln), so membership is bit-identical on any engine — which is
    what lets a DuckDB oracle (or a re-run years later on a different
    cluster) reproduce the exact sample.

    Scale: one aggregate for total weight broadcast back over the
    corpus; the filter is map-side. No sort, no top-k, no shuffle of
    the kept rows.
    """
    from ...operators.sampling import weighted_bernoulli_sample

    docs = read_table(
        spark, sf_dir, "documents", ["doc_id", "source", "n_chars"]
    ).where(F.col("n_chars") > 0)
    picked = weighted_bernoulli_sample(
        docs, 200, "n_chars", ["doc_id"], salt="mix1"
    )
    return picked.select(
        "doc_id",
        "source",
        "n_chars",
        fround(F.col("sample_u"), 6).alias("u_round"),
    )


@query(
    "q112_winsorize",
    tags=("feature-gen", "percentile", "statistics"),
    oracle="""
WITH cuts AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY l_returnflag
), clipped AS (
  SELECT l.l_returnflag,
         least(greatest(l.l_extendedprice, c.lo), c.hi) AS v,
         CASE WHEN l.l_extendedprice < c.lo OR l.l_extendedprice > c.hi
              THEN 1 ELSE 0 END AS clip
  FROM lineitem l JOIN cuts c USING (l_returnflag)
)
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(clip) AS BIGINT) AS n_clipped,
       round(min(v) + 1e-9, 2) AS min_winsorized,
       round(max(v) + 1e-9, 2) AS max_winsorized,
       round(avg(v) + 1e-9, 4) AS mean_winsorized
FROM clipped
GROUP BY l_returnflag
""",
)
def q112_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip at the exact p05/p95): the
    outlier-taming transform feature pipelines apply before scaling —
    a price column with a fat tail otherwise dominates any
    distance-based model.

    The per-group cut points are a 3-row aggregate BROADCAST back onto
    the fact scan (never a window over the facts — percentile windows
    re-rank per row); the clip itself is map-side least/greatest. Exact
    interpolated percentiles pair engine-exactly (Spark ``percentile``
    == DuckDB ``quantile_cont``, q58-proven); at 100 TB swap in
    approx_percentile and keep the identical broadcast-back shape.
    """
    # r13 optimization: one array-percentile shares one buffer + one
    # sort per group for identical values (two separate aggregates
    # each buffered and sorted the whole column); the layout-gated
    # spread parallelizes the per-partition buffer build (guide §2.5).
    li = read_table(
        spark, sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"],
        spread=True,
    )
    cuts = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.05, 0.95))").alias("_pcts")
    ).select(
        "l_returnflag",
        F.col("_pcts")[0].alias("lo"),
        F.col("_pcts")[1].alias("hi"),
    )
    clipped = li.join(F.broadcast(cuts), "l_returnflag").select(
        "l_returnflag",
        F.least(
            F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
        ).alias("v"),
        F.when(
            (F.col("l_extendedprice") < F.col("lo"))
            | (F.col("l_extendedprice") > F.col("hi")),
            1,
        )
        .otherwise(0)
        .alias("clip"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("clip").cast("bigint").alias("n_clipped"),
        fround(F.min("v"), 2).alias("min_winsorized"),
        fround(F.max("v"), 2).alias("max_winsorized"),
        fround(F.avg("v"), 4).alias("mean_winsorized"),
    )


@query(
    "q113_robust_zscore",
    tags=("feature-gen", "statistics"),
    oracle="""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
), dev AS (
  SELECT l.l_returnflag,
         quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad
  FROM lineitem l JOIN med m USING (l_returnflag)
  GROUP BY l.l_returnflag
), stats AS (
  SELECT m.l_returnflag, m.med, d.mad FROM med m JOIN dev d USING (l_returnflag)
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       round((l.l_extendedprice - s.med) / (1.4826 * s.mad) + 1e-9, 6)
         AS robust_z
FROM lineitem l JOIN stats s USING (l_returnflag)
WHERE s.mad <> 0
  AND abs((l.l_extendedprice - s.med) / (1.4826 * s.mad)) > 1.2
""",
)
def q113_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust z-score outlier detection (median/MAD, the
    1.4826-consistency-scaled estimator): unlike mean/stddev scaling,
    a contaminated tail cannot drag the scale itself — the standard
    anomaly screen over skewed operational metrics.

    Two aggregate passes (median, then median absolute deviation given
    the broadcast medians), both collapsing to a rows-per-group frame
    that broadcasts back onto the fact scan; the score and the
    threshold filter are map-side. Exact medians pair engine-exactly
    (q58-proven); the output is the flagged-outlier set, so the fact
    table never leaves the executors unfiltered.

    A degenerate group (MAD = 0, i.e. >50% of the group at one value)
    is dropped explicitly on BOTH sides: Spark's x/0 is NULL while
    DuckDB's IEEE float division is ±inf, so without the guard the two
    engines would disagree on whether the group's rows pass the
    |z| > 1.2 filter.
    """
    # r13 note: the layout-gated spread was MEASURED here and rejected
    # (2.47 -> 2.62 s at sf0.1): the final scoring pass is map-only,
    # so the added round-robin exchange costs more than the parallel
    # percentile-buffer build saves when two of three passes need it.
    li = read_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"],
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    dev = (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(abs(l_extendedprice - med), 0.5)"
            ).alias("mad")
        )
    )
    stats = med.join(dev, "l_returnflag")
    z = (F.col("l_extendedprice") - F.col("med")) / (
        F.lit(1.4826) * F.col("mad")
    )
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .where((F.col("mad") != 0) & (F.abs(z) > 1.2))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            fround(z, 6).alias("robust_z"),
        )
    )


@query(
    "q115_expectation_audit",
    tags=("quality", "audit"),
    oracle="""
WITH order_keys AS (
  SELECT DISTINCT o_orderkey FROM orders
)
SELECT
  count(*) AS n_rows,
  CAST(sum(CASE WHEN l.l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS null_quantity,
  CAST(sum(CASE WHEN l.l_quantity < 1 OR l.l_quantity > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS range_quantity,
  CAST(sum(CASE WHEN l.l_discount < 0 OR l.l_discount > 0.1
                THEN 1 ELSE 0 END) AS BIGINT) AS range_discount,
  CAST(sum(CASE WHEN l.l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS null_shipdate,
  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS orphan_lineitems
FROM lineitem l LEFT JOIN order_keys o ON l.l_orderkey = o.o_orderkey
""",
)
def q115_expectation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-expectations suite in ONE scan: null checks, range checks,
    and a referential-integrity (orphan FK) check over lineitem, all
    as conditional sums folded into a single aggregate row — the
    Great-Expectations-style validation pass a pipeline gates a load
    on, without running one query per expectation.

    The FK check is a broadcast left join against the DISTINCT parent
    keys (never the parent rows); every expectation is a map-side
    conditional, so N expectations cost the same scan as one. The
    observe/accumulator variant that rides an existing write job is
    ``operators/quality.py::observe_audit`` — this is the standalone
    oracle-checked form.
    """
    li = read_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_quantity", "l_discount", "l_shipdate"],
    )
    keys = read_table(spark, sf_dir, "orders", ["o_orderkey"]).distinct()
    joined = li.join(
        F.broadcast(keys), li.l_orderkey == keys.o_orderkey, "left"
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        flag(F.col("l_quantity").isNull()).alias("null_quantity"),
        flag(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("range_quantity"),
        flag(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("range_discount"),
        flag(F.col("l_shipdate").isNull()).alias("null_shipdate"),
        flag(F.col("o_orderkey").isNull()).alias("orphan_lineitems"),
    )


@query(
    "q160_mutual_information_screen",
    tags=("pipeline", "ml-features", "audit"),
    oracle="""
WITH stats AS (
  SELECT min(value) AS mn, max(value) AS mx FROM events
), binned AS (
  SELECT event_type,
         CASE WHEN mx = mn THEN 0
              ELSE CAST(least(3, floor((value - mn) / ((mx - mn) / 4.0)))
                   AS BIGINT) END AS vbin,
         CAST(extract(hour FROM ts) AS BIGINT) AS hbin
  FROM events, stats
), cells AS (
  SELECT 'value_bin4' AS feature, event_type, vbin AS bin,
         CAST(count(*) AS BIGINT) AS nxy
  FROM binned GROUP BY event_type, vbin
  UNION ALL
  SELECT 'hour_of_day' AS feature, event_type, hbin AS bin,
         CAST(count(*) AS BIGINT) AS nxy
  FROM binned GROUP BY event_type, hbin
), margx AS (
  SELECT feature, event_type, CAST(sum(nxy) AS BIGINT) AS nx
  FROM cells GROUP BY feature, event_type
), margy AS (
  SELECT feature, bin, CAST(sum(nxy) AS BIGINT) AS ny
  FROM cells GROUP BY feature, bin
), tot AS (
  SELECT feature, CAST(sum(nxy) AS BIGINT) AS n FROM cells GROUP BY feature
)
SELECT c.feature,
       CAST(count(*) AS BIGINT) AS n_cells,
       round(sum(c.nxy * ln((CAST(t.n AS DOUBLE) * c.nxy)
                            / (CAST(x.nx AS DOUBLE) * y.ny)))
             / any_value(t.n) + 1e-9, 6) AS mi_nats
FROM cells c
JOIN margx x ON c.feature = x.feature AND c.event_type = x.event_type
JOIN margy y ON c.feature = y.feature AND c.bin = y.bin
JOIN tot t ON c.feature = t.feature
GROUP BY c.feature
""",
)
def q160_mutual_information_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual-information feature screen: I(event_type; feature) in
    nats for two candidate features (equal-width value bin,
    hour-of-day) — the model-free relevance ranking a feature pipeline
    runs before training anything (chi-square q129 tests independence;
    MI RANKS the dependence).

    Engine-exactness: bins come from IEEE-identical float arithmetic
    against a broadcast global min/max (floor of identical doubles);
    every MI term is integer counts cast to double in a fixed
    association order, with the log-sum order absorbed by the
    6-decimal round (q101 discipline).

    Scale: one corpus scan to the two contingency-cell frames (cell
    counts bounded by the bin-domain product, not rows); marginals and
    totals derive from the tiny cell frames. The degenerate
    max == min range collapses to one bin instead of dividing by zero.
    """
    ev = read_table(spark, sf_dir, "events", ["event_type", "ts", "value"])
    stats = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(stats)).select(
        "event_type",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(3),
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / 4.0)
                ),
            )
        )
        .cast("bigint")
        .alias("vbin"),
        F.hour("ts").cast("bigint").alias("hbin"),
    ).localCheckpoint(eager=False)
    cells = (
        binned.groupBy("event_type", F.col("vbin").alias("bin"))
        .agg(F.count(F.lit(1)).alias("nxy"))
        .withColumn("feature", F.lit("value_bin4"))
        .unionByName(
            binned.groupBy("event_type", F.col("hbin").alias("bin"))
            .agg(F.count(F.lit(1)).alias("nxy"))
            .withColumn("feature", F.lit("hour_of_day"))
        )
        .localCheckpoint(eager=False)
    )
    margx = cells.groupBy("feature", "event_type").agg(
        F.sum("nxy").alias("nx")
    )
    margy = cells.groupBy("feature", "bin").agg(F.sum("nxy").alias("ny"))
    tot = cells.groupBy("feature").agg(F.sum("nxy").alias("n"))
    term = F.col("nxy") * F.log(
        (F.col("n").cast("double") * F.col("nxy"))
        / (F.col("nx").cast("double") * F.col("ny"))
    )
    return (
        cells.join(F.broadcast(margx), ["feature", "event_type"])
        .join(F.broadcast(margy), ["feature", "bin"])
        .join(F.broadcast(tot), "feature")
        .groupBy("feature")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            fround(F.sum(term) / F.any_value("n"), 6).alias("mi_nats"),
        )
    )


@query(
    "q167_funnel_latency",
    tags=("events", "funnel", "statistics"),
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
), l1 AS (
  SELECT (epoch_us(c.t2) - epoch_us(v.t1)) / 1000000.0 AS lat
  FROM c JOIN v USING (user_id)
), l2 AS (
  SELECT (epoch_us(p.t3) - epoch_us(c.t2)) / 1000000.0 AS lat
  FROM p JOIN c USING (user_id)
)
SELECT '1_view_to_click' AS transition,
       CAST(count(*) AS BIGINT) AS n_users,
       round(sum(lat) / count(*) + 1e-9, 3) AS avg_s,
       round(quantile_cont(lat, 0.5) + 1e-9, 3) AS p50_s,
       round(quantile_cont(lat, 0.95) + 1e-9, 3) AS p95_s
FROM l1
UNION ALL
SELECT '2_click_to_purchase',
       CAST(count(*) AS BIGINT),
       round(sum(lat) / count(*) + 1e-9, 3),
       round(quantile_cont(lat, 0.5) + 1e-9, 3),
       round(quantile_cont(lat, 0.95) + 1e-9, 3)
FROM l2
""",
)
def q167_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for each funnel transition (the
    latency companion of q74's survivor counts): mean / median / p95
    microseconds between a user's first view and first subsequent
    click, and first click and first subsequent purchase.

    Latencies convert to SECONDS before any statistics (one shared
    IEEE division of the integer microsecond gap): multi-day gaps in
    raw microseconds overflow double precision at 4-decimal rounding
    (a measured ULP flip), while seconds keep every reported digit
    inside the mantissa. Percentiles use the ``percentile`` ==
    ``quantile_cont`` interpolation parity proven by q58; the float
    sum in the mean divides counts of identical IEEE values.

    Scale: identical stage shuffles to q74 (every frame keys on
    user_id, exchanges line up); the latency frames shrink to
    converted users only before any statistics run.
    """
    ev = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"])
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    l1 = c.join(v, "user_id").select(
        ((F.unix_micros("t2") - F.unix_micros("t1")) / 1000000.0).alias("lat")
    )
    l2 = p.join(c, "user_id").select(
        ((F.unix_micros("t3") - F.unix_micros("t2")) / 1000000.0).alias("lat")
    )

    def stats(frame: DataFrame, label: str) -> DataFrame:
        return frame.agg(
            F.count(F.lit(1)).alias("n_users"),
            fround(F.sum("lat") / F.count(F.lit(1)), 3).alias("avg_s"),
            fround(F.expr("percentile(lat, 0.5)"), 3).alias("p50_s"),
            fround(F.expr("percentile(lat, 0.95)"), 3).alias("p95_s"),
        ).select(
            F.lit(label).alias("transition"),
            "n_users",
            "avg_s",
            "p50_s",
            "p95_s",
        )

    return stats(l1, "1_view_to_click").unionByName(
        stats(l2, "2_click_to_purchase")
    )


@query(
    "q177_ab_test_welch",
    tags=("experimentation", "statistics", "audit"),
    oracle="""
WITH tagged AS (
  SELECT event_type, value, __HASH__ % 2 AS v FROM events
), cells AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS n,
         sum(value) AS s, sum(value * value) AS ss
  FROM tagged GROUP BY event_type, v
), wide AS (
  SELECT event_type,
         max(CASE WHEN v = 0 THEN n END) AS na,
         max(CASE WHEN v = 0 THEN s END) AS sa,
         max(CASE WHEN v = 0 THEN ss END) AS ssa,
         max(CASE WHEN v = 1 THEN n END) AS nb,
         max(CASE WHEN v = 1 THEN s END) AS sb,
         max(CASE WHEN v = 1 THEN ss END) AS ssb
  FROM cells GROUP BY event_type
)
SELECT event_type, na, nb,
       round(sa / na + 1e-9, 6) AS mean_a,
       round(sb / nb + 1e-9, 6) AS mean_b,
       round((sa / na - sb / nb)
             / sqrt(((ssa - sa * sa / na) / (na - 1)) / na
                    + ((ssb - sb * sb / nb) / (nb - 1)) / nb)
             + 1e-9, 4) + 0 AS welch_t,
       abs((sa / na - sb / nb)
           / sqrt(((ssa - sa * sa / na) / (na - 1)) / na
                  + ((ssb - sb * sb / nb) / (nb - 1)) / nb)) > 1.96
         AS significant
FROM wide
""".replace("__HASH__", _hash16_sql("ab|", "user_id")),
)
def q177_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic per event type between two
    content-hash user cohorts — the experimentation readout (A/B
    means, unequal-variance t, 5% two-sided flag). On a pure hash
    split the cohorts are exchangeable, so ``significant`` false
    everywhere is itself the A/A-test calibration a platform runs
    before trusting its assignment hash.

    One pass to (type, variant) moment cells (count/sum/sumsq); the
    t statistic is closed-form column math on the six cells. Float
    sums carry the usual association-order ulp, absorbed by the
    rounds; the 1.96 decision uses the unrounded statistic (a flip
    requires |t| within an ulp of the boundary) and the q110 ``+ 0``
    guard keeps near-zero t sign-stable.

    Scale: user assignment is map-side hashing (no join to an
    assignment table — the 100 TB experimentation pattern); one
    shuffle on (type, variant); everything after runs on ≤2·|types|
    rows.
    """
    from .splits import _hash16

    ev = read_table(spark, sf_dir, "events", ["event_type", "user_id", "value"])
    tagged = ev.select(
        "event_type",
        "value",
        (_hash16("ab|", F.col("user_id")) % 2).alias("v"),
    )
    cells = tagged.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    wide = cells.groupBy("event_type").agg(
        F.max(F.when(F.col("v") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("v") == 0, F.col("s"))).alias("sa"),
        F.max(F.when(F.col("v") == 0, F.col("ss"))).alias("ssa"),
        F.max(F.when(F.col("v") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("v") == 1, F.col("s"))).alias("sb"),
        F.max(F.when(F.col("v") == 1, F.col("ss"))).alias("ssb"),
    )
    mean_a = F.col("sa") / F.col("na")
    mean_b = F.col("sb") / F.col("nb")
    var_term = (
        (F.col("ssa") - F.col("sa") * F.col("sa") / F.col("na"))
        / (F.col("na") - 1)
    ) / F.col("na") + (
        (F.col("ssb") - F.col("sb") * F.col("sb") / F.col("nb"))
        / (F.col("nb") - 1)
    ) / F.col("nb")
    t = (mean_a - mean_b) / F.sqrt(var_term)
    return wide.select(
        "event_type",
        "na",
        "nb",
        fround(mean_a, 6).alias("mean_a"),
        fround(mean_b, 6).alias("mean_b"),
        (fround(t, 4) + F.lit(0)).alias("welch_t"),
        (F.abs(t) > 1.96).alias("significant"),
    )


@query(
    "q187_anova_decomposition",
    tags=("statistics", "audit"),
    oracle="""
WITH cells AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(value) AS s, sum(value * value) AS ss
  FROM events GROUP BY event_type
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tot, sum(s) AS s_tot,
         sum(ss) AS ss_tot, CAST(count(*) AS BIGINT) AS k
  FROM cells
), parts AS (
  SELECT sum(s * s / n) - max(s_tot) * max(s_tot) / max(n_tot) AS ss_between,
         max(ss_tot) - sum(s * s / n) AS ss_within,
         max(n_tot) AS n_tot, max(k) AS k
  FROM cells, tot
)
SELECT CAST(n_tot AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_groups,
       round(ss_between + 1e-9, 4) AS ss_between,
       round(ss_within + 1e-9, 4) AS ss_within,
       round(ss_between / (ss_between + ss_within) + 1e-9, 6) AS eta_squared,
       round((ss_between / (k - 1)) / (ss_within / (n_tot - k))
             + 1e-9, 4) AS f_statistic
FROM parts
""",
)
def q187_anova_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value by type: between-group vs
    within-group sum of squares, η² (variance explained by the
    grouping) and the F statistic — the continuous-target sibling of
    the chi-square (q129) / MI (q160) / Welch (q177) family: does the
    segmentation explain the metric at all?

    Everything reduces to per-group (n, Σx, Σx²) moment cells in one
    scan; the decomposition is closed-form arithmetic on the k-row
    cell frame. Float-sum association order is absorbed by the
    rounds.

    Scale: one partial-aggregated shuffle on the group key; the
    decomposition runs on k rows.
    """
    ev = read_table(spark, sf_dir, "events", ["event_type", "value"])
    cells = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    ).localCheckpoint(eager=False)
    tot = cells.agg(
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.count(F.lit(1)).alias("k"),
    )
    parts = cells.crossJoin(F.broadcast(tot)).agg(
        (
            F.sum(F.col("s") * F.col("s") / F.col("n"))
            - F.max("s_tot") * F.max("s_tot") / F.max("n_tot")
        ).alias("ss_between"),
        (
            F.max("ss_tot") - F.sum(F.col("s") * F.col("s") / F.col("n"))
        ).alias("ss_within"),
        F.max("n_tot").alias("n_tot"),
        F.max("k").alias("k"),
    )
    return parts.select(
        F.col("n_tot").cast("bigint").alias("n_rows"),
        F.col("k").cast("bigint").alias("n_groups"),
        fround(F.col("ss_between"), 4).alias("ss_between"),
        fround(F.col("ss_within"), 4).alias("ss_within"),
        fround(
            F.col("ss_between") / (F.col("ss_between") + F.col("ss_within")),
            6,
        ).alias("eta_squared"),
        fround(
            (F.col("ss_between") / (F.col("k") - 1))
            / (F.col("ss_within") / (F.col("n_tot") - F.col("k"))),
            4,
        ).alias("f_statistic"),
    )


@query(
    "q190_outlier_method_agreement",
    tags=("statistics", "quality", "audit"),
    oracle="""
WITH stats AS (
  SELECT avg(l_extendedprice) AS mu,
         stddev_samp(l_extendedprice) AS sigma,
         quantile_cont(l_extendedprice, 0.5) AS med,
         quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem
), mad AS (
  SELECT quantile_cont(abs(l_extendedprice - (SELECT med FROM stats)), 0.5)
           AS mad
  FROM lineitem
), flags AS (
  SELECT CASE WHEN abs(l_extendedprice - mu) > 3 * sigma THEN 1 ELSE 0 END
           AS fz,
         CASE WHEN mad > 0
                   AND abs(l_extendedprice - med) / (1.4826 * mad) > 3
              THEN 1 ELSE 0 END AS fm,
         CASE WHEN l_extendedprice < p01 OR l_extendedprice > p99
              THEN 1 ELSE 0 END AS fw
  FROM lineitem, stats, mad
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(fz) AS BIGINT) AS n_zscore,
       CAST(sum(fm) AS BIGINT) AS n_mad,
       CAST(sum(fw) AS BIGINT) AS n_winsor,
       round(sum(fz * fm) * 1.0 /
             nullif(sum(CASE WHEN fz = 1 OR fm = 1 THEN 1 ELSE 0 END), 0)
             + 1e-9, 6) AS jaccard_z_mad,
       round(sum(fz * fw) * 1.0 /
             nullif(sum(CASE WHEN fz = 1 OR fw = 1 THEN 1 ELSE 0 END), 0)
             + 1e-9, 6) AS jaccard_z_winsor,
       round(sum(fm * fw) * 1.0 /
             nullif(sum(CASE WHEN fm = 1 OR fw = 1 THEN 1 ELSE 0 END), 0)
             + 1e-9, 6) AS jaccard_mad_winsor
FROM flags
""",
)
def q190_outlier_method_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Do the three outlier definitions in this engine (3σ z-score,
    3-MAD robust z of q113, p01/p99 winsor bounds of q112) agree on
    WHICH rows are outliers? Pairwise Jaccard of the flag sets — the
    method-sensitivity audit that tells a pipeline whether its outlier
    policy is a modeling choice or a no-op.

    Flag decisions compare raw values against broadcast statistics
    (identical IEEE arithmetic per row — the thresholds sit far from
    any value at double precision); agreements are integer-count
    Jaccards.

    Scale: one stats pass (the MAD needs the median first — two
    bounded aggregate rows broadcast back), one flagging scan with a
    single global reduction. No row survives the aggregate.
    """
    # r13 optimization: three separate exact-percentile aggregates
    # each buffer AND sort the whole column; one array-percentile call
    # shares a single buffer and a single sort for identical values
    # (same sorted data, same interpolation). The scan is spread by
    # the layout gate (guide §2.5) so the per-partition buffer build
    # parallelizes — the final merge is bounded model state either way.
    li = read_table(spark, sf_dir, "lineitem", ["l_extendedprice"], spread=True)
    x = F.col("l_extendedprice")
    stats = li.agg(
        F.avg(x).alias("mu"),
        F.stddev_samp(x).alias("sigma"),
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.01, 0.99))"
        ).alias("_pcts"),
    ).select(
        "mu",
        "sigma",
        F.col("_pcts")[0].alias("med"),
        F.col("_pcts")[1].alias("p01"),
        F.col("_pcts")[2].alias("p99"),
    )
    mad = (
        li.crossJoin(F.broadcast(stats))
        .agg(
            F.expr(
                "percentile(abs(l_extendedprice - med), 0.5)"
            ).alias("mad")
        )
    )
    flags = (
        li.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(mad))
        .select(
            F.when(F.abs(x - F.col("mu")) > 3 * F.col("sigma"), 1)
            .otherwise(0)
            .alias("fz"),
            F.when(
                (F.col("mad") > 0)
                & (
                    F.abs(x - F.col("med")) / (1.4826 * F.col("mad")) > 3
                ),
                1,
            )
            .otherwise(0)
            .alias("fm"),
            F.when((x < F.col("p01")) | (x > F.col("p99")), 1)
            .otherwise(0)
            .alias("fw"),
        )
    )

    def jac(a, b):
        inter = F.sum(F.col(a) * F.col(b))
        union = F.sum(
            F.when((F.col(a) == 1) | (F.col(b) == 1), 1).otherwise(0)
        )
        return fround(inter * 1.0 / F.nullif(union, F.lit(0)), 6)

    return flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("fz").alias("n_zscore"),
        F.sum("fm").alias("n_mad"),
        F.sum("fw").alias("n_winsor"),
        jac("fz", "fm").alias("jaccard_z_mad"),
        jac("fz", "fw").alias("jaccard_z_winsor"),
        jac("fm", "fw").alias("jaccard_mad_winsor"),
    )


@query(
    "q194_poisson_goodness_of_fit",
    tags=("statistics", "distribution", "audit"),
    oracle="""
WITH per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
  FROM lineitem GROUP BY l_orderkey
), hist AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_obs FROM per_order GROUP BY k
), tot AS (
  SELECT CAST(sum(n_obs) AS BIGINT) AS n,
         CAST(sum(k * n_obs) AS BIGINT) AS items
  FROM hist
)
SELECT k, n_obs,
       round(items * 1.0 / n + 1e-9, 6) AS lambda,
       round(n * exp(-(items * 1.0 / n)) * pow(items * 1.0 / n, k)
             / factorial(CAST(k AS INTEGER)) + 1e-9, 4) AS expected,
       round(pow(n_obs - n * exp(-(items * 1.0 / n))
                 * pow(items * 1.0 / n, k)
                 / factorial(CAST(k AS INTEGER)), 2)
             / (n * exp(-(items * 1.0 / n)) * pow(items * 1.0 / n, k)
                / factorial(CAST(k AS INTEGER)))
             + 1e-9, 6) AS chi_term
FROM hist, tot
""",
)
def q194_poisson_goodness_of_fit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Does the items-per-order distribution follow a Poisson law?
    Observed basket-size histogram against Poisson(λ = mean items),
    with a chi-square term per size — the distribution-fitting audit
    that validates (or refutes) the independence assumptions behind
    cost models and synthetic-data generators. Sum ``chi_term`` for
    the statistic; tail sizes with tiny expectations are reported
    unmerged (callers pool them before a formal test).

    λ is an exact integer ratio; pmf terms are fixed-order
    exp/pow/factorial arithmetic on identical doubles (the pow/exp
    last-ulp class, absorbed by the rounds); observed counts are
    integers.

    Scale: two stacked integer aggregations (order grain, then
    histogram grain — the second is ≤max-basket-size rows) and a
    one-row total broadcast.
    """
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey"])
    per_order = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    hist = per_order.groupBy("k").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = hist.agg(
        F.sum("n_obs").alias("n"),
        F.sum(F.col("k") * F.col("n_obs")).alias("items"),
    )
    lam = F.col("items") * 1.0 / F.col("n")
    expected = (
        F.col("n")
        * F.exp(-lam)
        * F.pow(lam, F.col("k"))
        / F.factorial(F.col("k").cast("int"))
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "k",
        "n_obs",
        fround(lam, 6).alias("lambda"),
        fround(expected, 4).alias("expected"),
        fround(
            F.pow(F.col("n_obs") - expected, 2) / expected, 6
        ).alias("chi_term"),
    )


@query(
    "q252_hierarchical_percentiles",
    tags=("statistics", "percentiles", "sre"),
    oracle="""
WITH cents AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), per_user AS (
  SELECT user_id, c AS p95_cents, n FROM (
    SELECT user_id, c,
           row_number() OVER (
             PARTITION BY user_id ORDER BY c, event_id
           ) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM cents
  ) WHERE rn = CAST(ceil(0.95 * n) AS BIGINT)
), ranked AS (
  SELECT p95_cents,
         row_number() OVER (ORDER BY p95_cents, user_id) AS r
  FROM per_user
), u AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users FROM per_user
)
SELECT n_users,
       round(min(CASE WHEN r = CAST(ceil(0.5 * n_users) AS BIGINT)
                      THEN p95_cents END) / 100.0 + 1e-9, 2)
         AS median_user_p95,
       round(min(CASE WHEN r = CAST(ceil(0.99 * n_users) AS BIGINT)
                      THEN p95_cents END) / 100.0 + 1e-9, 2)
         AS p99_user_p95
FROM ranked CROSS JOIN u
GROUP BY n_users
""",
)
def q252_hierarchical_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Percentile-of-percentiles: the p50 and p99 across USERS of each
    user's exact p95 event value — the SRE/SLO reporting shape ("99%
    of users see a per-user p95 under X") that a single global
    percentile silently misrepresents (it weights heavy users more).
    Both levels are EXACT order statistics (q184 rule — rank
    selection, never interpolation), on integer cents (float sums are
    never sort keys).

    Scale: the user level is a partitioned window (per-user group
    sizes); the cross-user level runs on the massively REDUCED
    user-grain frame through ``rankops.bucketed_rank`` — the two-level
    prefix machinery, no data-sized single-partition window anywhere.
    The target ranks come from a broadcast one-row user count, not a
    driver collect.
    """
    from ...operators.rankops import bucketed_rank

    ev = read_table(spark, sf_dir, "events", ["user_id", "event_id", "value"])
    cents = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    wu = Window.partitionBy("user_id").orderBy("c", "event_id")
    per_user = (
        cents.select(
            "user_id",
            "c",
            F.row_number().over(wu).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("user_id"))
            .alias("n"),
        )
        .where(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"))
        .select("user_id", F.col("c").alias("p95_cents"))
        .localCheckpoint(eager=False)  # rank + count branches
    )
    ranked = bucketed_rank(per_user, "p95_cents", ["user_id"], out_col="r")
    u = per_user.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        ranked.crossJoin(F.broadcast(u))
        .groupBy("n_users")
        .agg(
            fround(
                F.min(
                    F.when(
                        F.col("r")
                        == F.ceil(0.5 * F.col("n_users")).cast("bigint"),
                        F.col("p95_cents"),
                    )
                )
                / 100.0,
                2,
            ).alias("median_user_p95"),
            fround(
                F.min(
                    F.when(
                        F.col("r")
                        == F.ceil(0.99 * F.col("n_users")).cast("bigint"),
                        F.col("p95_cents"),
                    )
                )
                / 100.0,
                2,
            ).alias("p99_user_p95"),
        )
        .select("n_users", "median_user_p95", "p99_user_p95")
    )


@query(
    "q276_consistent_hash_balance",
    tags=("infrastructure", "sharding", "audit"),
    oracle=f"""
WITH ring AS (
  SELECT shard, v,
         {_hash16_sql("ring|' || CAST(shard AS VARCHAR) || '|", "v")} AS pt
  FROM (SELECT unnest(generate_series(0, 15)) AS shard),
       (SELECT unnest(generate_series(0, 7)) AS v)
), keys AS (
  SELECT c_custkey, {_hash16_sql("key|", "c_custkey")} AS kh
  FROM customer
), assigned AS (
  SELECT k.c_custkey,
         coalesce(
           min(CASE WHEN r.pt >= k.kh THEN r.pt END),
           min(r.pt)
         ) AS owner_pt
  FROM keys k CROSS JOIN ring r
  GROUP BY k.c_custkey, k.kh
), owners AS (
  SELECT pt, min(shard) AS shard FROM ring GROUP BY pt
), pershard AS (
  SELECT o.shard, CAST(count(*) AS BIGINT) AS n_keys
  FROM assigned a JOIN owners o ON o.pt = a.owner_pt
  GROUP BY o.shard
), tot AS (
  SELECT CAST(sum(n_keys) AS BIGINT) AS nt,
         CAST(max(n_keys) AS BIGINT) AS mx
  FROM pershard
)
SELECT p.shard, p.n_keys,
       round(p.n_keys * 1.0 / t.nt + 1e-9, 6) AS share,
       round(p.n_keys * 16.0 / t.nt + 1e-9, 6) AS load_factor,
       round(t.mx * 16.0 / t.nt + 1e-9, 6) AS peak_load_factor
FROM pershard p CROSS JOIN tot t
""",
)
def q276_consistent_hash_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Consistent-hash ring balance audit: 16 shards × 8 virtual
    nodes on a 16-bit md5 ring, every customer key assigned to the
    first ring point clockwise (with wraparound), and per-shard load
    factors reported against the uniform ideal — the pre-flight that
    says whether THIS vnode count keeps the hottest shard under its
    capacity before anyone re-partitions 100 TB (the peak load factor
    is the number that pages someone).

    Scale: the ring is 128 broadcast rows; assignment is a map-side
    conditional-min over the fan-out (no sort, no window); ring-point
    collisions resolve to the lowest shard id deterministically on
    both engines. Counts are exact integers; load factors are exact
    ratios (rule 5).
    """
    from .splits import _hash16

    ring = (
        spark.range(0, 16)
        .select(F.col("id").alias("shard"))
        .crossJoin(spark.range(0, 8).select(F.col("id").alias("v")))
        .select(
            "shard",
            "v",
            _hash16(
                "",
                F.concat(
                    F.lit("ring|"),
                    F.col("shard").cast("string"),
                    F.lit("|"),
                    F.col("v").cast("string"),
                ),
            ).alias("pt"),
        )
        .localCheckpoint(eager=False)  # assignment + owner branches
    )
    cust = read_table(spark, sf_dir, "customer", ["c_custkey"])
    keys = cust.select(
        "c_custkey",
        _hash16("key|", F.col("c_custkey")).alias("kh"),
    )
    assigned = (
        keys.crossJoin(F.broadcast(ring))
        .groupBy("c_custkey", "kh")
        .agg(
            F.coalesce(
                F.min(
                    F.when(F.col("pt") >= F.col("kh"), F.col("pt"))
                ),
                F.min("pt"),
            ).alias("owner_pt")
        )
    )
    owners = ring.groupBy("pt").agg(F.min("shard").alias("shard"))
    pershard = (
        assigned.join(F.broadcast(owners), F.col("pt") == F.col("owner_pt"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
    pershard = pershard.localCheckpoint(eager=False)  # totals + output
    tot = pershard.agg(
        F.sum("n_keys").alias("nt"), F.max("n_keys").alias("mx")
    )
    return pershard.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_keys",
        fround(F.col("n_keys") * 1.0 / F.col("nt"), 6).alias("share"),
        fround(F.col("n_keys") * 16.0 / F.col("nt"), 6).alias(
            "load_factor"
        ),
        fround(F.col("mx") * 16.0 / F.col("nt"), 6).alias(
            "peak_load_factor"
        ),
    )


@query(
    "q279_shuffle_skew_forecast",
    tags=("infrastructure", "skew", "planning"),
    oracle="""
WITH perkey AS (
  SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_orderkey
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n, key) AS rn,
         count(*) OVER () AS nk
  FROM perkey
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS rows_total,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n) AS BIGINT) AS max_key
  FROM perkey
), p99 AS (
  SELECT CAST(min(CASE WHEN rn = CAST(ceil(0.99 * nk) AS BIGINT)
                       THEN n END) AS BIGINT) AS p99_key
  FROM ranked
)
SELECT t.n_keys, t.rows_total, t.max_key, p.p99_key,
       round(t.rows_total * 1.0 / t.n_keys + 1e-9, 6) AS mean_key,
       round(t.max_key * 1.0 * t.n_keys / t.rows_total + 1e-9, 4)
         AS max_over_mean,
       round(t.max_key * 32.0 / t.rows_total + 1e-9, 6)
         AS max_partition_load_32,
       CAST(greatest(1, CAST(ceil(t.max_key * 32.0 / t.rows_total)
                             AS BIGINT)) AS BIGINT)
         AS recommended_salt_factor
FROM tot t CROSS JOIN p99 p
""",
)
def q279_shuffle_skew_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shuffle-skew forecast for a planned groupBy/join key: the
    per-key row distribution (max, exact p99, max/mean ratio), the
    hottest key's load factor at 32 shuffle partitions, and the salt
    factor that would flatten it — the planning query you run BEFORE
    shipping a new aggregation over 100 TB, and the quantitative
    input to operators/skew.py's salting (q45/q99 apply the cure;
    this sizes the dose).

    Scale: one grouped pass to the key grain; the p99 is an exact
    order statistic over keys (rank selection); every output after
    the key frame is a one-row reduce. The recommended factor is
    ceil(max_key_rows × partitions / total_rows) — the smallest salt
    that bounds the hottest (key, salt) cell by the mean partition.
    """
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey"])
    perkey = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    perkey = perkey.localCheckpoint(eager=False)  # rank + totals branches
    from ...operators.rankops import bucketed_rank

    ranked = bucketed_rank(perkey, "n", ["key"], out_col="rn")
    tot = perkey.agg(
        F.sum("n").cast("bigint").alias("rows_total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").cast("bigint").alias("max_key"),
    )
    p99 = (
        ranked.crossJoin(F.broadcast(tot))
        .where(
            F.col("rn")
            == F.ceil(0.99 * F.col("n_keys")).cast("bigint")
        )
        .agg(F.min("n").cast("bigint").alias("p99_key"))
    )
    return (
        tot.crossJoin(F.broadcast(p99))
        .select(
            "n_keys",
            "rows_total",
            "max_key",
            "p99_key",
            fround(
                F.col("rows_total") * 1.0 / F.col("n_keys"), 6
            ).alias("mean_key"),
            fround(
                F.col("max_key")
                * 1.0
                * F.col("n_keys")
                / F.col("rows_total"),
                4,
            ).alias("max_over_mean"),
            fround(
                F.col("max_key") * 32.0 / F.col("rows_total"), 6
            ).alias("max_partition_load_32"),
            F.greatest(
                F.lit(1),
                F.ceil(
                    F.col("max_key") * 32.0 / F.col("rows_total")
                ).cast("bigint"),
            )
            .cast("bigint")
            .alias("recommended_salt_factor"),
        )
    )


@query(
    "q281_storage_tiering_plan",
    tags=("infrastructure", "cost", "planning"),
    oracle="""
WITH horizon AS (
  SELECT max(CAST(l_shipdate AS DATE)) AS h FROM lineitem
), parts AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mo,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
), staged AS MATERIALIZED (
  SELECT p.mo, p.n_rows,
         CASE WHEN h.h - p.mo <= 90 THEN 'hot'
              WHEN h.h - p.mo <= 365 THEN 'warm'
              ELSE 'cold' END AS tier,
         CASE WHEN h.h - p.mo <= 90 THEN 0.023
              WHEN h.h - p.mo <= 365 THEN 0.01
              ELSE 0.004 END AS rate
  FROM parts p CROSS JOIN horizon h
), tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows FROM staged
)
SELECT s.tier,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(s.n_rows) AS BIGINT) AS n_rows,
       round(sum(s.n_rows) * 128.0 / 1073741824.0 + 1e-9, 6) AS est_gb,
       round((sum(s.n_rows) * 128.0 / 1073741824.0)
             * any_value(s.rate) + 1e-9, 6) AS monthly_cost,
       round((sum(s.n_rows) * 128.0 / 1073741824.0)
             * (0.023 - any_value(s.rate)) + 1e-9, 6)
         AS monthly_savings_vs_hot,
       round(sum(s.n_rows) * 1.0 / any_value(t.total_rows) + 1e-9, 6)
         AS row_share
FROM staged s CROSS JOIN tot t
GROUP BY s.tier
""",
)
def q281_storage_tiering_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Storage tiering plan over month partitions: hot (≤90 days) /
    warm (≤1 year) / cold tiers by partition age, with estimated
    bytes (128 B/row planning constant), per-tier monthly cost at
    published object-store rates, and the savings a lifecycle policy
    buys versus keeping everything hot — at 100 TB the cold tier is
    usually >80% of bytes, and THIS table is what justifies the
    lifecycle rules q136's partition planner then implements.

    Scale: one month-grain aggregate, a broadcast horizon, a 3-row
    output. Age arithmetic is exact integer days; the rate is
    constant within a tier by construction (any_value is safe); all
    shares are exact ratios (rule 5).
    """
    li = read_table(spark, sf_dir, "lineitem", ["l_shipdate"])
    horizon = li.agg(F.max(F.to_date("l_shipdate")).alias("h"))
    parts = li.groupBy(
        F.trunc("l_shipdate", "month").alias("mo")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    age = F.datediff(F.col("h"), F.col("mo"))
    staged = (
        parts.crossJoin(F.broadcast(horizon))
        .select(
            "mo",
            "n_rows",
            F.when(age <= 90, "hot")
            .when(age <= 365, "warm")
            .otherwise("cold")
            .alias("tier"),
            F.when(age <= 90, 0.023)
            .when(age <= 365, 0.01)
            .otherwise(0.004)
            .alias("rate"),
        )
        .localCheckpoint(eager=False)  # totals + census branches
    )
    tot = staged.agg(F.sum("n_rows").cast("bigint").alias("total_rows"))
    gb = F.sum("n_rows") * 128.0 / 1073741824.0
    return (
        staged.crossJoin(F.broadcast(tot))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            fround(gb, 6).alias("est_gb"),
            fround(gb * F.any_value("rate"), 6).alias("monthly_cost"),
            fround(gb * (0.023 - F.any_value("rate")), 6).alias(
                "monthly_savings_vs_hot"
            ),
            fround(
                F.sum("n_rows") * 1.0 / F.any_value("total_rows"), 6
            ).alias("row_share"),
        )
    )


@query(
    "q300_sampling_accuracy_planner",
    tags=("sampling", "planning", "statistics"),
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         {_hash16_sql("acc|' || CAST(l_orderkey AS VARCHAR) || '|", "l_linenumber")} AS h
  FROM lineitem
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS pos
  FROM base
), eps AS (
  SELECT unnest(['0.050', '0.020', '0.010', '0.005']) AS eps_label,
         unnest([0.05, 0.02, 0.01, 0.005]) AS eps
), plan_ AS (
  SELECT e.eps_label, e.eps, t.n, t.pos,
         CAST(ceil(ln(2.0 / 0.05) / (2.0 * e.eps * e.eps)) AS BIGINT)
           AS n_required,
         CAST(least(65536.0,
                    ceil(ceil(ln(2.0 / 0.05) / (2.0 * e.eps * e.eps))
                         * 65536.0 / t.n)) AS BIGINT) AS thresh
  FROM eps e CROSS JOIN tot t
), sampled AS (
  SELECT p.eps_label, p.eps, p.n, p.pos, p.n_required, p.thresh,
         CAST(count(CASE WHEN b.h < p.thresh THEN 1 END) AS BIGINT)
           AS n_sampled,
         CAST(sum(CASE WHEN b.h < p.thresh THEN b.y ELSE 0 END)
              AS BIGINT) AS pos_sampled
  FROM base b CROSS JOIN plan_ p
  GROUP BY p.eps_label, p.eps, p.n, p.pos, p.n_required, p.thresh
)
SELECT eps_label AS epsilon, n_required, n_sampled,
       round(pos_sampled * 1.0 / n_sampled + 1e-9, 6) AS sample_share,
       round(pos * 1.0 / n + 1e-9, 6) AS true_share,
       round(abs(pos_sampled * 1.0 / n_sampled - pos * 1.0 / n)
             + 1e-9, 6) AS abs_error,
       round(abs(pos_sampled * 1.0 / n_sampled - pos * 1.0 / n)
             + 1e-9, 6) <= eps AS within_eps
FROM sampled
""",
)
def q300_sampling_accuracy_planner(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sampling accuracy planner: the Hoeffding sample size
    n ≥ ln(2/δ)/(2ε²) for estimating a population share within ±ε at
    95% confidence, evaluated at four ε targets, each executed as a
    deterministic keyed-hash sample with the REALIZED error against
    the full-corpus truth reported next to the guarantee — the
    planner that says how small a pilot can be before a 100 TB
    full-scan is justified, with its own promise checked in the same
    result (the q225 realized-error discipline).

    Scale: one hash per row computed once; all four sample rates
    evaluate in a single conditional-count pass (broadcast ε grid) —
    never four scans. Counts exact; shares exact ratios; the
    within_eps flag thresholds ROUNDED magnitudes (q228 rule).
    """
    from .splits import _hash16

    li = read_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag"],
    )
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        _hash16(
            "",
            F.concat(
                F.lit("acc|"),
                F.col("l_orderkey").cast("string"),
                F.lit("|"),
                F.col("l_linenumber").cast("string"),
            ),
        ).alias("h"),
    ).localCheckpoint(eager=False)  # totals + sweep branches
    tot = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("bigint").alias("pos")
    )
    eps = local_frame(spark, 
        [("0.050", 0.05), ("0.020", 0.02), ("0.010", 0.01),
         ("0.005", 0.005)],
        "eps_label string, eps double",
    )
    n_req = F.ceil(
        F.log(2.0 / F.lit(0.05)) / (2.0 * F.col("eps") * F.col("eps"))
    ).cast("bigint")
    plan = eps.crossJoin(F.broadcast(tot)).select(
        "eps_label",
        "eps",
        "n",
        "pos",
        n_req.alias("n_required"),
        F.least(
            F.lit(65536.0),
            F.ceil(n_req * 65536.0 / F.col("n")),
        ).cast("bigint").alias("thresh"),
    )
    in_s = F.col("h") < F.col("thresh")
    sampled = (
        base.crossJoin(F.broadcast(plan))
        .groupBy("eps_label", "eps", "n", "pos", "n_required", "thresh")
        .agg(
            F.count(F.when(in_s, 1)).cast("bigint").alias("n_sampled"),
            F.sum(F.when(in_s, F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("pos_sampled"),
        )
    )
    err = F.abs(
        F.col("pos_sampled") * 1.0 / F.col("n_sampled")
        - F.col("pos") * 1.0 / F.col("n")
    )
    return sampled.select(
        F.col("eps_label").alias("epsilon"),
        "n_required",
        "n_sampled",
        fround(
            F.col("pos_sampled") * 1.0 / F.col("n_sampled"), 6
        ).alias("sample_share"),
        fround(F.col("pos") * 1.0 / F.col("n"), 6).alias("true_share"),
        fround(err, 6).alias("abs_error"),
        (fround(err, 6) <= F.col("eps")).alias("within_eps"),
    )


@query(
    "q336_broadcast_planner",
    tags=("infra", "planning", "join"),
    oracle="""
WITH est AS (
  SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(8 + 4 + strlen(r_name) + 4) AS BIGINT) AS est_bytes
  FROM region
  UNION ALL
  SELECT 'nation', CAST(count(*) AS BIGINT),
         CAST(sum(8 + 4 + strlen(n_name) + 4 + 4) AS BIGINT)
  FROM nation
  UNION ALL
  SELECT 'customer', CAST(count(*) AS BIGINT),
         CAST(sum(8 + 8 + strlen(c_name) + 4 + 4 + 8
                  + strlen(c_mktsegment) + 4) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'supplier', CAST(count(*) AS BIGINT),
         CAST(sum(8 + 8 + strlen(s_name) + 4 + 4 + 8) AS BIGINT)
  FROM supplier
  UNION ALL
  SELECT 'part', CAST(count(*) AS BIGINT),
         CAST(sum(8 + 8 + strlen(p_name) + 4 + strlen(p_brand) + 4
                  + strlen(p_type) + 4 + 4 + 8) AS BIGINT)
  FROM part
)
SELECT tbl, n_rows, est_bytes,
       round(est_bytes / 1048576.0 + 1e-9, 6) AS est_mib,
       est_bytes <= 10485760 AS fits_default_threshold,
       est_bytes <= 104857600 AS fits_tuned_threshold,
       CASE WHEN est_bytes <= 10485760 THEN 'broadcast'
            WHEN est_bytes <= 104857600 THEN 'broadcast_tuned'
            ELSE 'shuffle' END AS join_strategy
FROM est
""",
)
def q336_broadcast_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join planner over the dimension tables: estimate
    each dim's in-memory row footprint from its ACTUAL data (8 bytes
    per 64-bit column, 4 per 32-bit, measured byte length + 4-byte
    header per string, 8 per row object overhead) and classify it
    against Spark's 10 MiB default `autoBroadcastJoinThreshold` and a
    100 MiB tuned ceiling. This is the capacity check behind every
    `F.broadcast()` hint in this repo: at 100 TB the FACT side grows
    but these verdicts are what keep the dim sides shuffle-free —
    and the planner flags the first dim (usually `part`) that
    outgrows the hint as the corpus scales.

    String bytes are exact integers on both engines (Spark
    octet_length ↔ DuckDB strlen — the q170 byte-length pairing);
    everything else is constant-per-row arithmetic, so the whole
    report is integer-exact. One scan per dim, five-row output.
    """
    def est(tbl: str, fixed: int, strings: list[str], keybytes: int):
        df = read_table(spark, sf_dir, tbl)
        size = F.lit(keybytes + fixed)
        for s in strings:
            size = size + F.octet_length(F.col(s)) + F.lit(4)
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(size).cast("bigint").alias("est_bytes"),
        )

    est_all = (
        est("region", 4, ["r_name"], 8)
        .unionByName(est("nation", 4 + 4, ["n_name"], 8))
        .unionByName(
            est("customer", 4 + 8, ["c_name", "c_mktsegment"], 8 + 8)
        )
        .unionByName(est("supplier", 4 + 8, ["s_name"], 8 + 8))
        .unionByName(
            est("part", 4 + 8, ["p_name", "p_brand", "p_type"], 8 + 8)
        )
    )
    return est_all.select(
        "tbl",
        "n_rows",
        "est_bytes",
        fround(F.col("est_bytes") / 1048576.0, 6).alias("est_mib"),
        (F.col("est_bytes") <= 10485760).alias("fits_default_threshold"),
        (F.col("est_bytes") <= 104857600).alias("fits_tuned_threshold"),
        F.when(F.col("est_bytes") <= 10485760, "broadcast")
        .when(F.col("est_bytes") <= 104857600, "broadcast_tuned")
        .otherwise("shuffle")
        .alias("join_strategy"),
    )


@query(
    "q343_hamilton_sampling_allocation",
    tags=("sampling", "planning", "exact"),
    oracle="""
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(9973 * c // s) AS BIGINT) AS base_total
  FROM (SELECT c, CAST(sum(c) OVER () AS BIGINT) AS s FROM cells)
  GROUP BY s
), ranked AS (
  SELECT ce.source, ce.lang, ce.c,
         9973 * ce.c // t.s AS base,
         CAST(row_number() OVER (
           ORDER BY (9973 * ce.c) % t.s DESC, ce.source, ce.lang
         ) AS BIGINT) AS rk,
         9973 - t.base_total AS leftover
  FROM cells ce CROSS JOIN tot t
)
SELECT source, lang, c AS n_docs,
       CAST(base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
            AS BIGINT) AS alloc,
       rk <= leftover AS got_bonus
FROM ranked
""",
)
def q343_hamilton_sampling_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a 9,973-sample
    budget across the (source × lang) corpus cells — the exact-integer
    answer to 'how many examples does each stratum get', where naive
    per-cell round(B·c/N) either over- or under-spends the budget.
    Each cell gets ⌊B·c/N⌋, then the B − Σ⌊·⌋ leftover units go to
    the cells with the LARGEST division remainders (ties broken by
    cell id): Σ alloc == B exactly, every cell within 1 of its exact
    quota — the same scheme q134's mixture rebalance consumes
    downstream and legislatures use for seats.

    Exactness: quota numerators B·c, integer-division bases, and
    remainders (B·c mod N) are all BIGINT — no float appears anywhere,
    so both engines agree bit-for-bit with no rounding convention at
    all (the strongest form of the q256 integer-inequality pattern).
    DuckDB's `/` is FLOAT division even on integers, so the oracle
    spells integer division `//` (floor) — identical to Spark's `div`
    (truncation) because every operand here is non-negative. The
    budget is PRIME (9973) so it never divides the corpus size and
    the remainder stage is always exercised — a round budget against
    a round corpus count degenerates to zero remainders and would
    leave the tie-break path untested.

    Scale: one corpus-sized groupBy to the bounded cell grain
    (|sources|×|langs| ≈ 100); the unpartitioned rank window runs on
    that bounded frame only (the q168 funnel policy).
    """
    docs = read_table(spark, sf_dir, "documents", ["source", "lang"])
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # total + ranked branches
    )
    tot = cells.agg(F.sum("c").cast("bigint").alias("s"))
    base_total = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.expr("9973 * c div s")).cast("bigint").alias(
                "base_total"
            ),
            F.first("s").alias("s"),
        )
    )
    ranked = cells.crossJoin(F.broadcast(base_total)).select(
        "source", "lang", "c",
        F.expr("9973 * c div s").alias("base"),
        F.row_number()
        .over(
            Window.orderBy(
                F.desc(F.expr("(9973 * c) % s")),
                F.asc("source"),
                F.asc("lang"),
            )
        )
        .cast("bigint")
        .alias("rk"),
        (F.lit(9973) - F.col("base_total")).alias("leftover"),
    )
    return ranked.select(
        "source", "lang",
        F.col("c").alias("n_docs"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
        (F.col("rk") <= F.col("leftover")).alias("got_bonus"),
    )


@query(
    "q351_encoding_advisor",
    tags=("planning", "audit", "report"),
    oracle="""
WITH flagged AS (
  SELECT
    CASE WHEN lag(l_returnflag) OVER ww IS NULL
           OR lag(l_returnflag) OVER ww <> l_returnflag
         THEN 1 ELSE 0 END AS b_rf,
    CASE WHEN lag(l_linestatus) OVER ww IS NULL
           OR lag(l_linestatus) OVER ww <> l_linestatus
         THEN 1 ELSE 0 END AS b_ls,
    CASE WHEN lag(l_shipdate) OVER ww IS NULL
           OR lag(l_shipdate) OVER ww <> l_shipdate
         THEN 1 ELSE 0 END AS b_sd,
    CASE WHEN lag(l_partkey) OVER ww IS NULL
           OR lag(l_partkey) OVER ww <> l_partkey
         THEN 1 ELSE 0 END AS b_pk,
    CASE WHEN lag(l_quantity) OVER ww IS NULL
           OR lag(l_quantity) OVER ww <> l_quantity
         THEN 1 ELSE 0 END AS b_qt,
    l_returnflag, l_linestatus, l_shipdate, l_partkey, l_quantity
  FROM lineitem
  WINDOW ww AS (
    PARTITION BY l_orderkey
    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag,
             l_linestatus, l_shipdate
  )
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(b_rf) AS BIGINT) AS r_rf,
         CAST(sum(b_ls) AS BIGINT) AS r_ls,
         CAST(sum(b_sd) AS BIGINT) AS r_sd,
         CAST(sum(b_pk) AS BIGINT) AS r_pk,
         CAST(sum(b_qt) AS BIGINT) AS r_qt,
         CAST(count(DISTINCT l_returnflag) AS BIGINT) AS d_rf,
         CAST(count(DISTINCT l_linestatus) AS BIGINT) AS d_ls,
         CAST(count(DISTINCT l_shipdate) AS BIGINT) AS d_sd,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS d_pk,
         CAST(count(DISTINCT l_quantity) AS BIGINT) AS d_qt
  FROM flagged
), rows_out AS (
  SELECT 'l_returnflag' AS col_name, n, d_rf AS n_distinct, r_rf AS n_runs
    FROM agg
  UNION ALL SELECT 'l_linestatus', n, d_ls, r_ls FROM agg
  UNION ALL SELECT 'l_shipdate', n, d_sd, r_sd FROM agg
  UNION ALL SELECT 'l_partkey', n, d_pk, r_pk FROM agg
  UNION ALL SELECT 'l_quantity', n, d_qt, r_qt FROM agg
)
SELECT col_name, n, n_distinct, n_runs,
       round(CAST(n AS DOUBLE) / n_runs + 1e-9, 4) AS avg_run_len,
       CASE WHEN n_runs * 8 <= n THEN 'rle'
            WHEN n_distinct * 20 <= n THEN 'dict'
            ELSE 'plain' END AS advice
FROM rows_out
""",
)
def q351_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-encoding advisor: per column, the run count the writer
    would see under the table's natural (order, line) clustering plus
    the distinct-value count, reduced to the RLE / dictionary / plain
    recommendation a 100 TB parquet rewrite wants BEFORE it rewrites
    anything (runs*8 <= n: runs pay off; distinct*20 <= n: a
    dictionary pays; both thresholds integer-exact so the verdict can
    never flip on a float boundary).

    Runs are counted WITHIN each l_orderkey partition under a
    total intra-order sort (every remaining column in the key —
    synthetic lineitem has duplicate l_linenumber per order, footgun
    6, and any order-ambiguity between non-identical rows would make
    the run count engine-dependent). Cross-order boundaries count as
    run starts on both engines identically (lag IS NULL).

    Scale: ONE fact pass — the five lag flags share one window spec
    (one hash-partition shuffle on the order key), and the five
    distinct counts ride the same aggregation (Expand); output is the
    fixed 5-row advisory.
    """
    li = read_table(spark, sf_dir, "lineitem")
    ww = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    )

    def boundary(c: str):
        prev = F.lag(F.col(c)).over(ww)
        return (
            F.when(prev.isNull() | (prev != F.col(c)), 1).otherwise(0)
        )

    cols = {
        "l_returnflag": "rf",
        "l_linestatus": "ls",
        "l_shipdate": "sd",
        "l_partkey": "pk",
        "l_quantity": "qt",
    }
    flagged = li.select(
        *[F.col(c) for c in cols],
        *[boundary(c).alias(f"b_{tag}") for c, tag in cols.items()],
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(f"b_{tag}").cast("bigint").alias(f"r_{tag}")
            for tag in cols.values()
        ],
        *[
            F.countDistinct(c).cast("bigint").alias(f"d_{tag}")
            for c, tag in cols.items()
        ],
    )
    stacked = agg.select(
        "n",
        F.expr(
            "stack(5,"
            + ",".join(
                f"'{c}', d_{tag}, r_{tag}" for c, tag in cols.items()
            )
            + ") AS (col_name, n_distinct, n_runs)"
        ),
    )
    return stacked.select(
        "col_name", "n", "n_distinct", "n_runs",
        fround(
            F.col("n").cast("double") / F.col("n_runs"), 4
        ).alias("avg_run_len"),
        F.when(F.col("n_runs") * 8 <= F.col("n"), "rle")
        .when(F.col("n_distinct") * 20 <= F.col("n"), "dict")
        .otherwise("plain")
        .alias("advice"),
    )


@query(
    "q357_filter_attribution_audit",
    tags=("llm-pipeline", "quality", "audit"),
    oracle="""
WITH base AS (
  SELECT n_chars, lang,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_uniq
  FROM documents
), flags AS (
  SELECT
    CASE WHEN n_chars < 100 THEN 1 ELSE 0 END
    + CASE WHEN n_uniq * 2 < n_tok THEN 2 ELSE 0 END
    + CASE WHEN (n_chars - n_tok + 1) * 10 < n_tok * 45 THEN 4 ELSE 0 END
    + CASE WHEN lang NOT IN ('en', 'es') THEN 8 ELSE 0 END AS mask
  FROM base
), grp AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS cnt FROM flags GROUP BY mask
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN mask <> 0 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_dropped
  FROM grp
), filters AS (
  SELECT * FROM (VALUES
    ('too_short', 1), ('repetitive', 2),
    ('short_tokens', 4), ('lang_other', 8)
  ) f(filter_name, bit)
)
SELECT f.filter_name,
       CAST(coalesce(sum(CASE WHEN (g.mask & f.bit) <> 0
                               THEN g.cnt END), 0) AS BIGINT) AS n_flagged,
       CAST(coalesce(sum(CASE WHEN g.mask = f.bit THEN g.cnt END), 0)
            AS BIGINT) AS n_unique_drops,
       t.n_docs, t.n_dropped,
       round(CAST(coalesce(sum(CASE WHEN (g.mask & f.bit) <> 0
                                     THEN g.cnt END), 0) AS BIGINT)
             / CAST(t.n_docs AS DOUBLE) + 1e-9, 6) AS flag_share,
       round(CAST(coalesce(sum(CASE WHEN g.mask = f.bit THEN g.cnt END), 0)
                  AS BIGINT)
             / CAST(t.n_docs AS DOUBLE) + 1e-9, 6) AS unique_share
FROM filters f CROSS JOIN grp g CROSS JOIN tot t
GROUP BY f.filter_name, t.n_docs, t.n_dropped
""",
)
def q357_filter_attribution_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cleaning-filter attribution: for each of four deterministic
    quality rules (too short, heavy token repetition, short average
    tokens, non-core language), how many documents it flags and — the
    number that actually drives pipeline tuning — how many it alone
    would drop (n_unique_drops: docs no other rule catches). A rule
    with large n_flagged but near-zero unique drops is redundant; one
    with large unique drops is the rule to re-examine before a 100 TB
    run deletes that slice. The q354 bitmask-lattice machinery
    pointed at filter predicates instead of sources.

    Exactness: every predicate is an integer inequality (avg token
    length < 4.5 is cross-multiplied to (n_chars - n_tok + 1)*10 <
    n_tok*45 — no float threshold, the q256 rule); masks and counts
    are exact integers, the two shares integer ratios (rule 5).

    Scale: ONE corpus scan to a <=16-row mask histogram; attribution
    is a broadcast cross of the fixed 4-row filter frame against that
    bounded histogram — re-auditing after a threshold change never
    rescans the corpus if the mask frame is cached.
    """
    docs = read_table(spark, sf_dir, "documents", ["n_chars", "lang", "text"])
    base = docs.select(
        "n_chars", "lang", F.split(F.col("text"), " ").alias("_toks")
    ).select(
        "n_chars", "lang",
        F.size("_toks").alias("n_tok"),
        F.size(F.array_distinct("_toks")).alias("n_uniq"),
    )
    mask = (
        F.when(F.col("n_chars") < 100, 1).otherwise(0)
        + F.when(F.col("n_uniq") * 2 < F.col("n_tok"), 2).otherwise(0)
        + F.when(
            (F.col("n_chars") - F.col("n_tok") + 1) * 10
            < F.col("n_tok") * 45,
            4,
        ).otherwise(0)
        + F.when(~F.col("lang").isin("en", "es"), 8).otherwise(0)
    )
    grp = (
        base.select(mask.alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # totals + attribution branches
    )
    tot = grp.agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("mask") != 0, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
    )
    filters = local_frame(spark, 
        [("too_short", 1), ("repetitive", 2), ("short_tokens", 4),
         ("lang_other", 8)],
        "filter_name string, bit int",
    )
    flagged = F.sum(
        F.when(F.col("mask").bitwiseAND(F.col("bit")) != 0, F.col("cnt"))
    )
    unique = F.sum(F.when(F.col("mask") == F.col("bit"), F.col("cnt")))
    return (
        filters.crossJoin(F.broadcast(grp))
        .crossJoin(F.broadcast(tot))
        .groupBy("filter_name", "n_docs", "n_dropped")
        .agg(
            F.coalesce(flagged, F.lit(0)).cast("bigint").alias("n_flagged"),
            F.coalesce(unique, F.lit(0)).cast("bigint").alias(
                "n_unique_drops"
            ),
        )
        .select(
            "filter_name", "n_flagged", "n_unique_drops", "n_docs",
            "n_dropped",
            fround(
                F.col("n_flagged") / F.col("n_docs").cast("double"), 6
            ).alias("flag_share"),
            fround(
                F.col("n_unique_drops") / F.col("n_docs").cast("double"), 6
            ).alias("unique_share"),
        )
    )


_Q361_FD_SQL = """
  SELECT '{fd}' AS fd,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_keys,
         round((CAST(sum(c) AS BIGINT) - CAST(sum(mx) AS BIGINT))
               / CAST(sum(c) AS DOUBLE) + 1e-9, 6) AS g3_error,
         CAST(sum(c) AS BIGINT) = CAST(sum(mx) AS BIGINT) AS holds
  FROM (
    SELECT lhs, CAST(sum(cnt) AS BIGINT) AS c, CAST(max(cnt) AS BIGINT)
             AS mx, CAST(count(*) AS BIGINT) AS nv
    FROM (
      SELECT {lhs} AS lhs, {rhs} AS rhs, count(*) AS cnt
      FROM {table} GROUP BY 1, 2
    ) GROUP BY lhs
  )"""

_Q361_FDS = [
    ("o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("o_custkey->o_orderstatus", "orders", "o_custkey", "o_orderstatus"),
    ("l_partkey->l_returnflag", "lineitem", "l_partkey", "l_returnflag"),
    ("c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
    ("user_id->event_type", "events", "user_id", "event_type"),
]


@query(
    "q361_functional_dependency_audit",
    tags=("audit", "quality", "report"),
    oracle="\nUNION ALL".join(
        _Q361_FD_SQL.format(fd=fd, table=t, lhs=l, rhs=r)
        for fd, t, l, r in _Q361_FDS
    ),
)
def q361_functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate functional-dependency profile: for five candidate
    FDs (does a customer always order at one priority? is a part's
    return behavior part-determined?), the g3 error — the MINIMUM
    fraction of rows to delete for the FD to hold exactly, computed as
    (n - sum over keys of the modal count) / n, the standard AFD
    discovery metric (Kivinen-Mannila). g3 near 0 marks a dependency
    worth enforcing as a constraint or exploiting for normalization /
    dictionary encoding (q351's advisor at the SEMANTIC level);
    n_violating_keys localizes the cleanup.

    Exactness: everything up to the final ratio is exact integer
    counting on the (lhs, rhs) contingency grain — the modal count
    needs max(), never argmax, so no tie-break subtlety exists (the
    count is unique even when the modal VALUE is tied); the g3 ratio
    is an integer ratio (rule 5) and the holds flag an exact integer
    equality.

    Scale: each FD is one grouped pass to its domain-sized
    contingency frame, then a key-grain reduction; the five one-row
    results union. No joins, no windows, nothing row-scale past the
    first groupBy.
    """
    # a table can appear in >1 FD: read once with the union of columns
    cols_by_table: dict[str, set] = {}
    for _fd, t, l, r in _Q361_FDS:
        cols_by_table.setdefault(t, set()).update((l, r))
    tables = {
        t: read_table(spark, sf_dir, t, sorted(cols))
        for t, cols in cols_by_table.items()
    }
    outs = []
    for fd, t, l, r in _Q361_FDS:
        pair = (
            tables[t]
            .groupBy(F.col(l).alias("lhs"), F.col(r).alias("rhs"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        per_key = pair.groupBy("lhs").agg(
            F.sum("cnt").cast("bigint").alias("c"),
            F.max("cnt").cast("bigint").alias("mx"),
            F.count(F.lit(1)).cast("bigint").alias("nv"),
        )
        outs.append(
            per_key.agg(
                F.lit(fd).alias("fd"),
                F.sum("c").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("nv") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_keys"),
                fround(
                    (
                        F.sum("c").cast("bigint")
                        - F.sum("mx").cast("bigint")
                    )
                    / F.sum("c").cast("double"),
                    6,
                ).alias("g3_error"),
                (
                    F.sum("c").cast("bigint") == F.sum("mx").cast("bigint")
                ).alias("holds"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def _q366_oracle(n_rounds: int = 5) -> str:
    """Unrolled IPF (raking) oracle: each round is a row-scaling step
    then a column-scaling step; every CTE is MATERIALIZED (each round
    references its predecessor twice — the q241 discipline)."""
    parts = [
        """
WITH cells AS MATERIALIZED (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
), tot AS MATERIALIZED (
  SELECT CAST(sum(n) AS BIGINT) AS nt,
         CAST(count(DISTINCT source) AS BIGINT) AS ns
  FROM cells
), rowt AS MATERIALIZED (
  SELECT source, CAST(nt AS DOUBLE) / ns AS rt FROM
    (SELECT DISTINCT source FROM cells) CROSS JOIN tot
), colt AS MATERIALIZED (
  SELECT lang, CAST(sum(n) AS DOUBLE) AS ct FROM cells GROUP BY lang
), w0 AS MATERIALIZED (
  SELECT source, lang, CAST(n AS DOUBLE) AS w FROM cells
)"""
    ]
    for i in range(1, n_rounds + 1):
        p = i - 1
        parts.append(
            f""", r{i} AS MATERIALIZED (
  SELECT w.source, w.lang, w.w * rt / rsum AS w
  FROM w{p} w
  JOIN (SELECT source, sum(w) AS rsum FROM w{p} GROUP BY source) s
    USING (source)
  JOIN rowt USING (source)
), w{i} AS MATERIALIZED (
  SELECT r.source, r.lang, r.w * ct / csum AS w
  FROM r{i} r
  JOIN (SELECT lang, sum(w) AS csum FROM r{i} GROUP BY lang) c
    USING (lang)
  JOIN colt USING (lang)
)"""
        )
    last = n_rounds
    parts.append(
        f"""
SELECT w.source, w.lang, c.n AS n_docs,
       round(w.w + 1e-9, 6) AS raked_weight,
       round(w.w / c.n + 1e-9, 6) AS sampling_rate
FROM w{last} w JOIN cells c USING (source, lang)"""
    )
    return "".join(parts)


@query(
    "q366_raking_ipf_plan",
    tags=("sampling", "planning", "iterative"),
    oracle=_q366_oracle(5),
)
def q366_raking_ipf_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative-proportional-fitting (raking) resampling plan: rake
    the (source x lang) document contingency table to UNIFORM source
    marginals while PRESERVING the observed language mix — the 2-D
    generalization of q343's one-dimensional Hamilton allocation, and
    the standard survey-statistics answer to "balance the feeds
    without distorting the language distribution". Five unrolled
    row-then-column scaling rounds; the per-cell sampling_rate is the
    multiplier a weighted sampler applies downstream (q134's
    rebalance consumes exactly this shape).

    Exactness: cell counts and both target marginals derive from
    exact integers; each IPF step multiplies by a ratio of a target
    to a <=|langs|- or <=|sources|-term float sum — ratios near 1
    with no cancellation, so cross-engine sum-order noise stays at
    the ulp through 5 rounds and fround-6 absorbs it. The oracle
    unrolls the SAME schedule with MATERIALIZED CTEs.

    Scale: one corpus scan to the bounded contingency frame;
    iteration never touches row-scale data again.
    """
    docs = read_table(spark, sf_dir, "documents", ["source", "lang"])
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)  # marginals + iteration branches
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.countDistinct("source").cast("bigint").alias("ns"),
    )
    rowt = (
        cells.select("source")
        .distinct()
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (F.col("nt").cast("double") / F.col("ns")).alias("rt"),
        )
    )
    colt = cells.groupBy("lang").agg(
        F.sum("n").cast("double").alias("ct")
    )
    w = cells.select("source", "lang", F.col("n").cast("double").alias("w"))
    for _ in range(5):
        rsum = w.groupBy("source").agg(F.sum("w").alias("rsum"))
        w = (
            w.join(F.broadcast(rsum), "source")
            .join(F.broadcast(rowt), "source")
            .select(
                "source", "lang",
                (F.col("w") * F.col("rt") / F.col("rsum")).alias("w"),
            )
        )
        csum = w.groupBy("lang").agg(F.sum("w").alias("csum"))
        w = (
            w.join(F.broadcast(csum), "lang")
            .join(F.broadcast(colt), "lang")
            .select(
                "source", "lang",
                (F.col("w") * F.col("ct") / F.col("csum")).alias("w"),
            )
            # w is referenced twice per half-round (marginal sum +
            # join) — without per-round truncation the logical plan
            # doubles per half-step (2^10 leaves at 5 rounds; r07
            # PLANS.md recorded 3410 exchanges for this 25-cell
            # frame). Same convention as q299/bfs_hops.
            .localCheckpoint(eager=False)
        )
    return w.join(cells, ["source", "lang"]).select(
        "source", "lang",
        F.col("n").alias("n_docs"),
        fround(F.col("w"), 6).alias("raked_weight"),
        fround(F.col("w") / F.col("n"), 6).alias("sampling_rate"),
    )


@query(
    "q387_zonemap_pruning_audit",
    tags=("layout", "lakehouse", "pruning", "planning"),
    oracle="""
WITH days AS (
  SELECT l_orderkey,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_num,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS ym
  FROM lineitem
), bounds AS (
  SELECT min(l_orderkey) AS mino, max(l_orderkey) AS maxo,
         min(day_num) AS mind, max(day_num) AS maxd
  FROM days
), tagged AS MATERIALIZED (
  SELECT day_num, ym,
         CASE WHEN maxo = mino THEN 0
              ELSE ((l_orderkey - mino) * 255) // (maxo - mino) END
           AS natchunk,
         CASE WHEN maxd = mind THEN 0
              ELSE ((day_num - mind) * 255) // (maxd - mind) END AS dchunk
  FROM days CROSS JOIN bounds
), chunks AS MATERIALIZED (
  SELECT layout, chunk,
         min(day_num) AS zmin, max(day_num) AS zmax,
         CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT 'natural' AS layout, natchunk AS chunk, day_num FROM tagged
    UNION ALL
    SELECT 'date_sorted', dchunk, day_num FROM tagged
  ) GROUP BY layout, chunk
), months AS MATERIALIZED (
  SELECT ym, min(day_num) AS mstart, max(day_num) AS mend
  FROM tagged GROUP BY ym
), pairs AS (
  SELECT c.layout, c.n,
         CASE WHEN c.zmin <= m.mend AND c.zmax >= m.mstart
              THEN 1 ELSE 0 END AS scanned
  FROM chunks c CROSS JOIN months m
), spans AS (
  SELECT layout,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(zmax - zmin + 1) AS BIGINT) AS span_days_total,
         CAST(sum(n) AS BIGINT) AS n_rows
  FROM chunks GROUP BY layout
), scans AS (
  SELECT layout,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(scanned) AS BIGINT) AS chunk_scans,
         CAST(sum(scanned * n) AS BIGINT) AS rows_scanned
  FROM pairs GROUP BY layout
)
SELECT sp.layout, sp.n_chunks, sp.n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM months) AS n_months,
       sc.chunk_scans,
       round(CAST(sc.chunk_scans AS DOUBLE)
             / CAST(sc.n_pairs AS DOUBLE) + 1e-9, 6) AS chunk_scan_fraction,
       round(CAST(sc.rows_scanned AS DOUBLE)
             / (CAST(sp.n_rows AS DOUBLE)
                * (SELECT count(*) FROM months)) + 1e-9, 6)
         AS row_scan_fraction,
       round(CAST(sp.span_days_total AS DOUBLE)
             / CAST(sp.n_chunks AS DOUBLE) + 1e-9, 2) AS avg_chunk_span_days
FROM spans sp JOIN scans sc ON sp.layout = sc.layout
""",
)
def q387_zonemap_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file min/max statistics) pruning simulator: carve
    lineitem into 256 fixed-width chunks under two physical layouts —
    natural ingestion order (l_orderkey ranges, the q126 chunk
    convention) and ship-date-sorted — record each chunk's
    min/max ship-day "zone map", then replay the canonical monthly
    predicate workload (every calendar month present in the data as a
    BETWEEN range) and count which chunks a min/max-pruning reader
    must scan. Where q126 scores layout quality by GEOMETRY (Morton
    spans), this measures the operational quantity directly: the
    fraction of chunks and of ROWS touched per month query — the
    number that decides whether a 100 TB table answers a month query
    by reading 1/84th of its files or all of them.

    Exactness: chunk ids are the q126 exact integer quantization
    (scaled integer division, degenerate single-value guard); zone
    maps, month ranges, and the interval-intersection scan test
    (zmin <= mend AND zmax >= mstart) are pure integer min/max/
    compares; every fraction is an integer-count ratio (rule 5).

    Scale: two token passes reduce to a 512-row chunk frame and an
    ~84-row month frame; the predicate replay is a bounded
    (chunks x months) broadcast cross join — never touches fact rows
    again. The tagged frame feeds chunk and month reductions, so it
    localCheckpoints (repo convention).
    """
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    days = li.select(
        "l_orderkey",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("bigint").alias("day_num"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint").alias("ym"),
    )
    bounds = days.agg(
        F.min("l_orderkey").alias("mino"),
        F.max("l_orderkey").alias("maxo"),
        F.min("day_num").alias("mind"),
        F.max("day_num").alias("maxd"),
    )
    tagged = (
        days.crossJoin(F.broadcast(bounds))
        .select(
            "day_num",
            "ym",
            F.when(F.col("maxo") == F.col("mino"), F.lit(0).cast("bigint"))
            .otherwise(
                F.expr("((l_orderkey - mino) * 255) div (maxo - mino)")
            ).alias("natchunk"),
            F.when(F.col("maxd") == F.col("mind"), F.lit(0).cast("bigint"))
            .otherwise(
                F.expr("((day_num - mind) * 255) div (maxd - mind)")
            ).alias("dchunk"),
        )
        .localCheckpoint(eager=False)  # chunk + month reduction branches
    )
    both = tagged.select(
        F.lit("natural").alias("layout"),
        F.col("natchunk").alias("chunk"),
        "day_num",
    ).unionAll(
        tagged.select(
            F.lit("date_sorted").alias("layout"),
            F.col("dchunk").alias("chunk"),
            "day_num",
        )
    )
    chunks = both.groupBy("layout", "chunk").agg(
        F.min("day_num").alias("zmin"),
        F.max("day_num").alias("zmax"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)  # span + scan branches
    months = tagged.groupBy("ym").agg(
        F.min("day_num").alias("mstart"),
        F.max("day_num").alias("mend"),
    )
    n_months = months.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months")
    )
    pairs = chunks.crossJoin(F.broadcast(months)).select(
        "layout",
        "n",
        F.when(
            (F.col("zmin") <= F.col("mend"))
            & (F.col("zmax") >= F.col("mstart")),
            1,
        ).otherwise(0).alias("scanned"),
    )
    spans = chunks.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.col("zmax") - F.col("zmin") + 1)
        .cast("bigint").alias("span_days_total"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    scans = pairs.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("scanned").cast("bigint").alias("chunk_scans"),
        F.sum(F.col("scanned") * F.col("n"))
        .cast("bigint").alias("rows_scanned"),
    )
    return (
        spans.join(scans, "layout")
        .crossJoin(F.broadcast(n_months))
        .select(
            "layout",
            "n_chunks",
            "n_rows",
            "n_months",
            "chunk_scans",
            fround(
                F.col("chunk_scans").cast("double")
                / F.col("n_pairs").cast("double"),
                6,
            ).alias("chunk_scan_fraction"),
            fround(
                F.col("rows_scanned").cast("double")
                / (
                    F.col("n_rows").cast("double")
                    * F.col("n_months").cast("double")
                ),
                6,
            ).alias("row_scan_fraction"),
            fround(
                F.col("span_days_total").cast("double")
                / F.col("n_chunks").cast("double"),
                2,
            ).alias("avg_chunk_span_days"),
        )
    )


@query(
    "q397_source_mixing_temperature",
    tags=("llm-pipeline", "planner", "sampling"),
    oracle="""
WITH srcs AS (
  SELECT source,
         CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS BIGINT)
           AS n_tok
  FROM documents GROUP BY source
), alphas AS (
  SELECT CAST(alpha AS DOUBLE) AS alpha
  FROM (VALUES (0.3), (0.5), (0.7)) t(alpha)
), wtbl AS MATERIALIZED (
  SELECT source, alpha, n_tok,
         CAST(round(pow(CAST(n_tok AS DOUBLE), alpha) * 1000000 + 1e-9, 0)
              AS BIGINT) AS w_ppm
  FROM srcs CROSS JOIN alphas
), tots AS (
  SELECT alpha, CAST(sum(w_ppm) AS BIGINT) AS tot_ppm
  FROM wtbl GROUP BY alpha
)
SELECT w.source, w.alpha, w.n_tok, w.w_ppm,
       round(w.w_ppm * 1.0 / t.tot_ppm + 1e-9, 6) AS share,
       round(CAST(1000000 * w.w_ppm AS DOUBLE)
             / CAST(t.tot_ppm * w.n_tok AS DOUBLE) + 1e-9, 4)
         AS epochs_at_1m,
       round(CAST(1000000 * w.w_ppm AS DOUBLE)
             / CAST(t.tot_ppm * w.n_tok AS DOUBLE) + 1e-9, 4) > 4.0
         AS oversampled
FROM wtbl w JOIN tots t ON t.alpha = w.alpha
""",
)
def q397_source_mixing_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-source sampling-temperature plan (the mC4/PaLM
    exponentiated-mixing rule): sampling weight for source i is
    n_i^alpha / sum_j n_j^alpha, swept over alpha in {0.3, 0.5, 0.7}
    — alpha < 1 upsamples small sources, and the planner reports per
    (source, alpha) the mixture share plus the effective EPOCH count
    a 1M-token budget implies, flagging sources an alpha would
    recycle more than 4x (the overfitting-on-small-sources signal
    that drives alpha selection in practice).

    Engine-exactness: token counts are exact BIGINTs; each pow() runs
    once per (source, alpha) on an identical double (q222 precedent)
    and is quantized to integer ppm immediately (q384 rule), so the
    per-alpha normalizer is an exact BIGINT sum, never an
    order-dependent float sum. The epoch ratio is a single division
    of two cast-once exact integers (numerator 1e6 * w_ppm stays
    under int64 up to sf~10); the oversampled flag compares the
    ROUNDED ratio on both sides (q348 rule).

    Scale: one map-side-combined token-count pass, then a 60-row
    planning frame. The mixture math never touches the corpus again.
    """
    docs = read_table(spark, sf_dir, "documents", ["text", "source"])
    srcs = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tok")
    )
    alphas = local_frame(spark, 
        [(0.3,), (0.5,), (0.7,)], "alpha double"
    )
    wtbl = (
        srcs.crossJoin(F.broadcast(alphas))
        .select(
            "source",
            "alpha",
            "n_tok",
            F.round(
                F.pow(F.col("n_tok").cast("double"), F.col("alpha")) * 1000000
                + 1e-9,
                0,
            )
            .cast("bigint")
            .alias("w_ppm"),
        )
        .localCheckpoint(eager=False)  # feeds tots AND the final join
    )
    tots = wtbl.groupBy("alpha").agg(
        F.sum("w_ppm").cast("bigint").alias("tot_ppm")
    )
    epochs = fround(
        (1000000 * F.col("w_ppm")).cast("double")
        / (F.col("tot_ppm") * F.col("n_tok")).cast("double"),
        4,
    )
    return wtbl.join(F.broadcast(tots), "alpha").select(
        "source",
        "alpha",
        "n_tok",
        "w_ppm",
        fround(F.col("w_ppm") * 1.0 / F.col("tot_ppm"), 6).alias("share"),
        epochs.alias("epochs_at_1m"),
        (epochs > 4.0).alias("oversampled"),
    )


@query(
    "q398_neyman_allocation_plan",
    tags=("sampling", "planning", "statistics"),
    oracle="""
WITH nobs AS (
  SELECT c.c_mktsegment AS segment,
         CAST(round(o.o_totalprice) AS BIGINT) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), nsegs AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(y) AS BIGINT) AS BIGINT) AS sy,
         CAST(CAST(sum(y * y) AS BIGINT) AS BIGINT) AS syy
  FROM nobs GROUP BY segment HAVING count(*) >= 2
), nstats AS MATERIALIZED (
  SELECT segment, n,
         CAST(round(CAST(n AS DOUBLE)
                    * sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                    + 1e-9, 0) AS BIGINT) AS w,
         round(sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               + 1e-9, 4) AS sd
  FROM nsegs
), ntot AS (
  SELECT CAST(sum(w) AS BIGINT) AS wt,
         CAST(sum(n) AS BIGINT) AS nt,
         CAST(sum(9973 * w // wsum) AS BIGINT) AS nbase_total,
         CAST(sum(9973 * n // nsum) AS BIGINT) AS pbase_total
  FROM (SELECT w, n,
               CAST(sum(w) OVER () AS BIGINT) AS wsum,
               CAST(sum(n) OVER () AS BIGINT) AS nsum
        FROM nstats)
  GROUP BY ALL
), nranked AS (
  SELECT s.segment, s.n, s.sd, s.w,
         9973 * s.w // t.wt AS nbase,
         CAST(row_number() OVER (
           ORDER BY (9973 * s.w) % t.wt DESC, s.segment
         ) AS BIGINT) AS nrk,
         9973 - t.nbase_total AS nleft,
         9973 * s.n // t.nt AS pbase,
         CAST(row_number() OVER (
           ORDER BY (9973 * s.n) % t.nt DESC, s.segment
         ) AS BIGINT) AS prk,
         9973 - t.pbase_total AS pleft
  FROM nstats s CROSS JOIN ntot t
)
SELECT segment, n AS stratum_n, sd,
       CAST(nbase + (CASE WHEN nrk <= nleft THEN 1 ELSE 0 END) AS BIGINT)
         AS neyman_alloc,
       CAST(pbase + (CASE WHEN prk <= pleft THEN 1 ELSE 0 END) AS BIGINT)
         AS proportional_alloc,
       CAST((nbase + (CASE WHEN nrk <= nleft THEN 1 ELSE 0 END))
            - (pbase + (CASE WHEN prk <= pleft THEN 1 ELSE 0 END))
            AS BIGINT) AS shift
FROM nranked
""",
)
def q398_neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: a 9,973-sample
    budget split across market segments proportionally to N_h·S_h
    (population size × within-stratum standard deviation) — the
    allocation that minimizes the stratified estimator's variance —
    side by side with the plain proportional split and the per-
    stratum shift between them. High-variance strata buy sampling
    budget from homogeneous ones; this is the planner a data-labeling
    or survey pipeline runs before drawing the q128 hash samples.

    Engine-exactness: stratum moments are exact BIGINTs (the q393
    frame); each weight N_h·S_h is a deterministic double quantized
    ONCE to an integer unit (q384 rule), so BOTH apportionments run
    the all-integer Hamilton largest-remainder scheme of q343 — prime
    budget, BIGINT quotas/remainders, segment tie-break — and sum to
    exactly 9,973 on both engines with no float anywhere past the
    quantization.

    Scale: one join + one aggregation to the 5-stratum grain;
    everything after is bounded-frame integer arithmetic with two
    5-row rank windows (the q168 funnel policy).
    """
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    obs = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice")).cast("bigint").alias("y"),
    )
    segs = (
        obs.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
        .where(F.col("n") >= 2)
    )
    n_d = F.col("n").cast("double")
    sd = F.sqrt(
        (n_d * F.col("syy").cast("double")
         - F.col("sy").cast("double") * F.col("sy").cast("double"))
        / (n_d * (n_d - 1.0))
    )
    stats = segs.select(
        "segment",
        "n",
        F.round(n_d * sd + 1e-9, 0).cast("bigint").alias("w"),
        fround(sd, 4).alias("sd"),
    ).localCheckpoint(eager=False)  # totals + ranked branches
    tot = stats.agg(
        F.sum("w").cast("bigint").alias("wt"),
        F.sum("n").cast("bigint").alias("nt"),
    )
    base_total = stats.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr("9973 * w div wt")).cast("bigint").alias("nbase_total"),
        F.sum(F.expr("9973 * n div nt")).cast("bigint").alias("pbase_total"),
        F.first("wt").alias("wt"),
        F.first("nt").alias("nt"),
    )
    ranked = stats.crossJoin(F.broadcast(base_total)).select(
        "segment", "n", "sd", "w",
        F.expr("9973 * w div wt").alias("nbase"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.expr("(9973 * w) % wt")), "segment"))
        .cast("bigint")
        .alias("nrk"),
        (F.lit(9973) - F.col("nbase_total")).alias("nleft"),
        F.expr("9973 * n div nt").alias("pbase"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.expr("(9973 * n) % nt")), "segment"))
        .cast("bigint")
        .alias("prk"),
        (F.lit(9973) - F.col("pbase_total")).alias("pleft"),
    )
    neyman = (
        F.col("nbase") + F.when(F.col("nrk") <= F.col("nleft"), 1).otherwise(0)
    ).cast("bigint")
    prop = (
        F.col("pbase") + F.when(F.col("prk") <= F.col("pleft"), 1).otherwise(0)
    ).cast("bigint")
    return ranked.select(
        "segment",
        F.col("n").alias("stratum_n"),
        "sd",
        neyman.alias("neyman_alloc"),
        prop.alias("proportional_alloc"),
        (neyman - prop).cast("bigint").alias("shift"),
    )
