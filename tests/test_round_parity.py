"""Property test for the cross-engine stable rounding (fround):
Spark's round(x + 1e-9, n) must equal DuckDB's for adversarial doubles
— including values engineered to sit exactly on decimal half
boundaries, where the engines' raw round() semantics diverge
(exact-binary-expansion vs shortest-representation rounding)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from big_data_bowl_2026_analytics_spark.functions.scalar import fround
from pyspark.sql import functions as F


def _adversarial_values(n: int = 4000) -> np.ndarray:
    rng = np.random.RandomState(11)
    uniform = rng.uniform(-1e6, 1e6, n // 4)
    # values on exact .5 decimal boundaries at scales 2 and 4
    half_2dp = np.round(rng.uniform(-1000, 1000, n // 4), 3)
    half_2dp = np.trunc(half_2dp * 100) / 100 + 0.005
    half_4dp = np.trunc(rng.uniform(-10, 10, n // 4) * 10000) / 10000 + 0.00005
    # binary-exact fractions (representable halves like 0.03125)
    binfrac = rng.randint(-(2**20), 2**20, n // 4) / np.float64(2**15)
    return np.concatenate([uniform, half_2dp, half_4dp, binfrac])


def test_fround_matches_duckdb_on_adversarial_doubles(spark):
    vals = _adversarial_values()
    pdf = pd.DataFrame({"i": np.arange(len(vals)), "x": vals})
    df = spark.createDataFrame(pdf)
    got = (
        df.select("i", fround(F.col("x"), 2).alias("r2"), fround(F.col("x"), 4).alias("r4"))
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        "SELECT i, round(x + 1e-9, 2) AS r2, round(x + 1e-9, 4) AS r4 FROM t ORDER BY i"
    ).fetchdf()
    assert (got["r2"].to_numpy() == want["r2"].to_numpy()).all()
    assert (got["r4"].to_numpy() == want["r4"].to_numpy()).all()


def test_raw_round_actually_diverges_without_nudge(spark):
    """Documents WHY fround exists: raw round() disagrees between the
    engines on a boundary double."""
    x = 31.896749999999997  # shortest repr "31.89675"
    spark_val = spark.createDataFrame([(x,)], "x double").select(
        F.round("x", 4).alias("r")
    ).collect()[0]["r"]
    duck_val = duckdb.connect().execute(
        "SELECT round(CAST(31.896749999999997 AS DOUBLE), 4)"
    ).fetchone()[0]
    assert spark_val != duck_val  # 31.8967 (Spark) vs 31.8968 (DuckDB)
