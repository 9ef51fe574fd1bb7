"""End-to-end runner test: raw fixtures -> scores, with parquet
materialization, week partitioning, and partition pruning asserted."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.ml.train import permutation_importance
from big_data_bowl_2026_analytics_spark.pipeline.run import run_pipeline
from big_data_bowl_2026_analytics_spark.plans.explain import physical_plan
from big_data_bowl_2026_analytics_spark.schemas import (
    PLAYS_SCHEMA,
    TRACKING_AFTER_SCHEMA,
    TRACKING_BEFORE_SCHEMA,
)
from fixtures_nfl import make_plays, make_tracking_after, make_tracking_before


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("pipeline"))
    before = spark.createDataFrame(
        [tuple(r[f.name] for f in TRACKING_BEFORE_SCHEMA.fields) for r in make_tracking_before()],
        TRACKING_BEFORE_SCHEMA,
    )
    after = spark.createDataFrame(
        [tuple(r[f.name] for f in TRACKING_AFTER_SCHEMA.fields) for r in make_tracking_after()],
        TRACKING_AFTER_SCHEMA,
    )
    plays = spark.createDataFrame(
        [tuple(p[f.name] for f in PLAYS_SCHEMA.fields) for p in make_plays()],
        PLAYS_SCHEMA,
    )
    return workdir, run_pipeline(spark, before, after, plays, workdir, train_weeks=9)


def test_runner_produces_scores_for_test_week_plays(result):
    # Scores exist only for TEST-week plays (the reference's scores.csv
    # holds the 1,902 test plays; train weeks are never inferred).
    _, res = result
    scores = res.scores.collect()
    assert {r["play_id"] for r in scores} == {2}
    row = scores[0]
    assert row["receiver_id"] == 5 and row["defender_id"] == 6
    assert row["deception_score"] is not None
    assert row["recovery_score"] is not None


def test_runner_week_split(result):
    _, res = result
    assert {r["play_id"] for r in res.train.collect()} == {1}  # week 1
    assert {r["play_id"] for r in res.test.collect()} == {2}  # week 10


def test_week_partitioned_layout_and_pruning(spark, result):
    workdir, _ = result
    root = os.path.join(workdir, "tracking_before_cleaned")
    assert os.path.isdir(os.path.join(root, "week=1"))
    assert os.path.isdir(os.path.join(root, "week=10"))
    df = spark.read.parquet(root).where(F.col("week") == 1)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan and "week" in plan
    # the pruned read only touches week=1 files
    assert df.count() > 0
    assert {r["play_id"] for r in df.select("play_id").distinct().collect()} == {1}


def test_model_is_deterministic_and_scores_sane(result):
    _, res = result
    assert res.model.feature_cols
    probs = [
        r["recovery_score"] for r in res.scores.collect() if r["recovery_score"] is not None
    ]
    assert all(-1.0 <= p <= 1.2 for p in probs)


def test_permutation_importance_runs(result):
    _, res = result
    imp = permutation_importance(res.model, res.test, n_repeats=3)
    assert set(imp) == set(res.model.feature_cols)
