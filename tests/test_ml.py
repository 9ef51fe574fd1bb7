"""Tests for the ML stack: deterministic training, distributed pandas
UDF scoring parity with driver-side numpy, and evaluation metrics
against closed-form answers."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_bowl_2026_analytics_spark.ml import (
    LogisticModel,
    binary_metrics,
    calibration_bins,
    score_dataframe,
    train_logistic,
)


def test_train_logistic_deterministic_and_learns():
    rng = np.random.RandomState(0)
    X = rng.randn(500, 3)
    y = (X[:, 0] - 0.5 * X[:, 1] > 0).astype(float)
    m1 = train_logistic(X, y, ("a", "b", "c"))
    m2 = train_logistic(X, y, ("a", "b", "c"))
    assert np.array_equal(m1.weights, m2.weights) and m1.bias == m2.bias
    acc = ((m1.predict_proba(X) > 0.5) == y).mean()
    assert acc > 0.9


def test_udf_scoring_matches_driver_numpy(spark):
    rng = np.random.RandomState(1)
    X = rng.randn(200, 2)
    model = LogisticModel(np.array([0.7, -1.1]), 0.2, ("f1", "f2"))
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in X], "f1 double, f2 double"
    )
    got = np.array(
        [r["probability"] for r in score_dataframe(df, model).collect()]
    )
    want = model.predict_proba(X)
    # row order from collect matches input order on a narrow pipeline,
    # but sort both to be safe
    assert np.allclose(np.sort(got), np.sort(want), atol=1e-12)


def test_binary_metrics_perfect_classifier(spark):
    rows = [(0.9, 1.0)] * 10 + [(0.1, 0.0)] * 10
    df = spark.createDataFrame(rows, "probability double, target double")
    m = binary_metrics(df).collect()[0]
    assert m["auc"] == 1.0
    assert m["n_pos"] == 10 and m["n_neg"] == 10
    assert m["brier"] == pytest.approx(0.01, abs=1e-6)


def test_binary_metrics_random_classifier_auc_half(spark):
    rows = [(0.5, 1.0)] * 7 + [(0.5, 0.0)] * 13
    df = spark.createDataFrame(rows, "probability double, target double")
    m = binary_metrics(df).collect()[0]
    assert m["auc"] == 0.5  # all ties -> fractional rank gives exactly 0.5


def test_calibration_bins(spark):
    rows = [(0.05, 0.0), (0.06, 0.0), (0.95, 1.0), (0.97, 1.0), (1.0, 1.0)]
    df = spark.createDataFrame(rows, "probability double, target double")
    out = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert out[0]["n"] == 2 and out[0]["observed_rate"] == 0.0
    assert out[9]["n"] == 3 and out[9]["observed_rate"] == 1.0  # p=1.0 clamps to bin 9
