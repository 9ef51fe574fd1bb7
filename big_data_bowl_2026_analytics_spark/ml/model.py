"""Classifier for the non-completion-probability task.

The reference trains an XGBoost classifier with a 64-combo grid search
(/root/reference/src/training/train.py:125-181). XGBoost isn't in this
environment, so the engine ships a deterministic numpy logistic
regression with the same role in the pipeline: small training set
collected to the driver (the reference's train set is 1,941 rows),
distributed scoring executor-side via a pandas UDF (see
``inference.py``). The model abstraction is the part that matters for
the engine — swap in xgboost.spark.SparkXGBClassifier when available
(guarded import below).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

def _import_xgboost():
    """Resolve xgboost at CALL time (not module-import time), so the
    backend flips the moment the library appears in the environment —
    and so tests can exercise the full swap path by installing a mock
    module in sys.modules with zero engine-code changes."""
    import xgboost

    return xgboost


def has_xgboost() -> bool:
    try:
        _import_xgboost()
        return True
    except Exception:  # noqa: BLE001
        return False


#: Reference XGBoost grid, mirrored verbatim
#: (/root/reference/src/core/settings.py:110-123; 2^6 = 64 combos).
XGB_PARAM_GRID: dict[str, tuple] = {
    "n_estimators": (200, 400),
    "learning_rate": (0.05, 0.1),
    "max_depth": (4, 5),
    "subsample": (0.8, 1.0),
    "colsample_bytree": (0.8, 1.0),
    "reg_lambda": (1.0, 2.0),
}


def build_xgb_model(
    n_estimators: int,
    learning_rate: float,
    max_depth: int,
    subsample: float,
    colsample_bytree: float,
    reg_lambda: float,
    random_state: int = 42,
):
    """XGBClassifier with the reference's configuration shape
    (/root/reference/src/training/model.py:13-58): same validation,
    same pinned seed, eval_metric='auc'."""
    if not (0 < subsample <= 1):
        raise ValueError("subsample must be in the interval ]0, 1].")
    if not (0 < colsample_bytree <= 1):
        raise ValueError("colsample_bytree must be in the interval ]0, 1].")
    xgb = _import_xgboost()
    return xgb.XGBClassifier(
        n_estimators=n_estimators,
        learning_rate=learning_rate,
        max_depth=max_depth,
        subsample=subsample,
        colsample_bytree=colsample_bytree,
        reg_lambda=reg_lambda,
        random_state=random_state,
        eval_metric="auc",
    )


@dataclass
class XGBModelAdapter:
    """Uniform scoring surface over a fitted XGBClassifier: the rest
    of the engine (inference pandas UDF, evaluation, permutation
    importance) sees the same ``predict_proba(X) -> 1-d probs`` that
    LogisticModel exposes."""

    booster: object
    feature_cols: tuple[str, ...]

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(self.booster.predict_proba(X))[:, 1]


@dataclass
class LogisticModel:
    """Fixed-weight logistic model: p = sigmoid(X @ weights + bias)."""

    weights: np.ndarray
    bias: float
    feature_cols: tuple[str, ...]

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        # Clip the logit so a diverged grid-search combo saturates to
        # 0/1 instead of overflowing exp (deterministic either way).
        z = np.clip(X @ self.weights + self.bias, -500.0, 500.0)
        return 1.0 / (1.0 + np.exp(-z))


def train_logistic(
    X: np.ndarray,
    y: np.ndarray,
    feature_cols: tuple[str, ...],
    lr: float = 0.5,
    n_iter: int = 300,
    l2: float = 1e-3,
) -> LogisticModel:
    """Deterministic full-batch gradient descent from zero init.

    No randomness anywhere -> identical model on every run (the
    reference pins seed 42 for the same reason,
    /root/reference/src/core/settings.py:110-123).
    """
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(n_iter):
        z = np.clip(X @ w + b, -500.0, 500.0)
        p = 1.0 / (1.0 + np.exp(-z))
        grad_w = X.T @ (p - y) / n + l2 * w
        grad_b = float(np.mean(p - y))
        w -= lr * grad_w
        b -= lr * grad_b
    return LogisticModel(weights=w, bias=b, feature_cols=feature_cols)


# Pickle this module's functions BY VALUE into UDF closures: Spark's
# Python workers otherwise resolve them by module name, which fails
# whenever the package isn't on the worker's import path (e.g. the
# driver imported the repo by file location from another cwd).
import sys as _sys

try:  # pragma: no cover - exercised via worker round-trips in tests
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass
