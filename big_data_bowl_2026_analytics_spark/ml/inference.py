"""Distributed model scoring (SURVEY §2.9 U7).

The model is tiny (weights + bias); it travels to executors inside the
UDF closure, and scoring is an Arrow-batched pandas UDF — vectorized
numpy per batch, never per-row Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .model import LogisticModel


def score_column(model: LogisticModel, *cols: Column) -> Column:
    """Probability column from feature columns via a pandas UDF.

    Linear models ship only (weights, bias) in the closure and score
    as one matmul; any other model object (e.g. the gated
    XGBModelAdapter) is cloudpickled whole and scored through its
    ``predict_proba`` — same Arrow batching either way, so swapping
    backends changes nothing at the call sites."""
    import numpy as np

    if hasattr(model, "weights"):
        weights = model.weights.copy()
        bias = float(model.bias)

        @F.pandas_udf(DoubleType())
        def _score(*series: pd.Series) -> pd.Series:
            X = np.column_stack([s.to_numpy(dtype=float) for s in series])
            z = X @ weights + bias
            return pd.Series(1.0 / (1.0 + np.exp(-z)))

    else:

        @F.pandas_udf(DoubleType())
        def _score(*series: pd.Series) -> pd.Series:
            X = np.column_stack([s.to_numpy(dtype=float) for s in series])
            return pd.Series(np.asarray(model.predict_proba(X), dtype=float))

    return _score(*cols)


def score_dataframe(
    df: DataFrame, model: LogisticModel, output_col: str = "probability"
) -> DataFrame:
    """Attach the model probability for ``model.feature_cols``."""
    return df.withColumn(
        output_col, score_column(model, *[F.col(c) for c in model.feature_cols])
    )
