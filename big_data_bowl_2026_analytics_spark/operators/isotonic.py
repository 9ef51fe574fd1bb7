"""Isotonic (monotone) regression by Pool Adjacent Violators, as a
grouped Arrow operator — the standard model-calibration step between
q51's calibration bins and production score thresholds.

PAV is an inherently sequential dynamic pooling over the sorted score
axis, so it cannot be a SQL expression; like PELT (q28) it runs as
``applyInPandas`` per calibration group: sequential WITHIN a group,
parallel ACROSS groups, and the input is pre-reduced to the
distinct-score grain (bounded by 1e6+1 six-decimal scores — the q227
contract), so the per-group series is small however many rows feed it.

The output is SELF-VALIDATING (the q28 pattern for no-oracle
operators): PAV's solution is optimal iff (a) fitted values are
non-decreasing in x and (b) every pooled block's value equals its
weighted mean — both are emitted as per-row booleans, so even a
rows-only driver check pins the KKT conditions. The hypothesis test
cross-checks PAV against an INDEPENDENT construction (the greatest
convex minorant of the cumulative-sum diagram).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves postponed hints here

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "grp string, x double, w long, y_mean double, y_iso double, "
    "block long, block_mean_ok boolean, monotone_ok boolean"
)


def pav_fit(x: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Weighted PAV on x-sorted data: returns the non-decreasing fit
    minimizing Σ w·(y − f)². Stack-based pooling, O(n)."""
    vals: list[float] = []
    wts: list[float] = []
    cnts: list[int] = []
    for i in range(len(y)):
        vals.append(float(y[i]))
        wts.append(float(w[i]))
        cnts.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            v2, w2, c2 = vals.pop(), wts.pop(), cnts.pop()
            v1, w1, c1 = vals.pop(), wts.pop(), cnts.pop()
            vals.append((v1 * w1 + v2 * w2) / (w1 + w2))
            wts.append(w1 + w2)
            cnts.append(c1 + c2)
    out = np.empty(len(y))
    pos = 0
    for v, c in zip(vals, cnts):
        out[pos : pos + c] = v
        pos += c
    return out


def isotonic_calibration(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group isotonic fit of ``y_col`` against ``x_col``.

    Input rows are reduced to the distinct-(group, x) grain first
    (weight = row count, y = weighted mean), then each group's series
    runs PAV in one Arrow batch. Output one row per (group, x):
    the pooled fit ``y_iso``, its block id, and the two optimality
    invariants (block-mean + monotonicity) as booleans.
    """
    grain = (
        df.select(
            F.col(group_col).cast("string").alias("grp"),
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
        )
        .groupBy("grp", "x")
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.avg("y").alias("y_mean"),
        )
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x").reset_index(drop=True)
        y = pdf["y_mean"].to_numpy()
        w = pdf["w"].to_numpy().astype(float)
        y_iso = pav_fit(pdf["x"].to_numpy(), y, w)
        # block id = run id of equal consecutive fitted values
        block = np.cumsum(
            np.concatenate(([1], (np.diff(y_iso) != 0).astype(np.int64)))
        )
        # invariants: block value == weighted block mean; monotone fit
        bm_ok = np.empty(len(y), dtype=bool)
        for b in np.unique(block):
            m = block == b
            bm = float(np.sum(y[m] * w[m]) / np.sum(w[m]))
            bm_ok[m] = abs(bm - y_iso[m][0]) < 1e-9
        mono = bool(np.all(np.diff(y_iso) >= 0))
        return pd.DataFrame(
            {
                "grp": pdf["grp"],
                "x": pdf["x"],
                "w": pdf["w"].astype("int64"),
                "y_mean": y,
                "y_iso": y_iso,
                "block": block.astype("int64"),
                "block_mean_ok": bm_ok,
                "monotone_ok": mono,
            }
        )

    return grain.groupBy("grp").applyInPandas(fit, _OUT_SCHEMA)


def gcm_fit(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Independent isotonic construction for tests: the left slope of
    the greatest convex minorant of the cumulative-sum diagram
    (W_k, S_k). Equals PAV's solution exactly (both solve the same
    strictly convex program)."""
    n = len(y)
    cw = np.concatenate(([0.0], np.cumsum(w)))
    cs = np.concatenate(([0.0], np.cumsum(w * y)))
    # lower convex hull of points (cw, cs), scanned left to right
    hull: list[int] = [0]
    for k in range(1, n + 1):
        while len(hull) >= 2:
            i, j = hull[-2], hull[-1]
            # slope test: drop j if (i->k) lies below (i->j)
            if (cs[k] - cs[i]) * (cw[j] - cw[i]) <= (cs[j] - cs[i]) * (
                cw[k] - cw[i]
            ):
                hull.pop()
            else:
                break
        hull.append(k)
    out = np.empty(n)
    for a, b in zip(hull[:-1], hull[1:]):
        out[a:b] = (cs[b] - cs[a]) / (cw[b] - cw[a])
    return out
