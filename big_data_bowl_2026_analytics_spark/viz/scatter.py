"""Scale-correct scatter/quadrant plots — the engine-side counterpart
of the reference's notebook plots (SURVEY §2.11: quadrant scatter over
score aggregates, notebooks/good_fake.ipynb).

A driver-side matplotlib scatter collects every point; at 100 TB that
is the plot that never renders. Here the scatter is a PIXEL-BINNED
HEATMAP (the datashader idea): quantize (x, y) to pixel coordinates
with integer arithmetic, groupBy the pixel — one shuffle whose output
is bounded by width*height regardless of input rows — and rasterize
the bounded grid on the driver. Exact counts per pixel, deterministic
colors, no sampling.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .render import encode_bmp

BACKGROUND = (255, 255, 255)
AXIS = (120, 120, 120)
# Low->high density ramp endpoints (linear in log-count).
RAMP_LO = (198, 219, 239)
RAMP_HI = (8, 48, 107)


def scatter_bins(
    df: DataFrame,
    xcol: str,
    ycol: str,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    width: int = 240,
    height: int = 160,
) -> DataFrame:
    """Exact per-pixel point counts: clamp to the window, quantize with
    the SAME floor arithmetic on both axes, group by (px, py). The
    result is bounded by width*height rows whatever the input size —
    the only collect a 100 TB scatter ever needs. Out-of-window rows
    are dropped (counted rows all satisfy the window predicate, which
    pushes down to the scan)."""
    if not (x_max > x_min and y_max > y_min and width > 0 and height > 0):
        raise ValueError("degenerate window")
    x = F.col(xcol).cast("double")
    y = F.col(ycol).cast("double")
    px = F.least(
        F.lit(width - 1),
        F.floor((x - x_min) / (x_max - x_min) * width).cast("int"),
    )
    py = F.least(
        F.lit(height - 1),
        F.floor((y - y_min) / (y_max - y_min) * height).cast("int"),
    )
    return (
        df.where(
            (x >= x_min) & (x <= x_max) & (y >= y_min) & (y <= y_max)
        )
        .select(px.alias("px"), py.alias("py"))
        .groupBy("px", "py")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def heatmap_bmp(
    bins: list,
    width: int,
    height: int,
    x_axis_px: int | None = None,
    y_axis_px: int | None = None,
) -> bytes:
    """Rasterize collected (px, py, n) rows to a BMP heatmap. Color is
    a linear ramp in log1p(count) normalized by the max bin — exact
    and deterministic for a given bin set. Optional axis lines mark
    the quadrant split (the reference's quadrant scatter draws means
    as crosshairs). py=0 renders at the BOTTOM row (y grows upward,
    plot convention)."""
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:] = BACKGROUND
    if y_axis_px is not None and 0 <= y_axis_px < width:
        img[:, y_axis_px] = AXIS
    if x_axis_px is not None and 0 <= x_axis_px < height:
        img[height - 1 - x_axis_px, :] = AXIS
    if bins:
        counts = np.array([r.n for r in bins], dtype=np.float64)
        tmax = float(np.log1p(counts.max()))
        t = np.log1p(counts) / tmax if tmax > 0 else np.ones_like(counts)
        lo = np.array(RAMP_LO, dtype=np.float64)
        hi = np.array(RAMP_HI, dtype=np.float64)
        rgb = (lo + (hi - lo) * t[:, None]).round().astype(np.uint8)
        for row, c in zip(bins, rgb):
            img[height - 1 - int(row.py), int(row.px)] = c
    return encode_bmp(img)


def quadrant_counts(
    df: DataFrame, xcol: str, ycol: str, x_split: float, y_split: float
) -> DataFrame:
    """The quadrant summary behind the notebook's scatter: how many
    entities land in each (x vs x_split, y vs y_split) quadrant — one
    aggregation, four output rows, exact integer counts."""
    x = F.col(xcol).cast("double")
    y = F.col(ycol).cast("double")
    return (
        df.select(
            F.when(x >= x_split, F.lit("hi")).otherwise(F.lit("lo")).alias(
                "x_side"
            ),
            F.when(y >= y_split, F.lit("hi")).otherwise(F.lit("lo")).alias(
                "y_side"
            ),
        )
        .groupBy("x_side", "y_side")
        .agg(F.count(F.lit(1)).alias("n"))
    )
