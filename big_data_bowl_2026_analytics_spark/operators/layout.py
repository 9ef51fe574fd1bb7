"""Data-layout operators: Z-order (Morton) clustering keys and the
chunk-span audit that measures what the layout buys.

Z-ordering is the multi-dimensional clustering scheme behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` and classic spatial indexing:
interleave the bits of per-dimension quantized ranks so that rows
close in EVERY dimension land close in the one-dimensional sort order.
Files (chunks) written in that order then carry tight per-dimension
min/max ranges, and a min/max-pruning scan (parquet row-group stats,
Delta file stats) skips most chunks for a point or range predicate on
ANY of the interleaved dimensions — the property the audit operator
quantifies as the mean normalized per-chunk span.

Everything here is integer bit arithmetic and exact dyadic ratios —
engine-exact by construction, no rounding pair needed for equality
(callers still round per repo convention).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(
    x: Column, min_x: Column, span_x: Column, levels: int = 256
) -> Column:
    """Linear integer quantization of ``x`` into ``0..levels-1`` given
    the global min and span (max - min): ``((x - min) * (levels-1))
    // span`` with EXACT integral semantics on both engines. Spark has
    no bigint-div Column operator, so the floor division is expressed
    as ``(scaled - pmod(scaled, span)) / span``: the numerator is an
    exact multiple of span and every operand stays under 2^53, so the
    IEEE division yields the integer quotient with zero rounding —
    bit-identical to DuckDB's ``//``. Holds for ``(x-min)*(levels-1) <
    2^53`` (any realistic key domain). A constant column (span 0) maps
    everything to 0.
    """
    scaled = (x - min_x).cast("bigint") * F.lit(levels - 1)
    exact = (scaled - F.pmod(scaled, span_x)) / span_x
    return (
        F.when(span_x == 0, F.lit(0)).otherwise(exact).cast("bigint")
    )


def zorder_value(qx: Column, qy: Column, bits: int = 8) -> Column:
    """Morton interleave of two ``bits``-wide quantized ranks: bit i of
    ``qx`` lands at position 2i, bit i of ``qy`` at 2i+1. Pure integer
    shift/mask arithmetic (2*bits terms), fully inside whole-stage
    codegen — the 64-term JIT cliff documented at similarity.py does
    not bite at 16 terms.
    """
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(qx.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(qy.cast("bigint"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def hilbert_cols(qx: Column, qy: Column, s: int, n: int):
    """One Hilbert xy→d rotation step (canonical Wikipedia xy2d,
    rot(n,·) variant — verified bijective + unit-adjacent in
    tests/test_layout.py): given the running (x, y) pair at scale
    ``s``, return the quadrant contribution to d and the rotated
    (x', y'). Pure integer CASE arithmetic — the ^-free encoding of
    (3·rx) XOR ry keeps the expression portable to ANSI SQL.

    IMPORTANT: callers must BIND each step's outputs in a projection
    (df.select per step) rather than compose the returned expressions
    — the rotation references x and y multiple times, so symbolic
    composition grows ~4× per step (the CLAUDE.md bind-in-projection
    rule; CollapseProject leaves multi-referenced aliases alone).
    """
    rx0 = qx.bitwiseAND(F.lit(s)) > 0
    ry0 = qy.bitwiseAND(F.lit(s)) > 0
    quad = (
        F.when(~rx0 & ~ry0, 0)
        .when(~rx0, 1)
        .when(~ry0, 3)
        .otherwise(2)
    )
    d_add = F.lit(s * s) * quad
    x_new = F.when(
        ~ry0, F.when(rx0, F.lit(n - 1) - qy).otherwise(qy)
    ).otherwise(qx)
    y_new = F.when(
        ~ry0, F.when(rx0, F.lit(n - 1) - qx).otherwise(qx)
    ).otherwise(qy)
    return d_add, x_new, y_new


def with_hilbert_value(
    df, x_col: str = "qx", y_col: str = "qy", bits: int = 8,
    out: str = "hv",
):
    """Add the Hilbert index of (x_col, y_col) as ``out`` via one
    bound projection per scale bit (8 chained selects for bits=8 —
    each is a cheap map-side projection; no shuffle, no window)."""
    cols = [c for c in df.columns]
    n = 1 << bits
    cur = df.select(
        *cols,
        F.col(x_col).cast("bigint").alias("_hx"),
        F.col(y_col).cast("bigint").alias("_hy"),
        F.lit(0).cast("bigint").alias("_hd"),
    )
    s = n >> 1
    while s > 0:
        d_add, x_new, y_new = hilbert_cols(
            F.col("_hx"), F.col("_hy"), s, n
        )
        cur = cur.select(
            *cols,
            x_new.alias("_hx"),
            y_new.alias("_hy"),
            (F.col("_hd") + d_add).alias("_hd"),
        )
        s >>= 1
    return cur.select(*cols, F.col("_hd").cast("bigint").alias(out))


def hilbert_steps_sql(
    first_cte: str, carry: str, x: str = "qx", y: str = "qy",
    bits: int = 8,
) -> str:
    """DuckDB mirror of :func:`with_hilbert_value`: chained CTEs
    hstep1..hstepN (one per scale bit), each binding the rotated pair
    — identical step algebra, identical integer results. ``carry`` is
    the comma-joined passthrough column list; the caller appends the
    final CTE name ``hstep{bits}`` (column ``hd``) to its pipeline."""
    n = 1 << bits
    ctes = [
        f"hstep0 AS (SELECT {carry}, CAST({x} AS BIGINT) AS hx,"
        f" CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM {first_cte})"
    ]
    s = n >> 1
    i = 0
    while s > 0:
        i += 1
        quad = (
            f"(CASE WHEN (hx & {s}) = 0 AND (hy & {s}) = 0 THEN 0"
            f" WHEN (hx & {s}) = 0 THEN 1"
            f" WHEN (hy & {s}) = 0 THEN 3 ELSE 2 END)"
        )
        x_new = (
            f"(CASE WHEN (hy & {s}) = 0 THEN"
            f" (CASE WHEN (hx & {s}) > 0 THEN {n - 1} - hy ELSE hy END)"
            f" ELSE hx END)"
        )
        y_new = (
            f"(CASE WHEN (hy & {s}) = 0 THEN"
            f" (CASE WHEN (hx & {s}) > 0 THEN {n - 1} - hx ELSE hx END)"
            f" ELSE hy END)"
        )
        ctes.append(
            f"hstep{i} AS (SELECT {carry}, {x_new} AS hx, {y_new} AS hy,"
            f" hd + {s * s} * {quad} AS hd FROM hstep{i - 1})"
        )
        s >>= 1
    return ",\n".join(ctes)
