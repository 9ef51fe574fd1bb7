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
