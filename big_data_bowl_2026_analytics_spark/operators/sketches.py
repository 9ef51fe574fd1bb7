"""Mergeable frequency sketches: count-min cells as DataFrames.

The count-min sketch (Cormode & Muthukrishnan 2005) summarizes a key
stream into a fixed d × w integer grid. Everything here stays in the
DataFrame algebra so the properties that make the sketch useful at
100 TB are *visible to the engine*:

- building is one groupBy over md5-derived buckets (map-side partial
  aggregation collapses each partition's grid before the shuffle);
- merging two sketches is a cell-wise sum — a groupBy over the union
  of two 1024-row frames (the property tests/test_sketches.py pins:
  merge-of-halves equals build-of-whole, exactly);
- estimation broadcasts the grid back onto the key frame and takes
  the min over d cells, never overestimating less / underestimating
  at all.

q151 exercises the same construction against a DuckDB oracle; this
module is the reusable form for pipelines that keep sketch columns
per shard and union them at read time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"

CMS_DEPTH = 4
CMS_WIDTH = 256


def _hash16(seed: str, key: Column) -> Column:
    """First 16 bits of md5(seed || key) — the engine-exact
    instr-nibble decode shared with plans/queries/splits.py."""
    h = F.md5(F.concat(F.lit(seed), key.cast("string")))
    v = F.lit(0)
    for i in range(4):
        nib = F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1
        v = v * 16 + nib
    return v


def cms_bucket(j: int, key: Column, width: int = CMS_WIDTH) -> Column:
    return (_hash16(f"cms{j}|", key) % width).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (j, bucket, cell_total) grid from a key stream.

    ``weight_col`` aggregates pre-counted keys (sum of weights)
    instead of raw occurrences. The output is at most depth × width
    rows regardless of input size.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.posexplode(
            F.array(
                *[cms_bucket(j, F.col(key_col), width) for j in range(depth)]
            )
        ).alias("j", "bucket"),
        w.alias("_w"),
    )
    return rows.groupBy("j", "bucket").agg(F.sum("_w").alias("cell_total"))


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Cell-wise sum of sketch grids — the mergeability that lets
    every shard keep its own grid and a reader combine them without
    rescanning anything."""
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("j", "bucket").agg(
        F.sum("cell_total").alias("cell_total")
    )


def cms_estimate(
    keys: DataFrame,
    grid: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-estimate each key in ``keys`` through the grid: min over
    the key's d cells. Missing cells count as zero (a key whose cell
    never appeared has true count 0 ≤ estimate 0). The grid
    broadcasts — it is ≤ d·w rows by construction."""
    hashed = keys.select(
        *keys.columns,
        F.posexplode(
            F.array(
                *[cms_bucket(j, F.col(key_col), width) for j in range(depth)]
            )
        ).alias("j", "bucket"),
    )
    joined = hashed.join(F.broadcast(grid), ["j", "bucket"], "left")
    return joined.groupBy(*keys.columns).agg(
        F.min(F.coalesce("cell_total", F.lit(0))).alias(out_col)
    )
