"""Materialize a k-times scaled copy of a testdata scale-factor dir.

Each copy shifts every entity key by i * 1e9, so join fan-outs and
group cardinalities scale with the data instead of just deepening each
group (the same trick as tools/scale_sweep.py, but materialized to
parquet so BOTH engines — Spark and the DuckDB oracle — can read the
identical scaled tables for a fair same-data benchmark at a scale
factor the driver doesn't ship, e.g. sf0.1 x10 ~= sf1).

Content is de-duplicated across copies where sameness would change the
workload's asymptotics, not just its size:
- documents get a per-copy suffix token (otherwise every doc acquires
  k exact duplicates and pair-generating dedup queries blow up
  quadratically in k — a real sf1 corpus has no such structure);
- embeddings get a per-copy nudge on dimension 0 (otherwise LSH/IVF
  buckets hold k exact copies of every vector).

Written with pyarrow, not Spark, to preserve physical types bit-for-bit
— in particular events.ts stays TIMESTAMP(NANOS), which the engine's
read_table handles via the nanosAsLong runtime conf.

Usage: python tools/make_scaled_sf.py --src /root/testdata/sf0.1 \
           --dst /root/repo/.scaled_sf1 --k 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 1_000_000_000

#: per-table int64 key columns shifted per copy (dim FKs into the
#: fixed-size region/nation dims stay unshifted).
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ("region", "nation")


def _copy_table(tbl: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return tbl
    for col in KEY_COLS[name]:
        idx = tbl.schema.get_field_index(col)
        shifted = pc.add(tbl.column(col), pa.scalar(i * SHIFT, pa.int64()))
        tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted)
    if name == "documents":
        idx = tbl.schema.get_field_index("text")
        suffixed = pc.binary_join_element_wise(
            pc.cast(tbl.column("text"), pa.string()), f" c{i}", ""
        )
        tbl = tbl.set_column(idx, tbl.schema.field(idx), suffixed)
        n_idx = tbl.schema.get_field_index("n_chars")
        tbl = tbl.set_column(
            n_idx,
            tbl.schema.field(n_idx),
            pc.add(tbl.column("n_chars"), pa.scalar(len(f" c{i}"), pa.int64())),
        )
    if name == "embeddings":
        # nudge dim 0 by i * 0.01 so copies are near, not exact, dups
        col = tbl.column("embedding").combine_chunks()
        values = col.values.to_numpy(zero_copy_only=False).copy()
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        values[offsets[:-1]] += np.float32(0.01 * i)
        nudged = pa.ListArray.from_arrays(
            col.offsets, pa.array(values, pa.float32())
        )
        idx = tbl.schema.get_field_index("embedding")
        tbl = tbl.set_column(idx, tbl.schema.field(idx), nudged.cast(tbl.schema.field(idx).type))
    return tbl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    for name in COPY_AS_IS:
        tbl = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        pq.write_table(tbl, os.path.join(args.dst, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} rows (unscaled dim)")

    for name in KEY_COLS:
        tbl = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        copies = [_copy_table(tbl, name, i) for i in range(args.k)]
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(args.dst, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
