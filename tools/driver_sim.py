"""Simulate the external driver's correctness gate as closely as we
can: a VANILLA SparkSession (no repo confs — the driver supplies its
own), queries taken through ``__spark_entry__.queries()`` (not the
registry directly), the first 50 registry entries only (the driver's
sample cap), one shared session for the whole run, and a
dtype-SENSITIVE comparison (value hash over the raw pandas frames, so
an int64-vs-float64 kind mismatch fails here exactly like it fails in
the driver — see CLAUDE.md footgun 8).

This harness exists because both round-2 failure classes (the events
timestamp re-encoding and the DuckDB HUGEINT dtype drift) passed the
tuned local checker but failed the driver. Run it before every round
hand-off:

    python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--n 50]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive, dtype-sensitive hash: sort columns by name,
    render every cell to a canonical string (ints never grow '.0',
    floats keep repr, datetimes truncate to µs), sort rows, md5."""
    df = df[sorted(df.columns)].copy()
    cells = []
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NULL")
        elif pd.api.types.is_integer_dtype(s):
            s = s.map(lambda v: str(int(v)) if pd.notna(v) else "NULL")
        elif pd.api.types.is_bool_dtype(s):
            s = s.map(lambda v: str(bool(v)) if pd.notna(v) else "NULL")
        else:
            s = s.map(lambda v: "NULL" if v is None or v != v else str(v))
        cells.append(s.astype(str))
    rows = sorted("|".join(t) for t in zip(*cells)) if cells else []
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names (bypasses the first-n window;"
        " for spot-checking new queries that sit past the driver's"
        " 50-slot sample)",
    )
    ap.add_argument(
        "--changed-since",
        default=None,
        metavar="GIT_REF",
        help="sim only registry names mapped from files changed since"
        " GIT_REF (same mapping as check_correctness.py)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        missing = [n for n in names if n not in queries]
        if missing:
            print(f"unknown queries: {missing}")
            return 1
    elif args.changed_since:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from check_correctness import names_changed_since

        mapped = names_changed_since(args.changed_since, queries)
        if mapped is None:
            print(
                f"--changed-since {args.changed_since}: shared file changed;"
                " simming the full registry"
            )
            names = list(queries)
        else:
            print(f"--changed-since {args.changed_since}: {len(mapped)} mapped")
            names = mapped
            if not names:
                print("no registry queries map to the change set")
                return 0
    else:
        names = list(queries)[: args.n]
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: spark: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak  {name}: rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: duckdb: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        rows = len(sdf) == len(odf)
        cols = sorted(sdf.columns) == sorted(odf.columns)
        hashes = value_hash(sdf) == value_hash(odf)
        if rows and cols and hashes:
            print(f"ok    {name}: rows={len(sdf)} hash-match "
                  f"[{time.time() - t0:.1f}s]")
        else:
            n_fail += 1
            print(f"FAIL  {name}: rows_match={rows} cols_match={cols} "
                  f"hash_match={hashes}")
            for c in sorted(set(sdf.columns) & set(odf.columns)):
                if str(sdf[c].dtype) != str(odf[c].dtype):
                    print(f"      dtype {c}: spark={sdf[c].dtype} "
                          f"oracle={odf[c].dtype}")
    print(f"\n{len(names) - n_fail}/{len(names)} pass the driver-sim gate")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
