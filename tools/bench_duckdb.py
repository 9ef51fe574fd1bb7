"""Time the headline queries' DuckDB oracles on the same parquet dir
the Spark bench reads — the same-data, same-semantics comparator the
judge uses (min of 2 runs per query, all cores).

Usage: python tools/bench_duckdb.py [--sf DIR] [--runs 2]
Prints one JSON line: {"total": s, "queries": {...}, "sf_dir": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import HEADLINE  # noqa: E402
from big_data_bowl_2026_analytics_spark.plans import all_queries  # noqa: E402
from big_data_bowl_2026_analytics_spark.sources.readers import TPCH_TABLES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    specs = all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None or not spec.oracle:
            continue
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "total": round(sum(timings.values()), 3),
                "queries": timings,
                "sf_dir": args.sf,
                "n": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
