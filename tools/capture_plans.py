"""Capture `.explain("formatted")` for registry queries into
plans/r13/<query>_<suffix>.txt — the judge-checkable evidence files
for optimization rounds.

Usage:
    python tools/capture_plans.py --suffix after --only q07,q31,q32 \
        [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from big_data_bowl_2026_analytics_spark.core import get_spark  # noqa: E402
from big_data_bowl_2026_analytics_spark.plans import all_queries  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", required=True)
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("--outdir", default=str(REPO / "plans" / "r13"))
    args = ap.parse_args()

    specs = all_queries()
    prefixes = [p.strip() for p in args.only.split(",") if p.strip()]
    names = [
        n for n in specs if any(n == p or n.startswith(p + "_") for p in prefixes)
    ]
    if not names:
        print("no queries matched", file=sys.stderr)
        return 1
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("capture-plans", shuffle_partitions=8)
    # Match the bench's execution conf so captured plans show what the
    # bench actually runs (AQE off at micro SF, see bench.py).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for name in names:
        df = specs[name].builder(spark, args.sf)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = outdir / f"{name}_{args.suffix}.txt"
        path.write_text(txt)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
