"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion executor-side via a count over the
result (no driver collect of payload rows), timed individually after a
session warm-up query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from big_data_bowl_2026_analytics_spark.core import get_spark
from big_data_bowl_2026_analytics_spark.plans import all_queries

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_region_nation_revenue",
    "q04_exists_semi_join",
    "q06_conditional_distinct_counts",
    "q07_argmin_per_group",
    "q08_pivot_returnflag",
    "q20_running_total",
    "q24_sessionization",
    "q25_tumbling_window_hourly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")

    specs = all_queries()
    names = [n for n in HEADLINE if n in specs]
    # Warm up JVM/codegen paths outside the timed region.
    specs[names[0]].builder(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
