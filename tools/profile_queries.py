"""Per-query noop-sink profiler (optimization guide §1.4).

Times registry queries exactly as the bench does — same session confs,
noop sink so every column of every row is computed executor-side, min
over warm reps — but for ANY subset of the registry, so optimization
work can isolate a query's compute cost without the bench's
headline-only scope or the checker's oracle overhead.

Usage:
    python tools/profile_queries.py --sf /root/testdata/sf0.1 \
        --only q199,q204 --reps 3
    python tools/profile_queries.py --all --reps 2 -o /tmp/profile.txt

Each query gets one untimed warm-up run (JIT/codegen), then ``reps``
timed runs; the report is "min_seconds name", sorted descending.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from big_data_bowl_2026_analytics_spark.core import get_spark  # noqa: E402
from big_data_bowl_2026_analytics_spark.plans import all_queries  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None, help="comma-separated name prefixes")
    ap.add_argument("--all", action="store_true", help="profile the whole registry")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--aqe", action="store_true", help="leave AQE on (bench default: off)")
    ap.add_argument("-o", "--out", default=None, help="also write report to this path")
    ap.add_argument(
        "--exclude", default=None, help="comma-separated name prefixes to skip"
    )
    args = ap.parse_args()

    specs = all_queries()
    if args.only:
        prefixes = [p.strip() for p in args.only.split(",") if p.strip()]
        names = [
            n for n in specs if any(n == p or n.startswith(p + "_") for p in prefixes)
        ]
    elif args.all:
        names = sorted(specs)
    else:
        ap.error("pass --only or --all")
    if args.exclude:
        ex = [p.strip() for p in args.exclude.split(",") if p.strip()]
        names = [
            n for n in names if not any(n == p or n.startswith(p + "_") for p in ex)
        ]
    if not names:
        print("no queries matched", file=sys.stderr)
        return 1

    shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"))
    spark = get_spark(
        "profile",
        shuffle_partitions=shuffle_partitions,
        extra_conf={
            "spark.locality.wait": "0s",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.sql.codegen.cache.maxEntries": "2000",
        },
    )
    if not args.aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"profile: {name}")
        try:
            # untimed warm-up (JIT + codegen, guide §1)
            df = spec.builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                df = spec.builder(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name] = best
            print(f"{best:8.3f}  {name}", flush=True)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"
            print(f"   ERROR  {name}: {errors[name]}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    report = "".join(
        f"{t:8.3f}  {n}\n" for n, t in sorted(results.items(), key=lambda kv: -kv[1])
    )
    print("\n=== sorted (min of %d warm reps, noop sink) ===" % args.reps)
    print(report, end="")
    for n, e in errors.items():
        print(f"   ERROR  {n}: {e}")
    if args.out:
        Path(args.out).write_text(report)
    return 0 if not errors else 2


if __name__ == "__main__":
    raise SystemExit(main())
