"""Audit Spark-vs-DuckDB dtype KINDS per query column.

The driver's value hash is dtype-sensitive: DuckDB `sum(integer)`
returns HUGEINT, which `fetchdf` lands as float64 while Spark's sum
stays bigint — numerically equal, hash-different. This tool runs every
registered oracle and its Spark query at a small SF and flags any
column whose pandas dtype KIND (int / float / bool / datetime /
object) differs between the two engines. Every flag is a latent
driver-side hash mismatch: fix with CAST(... AS BIGINT) in the oracle
(or an explicit cast on the Spark side).

Usage: python tools/audit_dtypes.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from big_data_bowl_2026_analytics_spark.core import get_spark  # noqa: E402
from big_data_bowl_2026_analytics_spark.plans import all_queries  # noqa: E402
from big_data_bowl_2026_analytics_spark.sources.readers import (  # noqa: E402
    TPCH_TABLES,
)


def kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark()
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    flagged = 0
    for name, spec in sorted(all_queries().items()):
        if spec.oracle is None:
            continue
        try:
            sdf = spec.builder(spark, args.sf).toPandas()
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            flagged += 1
            continue
        for c in sorted(set(sdf.columns) & set(odf.columns)):
            ks, ko = kind(sdf[c]), kind(odf[c])
            if ks != ko:
                # all-NaN object columns etc. — still report, judge by eye
                print(f"FLAG {name}.{c}: spark={ks}({sdf[c].dtype}) "
                      f"oracle={ko}({odf[c].dtype})")
                flagged += 1
    print(f"{'CLEAN' if not flagged else 'FLAGGED'}: {flagged} issues")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
