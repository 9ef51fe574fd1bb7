"""Plan introspection helpers.

The engine's performance contract is encoded as assertions on the
physical plan (filter pushdown reached the scan, the dim side
broadcast, top-k compiled to TakeOrderedAndProject, ...) — run in
tests so a regression in plan shape fails CI, not production.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}\n{plan}"
