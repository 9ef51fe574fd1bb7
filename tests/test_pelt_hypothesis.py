"""Property-based check of the PELT implementation: on any short
signal, the dynamic program must reach the exact optimum that
exhaustive search over the candidate lattice finds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_bowl_2026_analytics_spark.metrics.deception import pelt_l2


def _seg_cost(x: np.ndarray, a: int, b: int) -> float:
    seg = x[a:b]
    return float(np.sum((seg - seg.mean()) ** 2))


def _brute_force_optimum(x: np.ndarray, pen: float, min_size: int, jump: int) -> float:
    n = len(x)
    candidates = [k for k in range(0, n, jump) if k >= min_size]
    best = None
    for mask in range(2 ** len(candidates)):
        bkps = [c for i, c in enumerate(candidates) if mask >> i & 1] + [n]
        if any(b - a < min_size for a, b in zip([0] + bkps[:-1], bkps)):
            continue
        total = sum(_seg_cost(x, a, b) + pen for a, b in zip([0] + bkps[:-1], bkps))
        if best is None or total < best:
            best = total
    return best


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=4,
        max_size=22,
    ),
    st.sampled_from([0.001, 0.01, 0.1]),
)
def test_pelt_reaches_bruteforce_optimum(values, pen):
    x = np.array(values)
    got = pelt_l2(x, pen=pen)
    got_total = sum(
        _seg_cost(x, a, b) + pen for a, b in zip([0] + got[:-1], got)
    )
    want = _brute_force_optimum(x, pen, min_size=2, jump=5)
    assert abs(got_total - want) < 1e-9
    assert got[-1] == len(x)
    # segment contract: every breakpoint on the jump lattice, min_size apart
    prev = 0
    for b in got[:-1]:
        assert b % 5 == 0 and b - prev >= 2
        prev = b
    assert len(x) - prev >= 2 or prev == 0


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=4,
        max_size=40,
    ),
)
def test_certificate_pair_agrees_with_bruteforce(values):
    # The q28 self-validation columns: partition_objective of PELT's
    # choice and the unpruned-DP optimum must coincide with each other
    # AND (on short signals) with the exponential brute force.
    from big_data_bowl_2026_analytics_spark.metrics.deception import (
        optimal_partition_objective,
        partition_objective,
    )

    x = np.array(values)
    chosen = partition_objective(x, pelt_l2(x))
    optimum = optimal_partition_objective(x)
    assert abs(chosen - optimum) < 1e-9
    if len(x) <= 22:
        brute = _brute_force_optimum(x, pen=0.01, min_size=2, jump=5)
        assert abs(optimum - brute) < 1e-9
