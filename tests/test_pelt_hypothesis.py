"""Property-based check of the PELT implementation.

The exact invariant (see metrics/deception.py::pelt_l2): the dynamic
program reaches the exhaustive-search optimum over the candidate
lattice for every series length with ``n % jump != 1``. When the final
end sits closer than ``min_size`` past the last lattice point
(``n % 5 == 1`` under the ruptures 2/5 defaults), Killick's pruning
premise breaks — a state pruned against the last lattice point may
have been the optimum for ``n`` — and ruptures' ``Pelt.seg`` exhibits
the identical artifact, which is the reference-parity contract. For
that class we assert never-better-than-optimal and pin a concrete
counterexample whose parity outcome is hand-derived.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
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
@example(values=[0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.25, 0.25], pen=0.001)
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
    # PELT can never BEAT the lattice optimum...
    assert got_total >= want - 1e-9
    # ...and reaches it exactly whenever the pruning premise holds.
    if len(x) % 5 != 1:
        assert abs(got_total - want) < 1e-9
    assert got[-1] == len(x)
    # segment contract: every breakpoint on the jump lattice, min_size apart
    prev = 0
    for b in got[:-1]:
        assert b % 5 == 0 and b - prev >= 2
        prev = b
    assert len(x) - prev >= 2 or prev == 0


def test_tail_pruning_artifact_matches_ruptures_trace():
    # Hand-derived parity pin for the n % 5 == 1 class: at bkp=10 the
    # shared pruning rule discards t=0 (F(0)+c(0,10) > F(10)), but 10
    # cannot precede n=11 (gap 1 < min_size 2), so the unpruned
    # no-split optimum (~2.28509) is unreachable and BOTH this
    # implementation and ruptures return the split at 5 (~2.28533).
    x = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.25, 0.25])
    pen = 0.001
    got = pelt_l2(x, pen=pen)
    assert got == [5, 11]
    got_total = sum(
        _seg_cost(x, a, b) + pen for a, b in zip([0] + got[:-1], got)
    )
    want = _brute_force_optimum(x, pen, min_size=2, jump=5)
    assert got_total > want  # the artifact, pinned
    assert abs(got_total - want) < 2 * pen  # bounded by the pruning slack


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=4,
        max_size=40,
    ),
)
def test_certificate_pair_agrees_with_bruteforce(values):
    # The q28 self-validation columns: the unpruned-DP optimum always
    # lower-bounds PELT's choice, coincides for n % 5 != 1, and (on
    # short signals) matches the exponential brute force exactly.
    from big_data_bowl_2026_analytics_spark.metrics.deception import (
        optimal_partition_objective,
        partition_objective,
    )

    x = np.array(values)
    chosen = partition_objective(x, pelt_l2(x))
    optimum = optimal_partition_objective(x)
    assert chosen >= optimum - 1e-9
    if len(x) % 5 != 1:
        assert abs(chosen - optimum) < 1e-9
    if len(x) <= 22:
        brute = _brute_force_optimum(x, pen=0.01, min_size=2, jump=5)
        assert abs(optimum - brute) < 1e-9
