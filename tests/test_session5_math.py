"""Pure-Python property tests for the exact transforms the fifth-
session queries rely on — each identity checked against the naive
sequential/recursive definition it replaces:

1. q273: the one-pass sign-sum Haar detail construction equals the
   textbook recursive pairwise transform (on integer inputs, exactly).
2. q286: the Lindley recursion W_t = max(0, W_{t-1} + a_t - c) equals
   the reflection S_t - min(0, min_{tau<=t} S_tau) with S = cumsum(a-c).
3. q284: the waterfilling bracket condition selects exactly one level
   when budget < total, and the resulting allocation conserves the
   budget.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


@settings(max_examples=200)
@given(st.lists(st.integers(0, 10_000), min_size=16, max_size=16))
def test_haar_sign_sum_equals_recursive(xs):
    # recursive: level sums s, details d on pair sums
    s = list(xs)
    rec_details = {}
    for level in (1, 2, 3, 4):
        d = [s[2 * i] - s[2 * i + 1] for i in range(len(s) // 2)]
        s = [s[2 * i] + s[2 * i + 1] for i in range(len(s) // 2)]
        rec_details[level] = d
    # one-pass: d_l[j] = sum over block of sign * x, sign from bit l-1
    for level in (1, 2, 3, 4):
        half = 1 << (level - 1)
        blocks = len(xs) // (2 * half)
        for j in range(blocks):
            acc = 0
            for i in range(j * 2 * half, (j + 1) * 2 * half):
                sign = 1 if (i // half) % 2 == 0 else -1
                acc += sign * xs[i]
            assert acc == rec_details[level][j], (level, j)


@settings(max_examples=200)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=40),
    st.integers(1, 20),
)
def test_lindley_reflection_identity(arrivals, c):
    w = 0
    want = []
    for a in arrivals:
        w = max(0, w + a - c)
        want.append(w)
    s, run_min, got = 0, 0, []
    for a in arrivals:
        s += a - c
        run_min = min(run_min, s)
        got.append(s - min(0, run_min))
    assert got == want


@settings(max_examples=200)
@given(st.lists(st.integers(1, 10_000), min_size=1, max_size=12))
def test_waterfill_bracket_unique_and_conserving(caps):
    total = sum(caps)
    budget = int(0.2 * total)
    if budget == 0:
        return
    srt = sorted(caps)
    m = len(srt)
    valid = []
    prefix = 0
    for i, cap in enumerate(srt, start=1):
        lam = (budget - prefix) / (m - i + 1)
        prev = srt[i - 2] if i >= 2 else None
        if (prev is None or lam >= prev) and lam <= cap:
            valid.append(lam)
        prefix += cap
    assert len(valid) >= 1  # bracket exists when budget < total
    lam = min(valid)
    alloc = sum(min(cap, lam) for cap in caps)
    assert abs(alloc - budget) < 1e-6 * max(1, budget)
