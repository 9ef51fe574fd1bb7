"""Pure-Python property tests for the exact constructions the
round-11 queries rely on — each checked against the naive definition
it replaces:

1. q401: the ×n integer-cents Page-Hinkley lattice (dev = n·c − S −
   n·δ) reproduces the real-valued PH statistic exactly — scaled
   running sum / running min / excursion / first alarm all equal the
   Fractions-arithmetic walk, for every stream.
2. q402: the collapsed Bernoulli LLR (c0·t + (c1−c0)·s_t) equals the
   per-step increment sum term-for-term, and the closed-form first
   boundary crossing matches a naive sequential SPRT scan.
3. q403: the three shift-share terms telescope to e1 − e0 EXACTLY per
   cell in Fractions (so the decomposition needs no residual), and
   the e0 = 0 new-activity cell lands wholly in the shift term.
4. q404: the fixed-order second-digit Benford chain equals the
   mathematical sum (fsum) to float-sum tolerance, and both digit
   laws are true probability distributions (shares sum to 1).
5. q400: ppm quantization of a log-prob path deviates from the exact
   real-valued log-score by at most one half-ulp of the grid per
   term — the bound that justifies decoding on the integer lattice.
"""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------- q401


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=20000), min_size=1,
             max_size=80),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=10**6),
)
def test_ph_integer_lattice_equals_fraction_walk(cents, delta, lam):
    n = len(cents)
    s = sum(cents)
    mu = Fraction(s, n)
    # real-valued PH walk in exact rationals
    m = Fraction(0)
    mn = None
    best = Fraction(0)
    first_alarm = None
    # integer lattice walk, scaled by n
    mi = 0
    mni = None
    besti = 0
    first_alarmi = None
    for idx, c in enumerate(cents, start=1):
        m += Fraction(c) - mu - delta
        mn = m if mn is None or m < mn else mn
        ph = m - mn
        best = max(best, ph)
        if first_alarm is None and ph > lam:
            first_alarm = idx
        mi += n * c - s - n * delta
        mni = mi if mni is None or mi < mni else mni
        phi = mi - mni
        besti = max(besti, phi)
        if first_alarmi is None and phi > n * lam:
            first_alarmi = idx
    assert Fraction(besti, n) == best
    assert first_alarmi == first_alarm


# ---------------------------------------------------------------- q402


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1), min_size=1,
             max_size=200),
    st.integers(min_value=-300000, max_value=-1),
    st.integers(min_value=1, max_value=300000),
    st.integers(min_value=1, max_value=3_000_000),
)
def test_sprt_collapse_and_first_crossing(xs, c0, c1, bound):
    llr = 0
    s = 0
    naive_decision = None
    for t, x in enumerate(xs, start=1):
        llr += c1 if x else c0
        s += x
        # collapsed closed form at every step
        assert llr == c0 * t + (c1 - c0) * s
        if naive_decision is None and (llr >= bound or llr <= -bound):
            naive_decision = (t, llr, "h1" if llr >= bound else "h0")
    # closed-form scan (what the query's window + min/min_by computes)
    closed = None
    s = 0
    for t, x in enumerate(xs, start=1):
        s += x
        v = c0 * t + (c1 - c0) * s
        if closed is None and (v >= bound or v <= -bound):
            closed = (t, v, "h1" if v >= bound else "h0")
    assert closed == naive_decision


# ---------------------------------------------------------------- q403


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # nation
            st.integers(min_value=0, max_value=3),  # segment
            st.integers(min_value=0, max_value=10**9),  # e0 cents
            st.integers(min_value=0, max_value=10**9),  # e1 cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_shift_share_telescopes_exactly(cells):
    es0 = {}
    es1 = {}
    for _, seg, e0, e1 in cells:
        es0[seg] = es0.get(seg, 0) + e0
        es1[seg] = es1.get(seg, 0) + e1
    # the query requires segment base > 0; drop cells of all-zero-base
    # segments on BOTH sides, like the inner join does
    live = {s for s in es0 if es0[s] > 0}
    cells = [c for c in cells if c[1] in live]
    if not cells:
        return
    t0 = sum(es0[s] for s in live)
    t1 = sum(es1[s] for s in live)
    if t0 == 0:
        return
    big_g = Fraction(t1, t0) - 1
    for _, seg, e0, e1 in cells:
        gs = Fraction(es1[seg], es0[seg]) - 1
        nat = e0 * big_g
        mix = e0 * (gs - big_g)
        shift = e1 - e0 * (1 + gs)
        assert nat + mix + shift == e1 - e0
        if e0 == 0:
            # new activity is pure competitive shift
            assert nat == 0 and mix == 0 and shift == e1


# ---------------------------------------------------------------- q404


def test_benford_second_digit_chain_is_a_distribution():
    def p2(d):
        return [math.log10(1 + 1.0 / (10 * k + d)) for k in range(1, 10)]

    chain_total = 0.0
    for d in range(10):
        terms = p2(d)
        # left-associated chain (what both engines evaluate) vs fsum
        chain = 0.0
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        chain = acc
        assert abs(chain - math.fsum(terms)) < 1e-12
        chain_total += chain
    assert abs(chain_total - 1.0) < 1e-12
    first_two = math.fsum(
        math.log10(1 + 1.0 / d) for d in range(10, 100)
    )
    assert abs(first_two - 1.0) < 1e-12


# ---------------------------------------------------------------- q400


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-15.0, max_value=-1e-6, allow_nan=False),
        min_size=1,
        max_size=12,
    )
)
def test_ppm_quantized_path_score_bound(logps):
    ppm = [round(lp * 1_000_000) for lp in logps]
    exact = math.fsum(logps) * 1_000_000
    # each term deviates by at most half a ppm grid cell (+ fp noise)
    assert abs(sum(ppm) - exact) <= len(logps) * (0.5 + 1e-6) * (
        1 + 1e-9
    ) + 1e-3
