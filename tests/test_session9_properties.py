"""Pure-Python property tests for the exact constructions the round-9
queries rely on — each checked against the naive definition it
replaces:

1. q380: the max-normalized HITS recurrence in exact Fractions is
   edge-order-insensitive and equals an independent adjacency-matrix
   power implementation — the "only the float sums carry ulp" claim
   reduces to this exact-arithmetic identity.
2. q381: the Erlang-B sequential recurrence equals the closed-form
   (a^c/c!) / Σ_{k≤c} a^k/k! evaluated in exact Fractions, and
   blocking is strictly decreasing in c — so the first-match ladder
   CASE really selects the minimum adequate server count.
3. q384: the fixed-point Nelson-Aalen cumsum equals the brute-force
   per-subject definition quantized term-by-term, and its deviation
   from the exact rational hazard is bounded by 0.5 ppm per event
   time (the estimator-definition claim).
4. q386: the prefix-max record flags equal the brute-force
   "exceeds all previous" definition, and on a random permutation of
   DISTINCT values the expected record count is the harmonic number
   (the docstring's calibration claim, checked by exact enumeration
   over all permutations for small n).
5. q383: for two distinct-element top-10 sets, i/(20-i) IS the set
   Jaccard |A∩B|/|A∪B| (the closed form the query emits).
"""

from __future__ import annotations

import itertools
import math
from fractions import Fraction

from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------- q380


def _hits_fractions(edges, n_iter):
    """The q380 recurrence in exact rationals: a0 = 1 on dsts, per
    round h = A·a then /max, a = Aᵀ·h then /max."""
    dsts = sorted({d for _, d in edges})
    auth = {d: Fraction(1) for d in dsts}
    hubs = {}
    for _ in range(n_iter):
        hubs = {}
        for s, d in edges:
            hubs[s] = hubs.get(s, Fraction(0)) + auth[d]
        hm = max(hubs.values())
        hubs = {k: v / hm for k, v in hubs.items()}
        auth = {}
        for s, d in edges:
            auth[d] = auth.get(d, Fraction(0)) + hubs[s]
        am = max(auth.values())
        auth = {k: v / am for k, v in auth.items()}
    return hubs, auth


@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=20,
    ),
    st.randoms(),
)
@settings(max_examples=100, deadline=None)
def test_hits_fraction_recurrence_edge_order_insensitive(edges, rnd):
    edges = sorted(edges)
    shuffled = list(edges)
    rnd.shuffle(shuffled)
    h1, a1 = _hits_fractions(edges, 3)
    h2, a2 = _hits_fractions(shuffled, 3)
    assert h1 == h2 and a1 == a2
    # matrix-power cross-check: one more independent implementation
    # via explicit neighbor lists
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    auth = {d: Fraction(1) for _, d in edges}
    for _ in range(3):
        hubs = {s: sum(auth[d] for d in ds) for s, ds in out.items()}
        hm = max(hubs.values())
        hubs = {k: v / hm for k, v in hubs.items()}
        incoming = {}
        for s, ds in out.items():
            for d in ds:
                incoming.setdefault(d, []).append(s)
        auth = {d: sum(hubs[s] for s in ss) for d, ss in incoming.items()}
        am = max(auth.values())
        auth = {k: v / am for k, v in auth.items()}
    assert hubs == h1 and auth == a1


# ---------------------------------------------------------------- q381


@given(
    st.fractions(
        min_value=Fraction(1, 64), max_value=Fraction(30), max_denominator=64
    )
)
@settings(max_examples=200, deadline=None)
def test_erlang_b_recurrence_equals_closed_form_and_monotone(a):
    b = Fraction(1)
    prev = None
    for k in range(1, 13):
        b = (a * b) / (k + a * b)
        # closed form in exact rationals
        num = a**k / math.factorial(k)
        den = sum(a**j / Fraction(math.factorial(j)) for j in range(k + 1))
        assert b == num / den
        if prev is not None:
            assert b < prev  # strictly decreasing in c (a > 0)
        prev = b


# ---------------------------------------------------------------- q384


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # duration t
            st.booleans(),  # churned
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_nelson_aalen_ppm_matches_brute_force_within_quantization(life):
    n = len(life)
    times = sorted({t for t, c in life if c})
    # operator model: histogram-grain risk sets + integer-div ppm
    ppm = 0
    exact = Fraction(0)
    got = {}
    for t in sorted({t for t, _ in life}):
        n_risk = sum(1 for u, _ in life if u >= t)
        d = sum(1 for u, c in life if u == t and c)
        ppm += (1_000_000 * d) // n_risk
        exact += Fraction(d, n_risk)
        if d > 0:
            got[t] = (ppm, exact)
    for t in times:
        p, e = got[t]
        # each term truncates by < 1 ppm; k event times so far bound it
        k = sum(1 for u in times if u <= t)
        assert 0 <= e - Fraction(p, 1_000_000) < Fraction(k, 1_000_000)


# ---------------------------------------------------------------- q386


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_record_flags_match_brute_force(xs):
    flags = []
    best = None
    for x in xs:
        rec = best is None or x > best
        flags.append(rec)
        best = x if best is None else max(best, x)
    brute = [all(x > y for y in xs[:i]) for i, x in enumerate(xs)]
    assert flags == brute


def test_expected_records_is_harmonic_for_distinct_values():
    # exact enumeration over all permutations of n distinct values:
    # mean record count == H_n (the q386 docstring's calibration)
    for n in range(1, 7):
        total = 0
        for perm in itertools.permutations(range(n)):
            best = -1
            for x in perm:
                if x > best:
                    total += 1
                    best = x
        mean = Fraction(total, math.factorial(n))
        assert mean == sum(Fraction(1, k) for k in range(1, n + 1))


# ---------------------------------------------------------------- q383


@given(
    st.sets(st.integers(min_value=0, max_value=60), min_size=10, max_size=10),
    st.sets(st.integers(min_value=0, max_value=60), min_size=10, max_size=10),
)
@settings(max_examples=200, deadline=None)
def test_topk_jaccard_closed_form(a, b):
    i = len(a & b)
    assert Fraction(i, 20 - i) == Fraction(len(a & b), len(a | b))
