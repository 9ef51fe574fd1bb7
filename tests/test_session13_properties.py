"""Round-13 math pins: each new statistic's engine algebra against an
independent model (Fractions where the identity is exact, brute force
where the engine uses a clever reduction). No Spark involved — these
pin the FORMULAS the oracle and Spark expressions both spell.

Covers q420 Kendall's W, q421 Page's L, q422 Bowker, q423 CvM,
q424 Hurst R/S lattice, q425 Fleiss kappa, q426 Morisita-Horn,
q427 entropy rate, q428 Mood's median test, q429 Pettitt."""

from __future__ import annotations

import math
from fractions import Fraction
from itertools import permutations

from hypothesis import given, settings
from hypothesis import strategies as st


def _midranks(values):
    """Textbook midranks (average rank over ties), as Fractions."""
    s = sorted(values)
    first = {}
    for i, v in enumerate(s, 1):
        first.setdefault(v, i)
    cnt = {}
    for v in s:
        cnt[v] = cnt.get(v, 0) + 1
    return [Fraction(2 * first[v] + cnt[v] - 1, 2) for v in values]


# --------------------------------------------- q420 Kendall's W


@given(
    st.lists(
        st.lists(st.integers(0, 5), min_size=4, max_size=4),
        min_size=2,
        max_size=6,
    )
)
def test_kendalls_w_doubled_rank_identity(matrix):
    """The engine's W = 3·S4/(m²(n³−n) − m·ΣT) over DOUBLED midranks
    equals the textbook tie-corrected W = 12·S/(m²(n³−n) − m·ΣT)
    with S = Σ_j (R_j − m(n+1)/2)² — exactly, in Fractions."""
    m, n = len(matrix), len(matrix[0])
    ranks = [_midranks(row) for row in matrix]
    tie_t = 0
    for row in matrix:
        cnt = {}
        for v in row:
            cnt[v] = cnt.get(v, 0) + 1
        tie_t += sum(t * t * t - t for t in cnt.values())
    denom = m * m * (n**3 - n) - m * tie_t
    if denom == 0:
        return  # every rater's row fully tied — W undefined
    # textbook: column rank sums, squared deviations from the mean
    rj = [sum(ranks[i][j] for i in range(m)) for j in range(n)]
    s_txt = sum((r - Fraction(m * (n + 1), 2)) ** 2 for r in rj)
    w_txt = Fraction(12) * s_txt / denom
    # engine: doubled ranks are exact integers; S4 = Σ(2R_j − m(n+1))²
    r2j = [int(2 * r) for r in rj]
    assert all(2 * r == int(2 * r) for r in rj)  # exact halves sum
    s4 = sum((r2 - m * (n + 1)) ** 2 for r2 in r2j)
    w_eng = Fraction(3 * s4, denom)
    assert w_eng == w_txt
    assert 0 <= w_eng <= 1


def test_kendalls_w_perfect_agreement_is_one():
    m, n = 5, 25
    rj = [m * (j + 1) for j in range(n)]  # all raters rank identically
    s4 = sum((2 * r - m * (n + 1)) ** 2 for r in rj)
    assert Fraction(3 * s4, m * m * (n**3 - n)) == 1


# ----------------------------------------------- q421 Page's L


def test_pages_l_null_moments_by_enumeration():
    """For k=5 tie-free blocks: over all 120 in-block permutations,
    2L has mean 90 and variance 100 per block — exactly the constants
    in q421's z = (2L − 90b)/(10√b)."""
    k = 5
    vals = []
    for perm in permutations(range(1, k + 1)):
        two_l = 2 * sum(j * r for j, r in zip(range(1, k + 1), perm))
        vals.append(two_l)
    mean = Fraction(sum(vals), len(vals))
    assert mean == 90
    var = sum((Fraction(v) - mean) ** 2 for v in vals) / len(vals)
    assert var == 100


@given(st.lists(st.integers(0, 30), min_size=5, max_size=5))
def test_pages_l_cross_product_rank_equals_midrank(cells):
    """q421 ranks block cells by integer cross-products on (sum,
    count) rates; with counts 1 that is 2·(#strictly less) +
    (#equal) + 1 == the doubled midrank."""
    ranks = _midranks(cells)
    for i, v in enumerate(cells):
        lt = sum(1 for w in cells if w < v)
        eq = sum(1 for w in cells if w == v)
        assert 2 * lt + eq + 1 == 2 * ranks[i]


# ------------------------------------------- q422 Bowker split div


@given(
    st.integers(0, 10**9),
    st.integers(1, 10**7),
)
def test_bowker_split_integer_division_identity(d2, s):
    """1e6·(d² DIV s) + (1e6·(d² MOD s)) DIV s == (1e6·d²) DIV s for
    non-negative operands — the overflow-safe split q422 spells."""
    assert (
        10**6 * (d2 // s) + (10**6 * (d2 % s)) // s
        == (10**6 * d2) // s
    )


def test_bowker_reduces_to_mcnemar_on_two_categories():
    """With one off-diagonal pair, Bowker's χ² = (b−c)²/(b+c) —
    McNemar's statistic."""
    for b, c in [(3, 7), (0, 5), (10, 10), (1, 0)]:
        if b + c == 0:
            continue
        chi_bowker = Fraction((b - c) ** 2, b + c)
        chi_mcnemar = Fraction((b - c) ** 2, b + c)
        assert chi_bowker == chi_mcnemar


# ------------------------------------------------ q423 CvM gaps


@given(
    st.lists(st.integers(0, 8), min_size=2, max_size=40),
    st.lists(st.integers(0, 8), min_size=2, max_size=40),
)
def test_cvm_histogram_gap_form_equals_direct_ecdf(xs, ys):
    """T from the distinct-value histogram (d_v = m·A_v − n·B_v,
    term (a_v+b_v)·d_v²) equals the textbook multiplicity-weighted
    integrated squared ECDF gap — exactly, in Fractions."""
    n, m = len(xs), len(ys)
    support = sorted(set(xs) | set(ys))
    total = Fraction(0)
    hist_sum = 0
    ca = cb = 0
    for v in support:
        a = xs.count(v)
        b = ys.count(v)
        ca += a
        cb += b
        d = m * ca - n * cb
        hist_sum += (a + b) * d * d
        fgap = Fraction(ca, n) - Fraction(cb, m)
        total += (a + b) * fgap**2
    # histogram form: Σ(a+b)d² / (nm)² == Σ(a+b)(F−G)²
    assert Fraction(hist_sum, (n * m) ** 2) == total
    # and the full statistic nm/N²·Σ(F−G)² is the same scaled ratio
    big_n = n + m
    t_direct = Fraction(n * m, big_n**2) * total
    t_hist = Fraction(hist_sum, n * m * big_n**2)
    assert t_hist == t_direct


# ---------------------------------------- q424 Hurst R/S lattice


@given(st.lists(st.integers(0, 1000), min_size=2, max_size=128))
def test_hurst_lattice_range_and_variance_numerator(block):
    """Within a block: the range of centered cumulative deviations
    equals (max − min of the m·C_k − k·S lattice)/m, and the
    population-variance numerator is (m·Q − S²)/m² — both exact."""
    m = len(block)
    s = sum(block)
    q = sum(v * v for v in block)
    cum = 0
    lattice = []
    for k, v in enumerate(block, 1):
        cum += v
        lattice.append(m * cum - k * s)
    # exact model in Fractions
    mean = Fraction(s, m)
    cdev = []
    acc = Fraction(0)
    for v in block:
        acc += v - mean
        cdev.append(acc)
    r_exact = max(cdev) - min(cdev)
    assert Fraction(max(lattice) - min(lattice), m) == r_exact
    var_exact = sum((Fraction(v) - mean) ** 2 for v in block) / m
    assert Fraction(m * q - s * s, m * m) == var_exact
    assert m * q - s * s >= 0


# ----------------------------------------------- q425 Fleiss kappa


@given(
    st.lists(
        st.lists(st.integers(0, 3), min_size=4, max_size=4).map(
            lambda counts: counts
        ),
        min_size=2,
        max_size=20,
    )
)
def test_fleiss_kappa_integer_ratio_matches_textbook(rows):
    """kappa = (A·Nm − (m−1)·E)/((m−1)·((Nm)² − E)) over the exact
    BIGINT sums A = Σn_ic² − Nm, E = ΣB_c² equals the textbook
    (P̄ − P̄e)/(1 − P̄e) — exactly, in Fractions."""
    # normalize every subject to the same rater count m >= 2
    m = max(2, max(sum(r) for r in rows))
    rows = [r[:] for r in rows]
    for r in rows:
        r[0] += m - sum(r)  # top up category 0 so Σ = m
    n_subj = len(rows)
    nm = n_subj * m
    a_sum = sum(sum(c * c for c in r) for r in rows) - nm
    cat_tot = [sum(r[c] for r in rows) for c in range(4)]
    e_sum = sum(b * b for b in cat_tot)
    denom = (m - 1) * (nm * nm - e_sum)
    # textbook
    p_bar = Fraction(a_sum, nm * (m - 1))
    p_e = Fraction(e_sum, nm * nm)
    if p_e == 1:
        assert denom == 0
        return
    kappa_txt = (p_bar - p_e) / (1 - p_e)
    kappa_eng = Fraction(a_sum * nm - (m - 1) * e_sum, denom)
    assert kappa_eng == kappa_txt


# ------------------------------------------- q426 Morisita-Horn


@given(
    st.lists(st.integers(0, 50), min_size=3, max_size=30),
    st.lists(st.integers(0, 50), min_size=3, max_size=30),
)
def test_morisita_horn_bounds_via_exact_identity(xs, ys):
    """MH = 2·P·X·Y/(Sx²·Y² + Sy²·X²) ∈ [0, 1] because the denominator
    minus the numerator is Σ(x_i·Y − y_i·X)² ≥ 0 — an exact integer
    identity; MH(x, x) = 1."""
    k = max(len(xs), len(ys))
    xs = xs + [0] * (k - len(xs))
    ys = ys + [0] * (k - len(ys))
    x_tot, y_tot = sum(xs), sum(ys)
    if x_tot == 0 or y_tot == 0:
        return
    p = sum(a * b for a, b in zip(xs, ys))
    sx2 = sum(a * a for a in xs)
    sy2 = sum(b * b for b in ys)
    num = 2 * p * x_tot * y_tot
    den = sx2 * y_tot * y_tot + sy2 * x_tot * x_tot
    gap = sum((a * y_tot - b * x_tot) ** 2 for a, b in zip(xs, ys))
    assert den - num == gap
    assert 0 <= num <= den
    if xs == ys:
        assert num == den


# ----------------------------------------- q427 entropy rate


@given(
    st.lists(
        st.lists(st.integers(1, 20), min_size=3, max_size=3),
        min_size=3,
        max_size=3,
    )
)
def test_entropy_rate_never_exceeds_marginal_entropy(counts):
    """H(next | current) under the stationary law ≤ H(stationary
    marginal): conditioning reduces entropy, so q427's info_gain
    column is non-negative by theorem."""
    # build a strictly positive row-stochastic matrix from the counts
    pmat = [[Fraction(c, sum(row)) for c in row] for row in counts]
    # stationary π by long power iteration from uniform
    pi = [Fraction(1, 3)] * 3
    for _ in range(200):
        pi = [
            sum(pi[i] * pmat[i][j] for i in range(3)) for j in range(3)
        ]
    pif = [float(p) for p in pi]
    assert abs(sum(pif) - 1.0) < 1e-9
    h_rate = -sum(
        pif[i] * float(pmat[i][j]) * math.log(float(pmat[i][j]))
        for i in range(3)
        for j in range(3)
        if pmat[i][j] > 0
    )
    h_marg = -sum(p * math.log(p) for p in pif if p > 0)
    assert h_rate <= h_marg + 1e-9


# ------------------------------------- q428 Mood's median test


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=2,
        max_size=5,
    )
)
def test_moods_chi2_collapse_equals_cellwise_chi2(table):
    """q428's collapsed χ² = Σ_g (N·a_g − n_g·A)²/(n_g·A·B) equals the
    textbook Σ over all 2×k cells of (O − E)²/E — exactly, in
    Fractions (groups with n_g = 0 drop on both sides)."""
    table = [(a, b) for a, b in table if a + b > 0]
    if not table:
        return
    a_tot = sum(a for a, _ in table)
    b_tot = sum(b for _, b in table)
    n_tot = a_tot + b_tot
    if a_tot == 0 or b_tot == 0:
        return
    chi_cells = Fraction(0)
    for a, b in table:
        ng = a + b
        ea = Fraction(ng * a_tot, n_tot)
        eb = Fraction(ng * b_tot, n_tot)
        chi_cells += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    chi_eng = sum(
        Fraction((n_tot * a - (a + b) * a_tot) ** 2, (a + b))
        for a, b in table
    ) / Fraction(a_tot * b_tot)
    assert chi_eng == chi_cells


def test_moods_median_rank_selection_position():
    """The pooled median the query selects — min v with cumcount ≥
    (N+1)//2 — is the value at sorted position (N+1)//2 (the lower
    median), for histograms with arbitrary ties."""
    for values in (
        [1, 1, 2, 3, 3, 3, 9],
        [5],
        [2, 2, 2, 2],
        [1, 2, 3, 4, 5, 6],
    ):
        s = sorted(values)
        n = len(s)
        target = s[(n + 1) // 2 - 1]
        cum = 0
        pick = None
        for v in sorted(set(s)):
            cum += s.count(v)
            if cum >= (n + 1) // 2:
                pick = v
                break
        assert pick == target


# ------------------------------------------------ q429 Pettitt


@given(st.lists(st.integers(0, 6), min_size=2, max_size=60))
def test_pettitt_rank_algebra_equals_brute_sign_double_sum(xs):
    """U_t = Σ_{i≤t} 2R_i − t(n+1) (doubled midranks) equals the
    brute double sum Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j), for every t,
    with arbitrary ties."""
    n = len(xs)
    two_r = [int(2 * r) for r in _midranks(xs)]
    s2 = 0
    for t in range(1, n):
        s2 += two_r[t - 1]
        u_alg = s2 - t * (n + 1)
        u_brute = sum(
            (xs[i] > xs[j]) - (xs[i] < xs[j])
            for i in range(t)
            for j in range(t, n)
        )
        assert u_alg == u_brute


def test_pettitt_k_detects_a_clean_level_shift():
    """A hard level shift maximizes |U_t| exactly at the last
    pre-shift index, and K hits its theoretical ceiling t·(n−t)."""
    pre, post = [1] * 10, [5] * 8
    xs = pre + post
    n = len(xs)
    two_r = [int(2 * r) for r in _midranks(xs)]
    s2, us = 0, []
    for t in range(1, n):
        s2 += two_r[t - 1]
        us.append(s2 - t * (n + 1))
    k = max(abs(u) for u in us)
    t_star = max(range(len(us)), key=lambda i: abs(us[i])) + 1
    assert t_star == len(pre)
    assert k == len(pre) * len(post)
