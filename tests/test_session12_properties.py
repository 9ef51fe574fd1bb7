"""Round-12 math pins: each new statistic's engine algebra against an
independent model (Fractions where the identity is exact, brute force
where the engine uses a clever reduction). No Spark involved — these
pin the FORMULAS the oracle and Spark expressions both spell."""

from __future__ import annotations

import math
from fractions import Fraction
from itertools import permutations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------------- q411 runs test


@given(st.lists(st.integers(0, 1), min_size=2, max_size=200))
def test_runs_count_equals_break_sum(seq):
    """R = Σ breaks (first element or sign change) == the scan count."""
    breaks = sum(
        1 for i, s in enumerate(seq) if i == 0 or seq[i - 1] != s
    )
    runs = 1
    for a, b in zip(seq, seq[1:]):
        runs += a != b
    assert breaks == runs


def test_runs_expectation_matches_exhaustive_enumeration():
    """E[R] over all arrangements of n1 ones and n2 zeros equals the
    closed form 1 + 2·n1·n2/(n1+n2) used by q411 — exactly, in
    Fractions, for every small split."""
    for n1, n2 in [(1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (4, 2)]:
        seqs = set(permutations([1] * n1 + [0] * n2))
        total = Fraction(0)
        for s in seqs:
            total += 1 + sum(a != b for a, b in zip(s, s[1:]))
        mean = total / len(seqs)
        assert mean == 1 + Fraction(2 * n1 * n2, n1 + n2)


def test_runs_variance_matches_exhaustive_enumeration():
    for n1, n2 in [(2, 2), (3, 2), (3, 3), (4, 3)]:
        seqs = set(permutations([1] * n1 + [0] * n2))
        rs = [
            1 + sum(a != b for a, b in zip(s, s[1:])) for s in seqs
        ]
        mean = Fraction(sum(rs), len(rs))
        var = sum((Fraction(r) - mean) ** 2 for r in rs) / len(rs)
        n = n1 + n2
        closed = Fraction(
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2), n * n * (n - 1)
        )
        assert var == closed


# --------------------------------------------------- q412 Allan variance


@given(
    st.lists(st.integers(0, 1000), min_size=4, max_size=120),
    st.sampled_from([1, 2, 4, 8]),
)
def test_allan_block_sum_identity(xs, m):
    """ΣD²/(2·P·m²) over block SUMS equals the textbook two-sample
    variance of adjacent block MEANS — exactly, in Fractions."""
    k = len(xs) // m
    if k < 2:
        return
    sums = [sum(xs[i * m : (i + 1) * m]) for i in range(k)]
    means = [Fraction(s, m) for s in sums]
    naive = sum(
        (means[i + 1] - means[i]) ** 2 for i in range(k - 1)
    ) / (2 * (k - 1))
    diffs = [sums[i + 1] - sums[i] for i in range(k - 1)]
    engine = Fraction(sum(d * d for d in diffs), 2 * (k - 1) * m * m)
    assert naive == engine


# ------------------------------------------------ q413 Greenwood lattice


@given(
    st.lists(
        st.tuples(st.integers(1, 500), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
def test_greenwood_lattice_bound(steps):
    """The 1e-12 fixed-point accumulator stays within k·1e-12 of the
    real-valued Greenwood sum after k event times (truncation < 1 unit
    per step), like the q384 ppm pin one lattice finer."""
    g_exact = Fraction(0)
    g_e12 = 0
    k = 0
    n_risk = sum(n for n, _ in [(a + b, 0) for a, b in steps])  # upper
    n_risk = max(n_risk, sum(a + b for a, b in steps))
    for extra, d in steps:
        n = max(d + extra, d + 1)  # ensure n > d (guarded branch)
        if d == 0:
            continue
        k += 1
        g_exact += Fraction(d, n * (n - d))
        g_e12 += (10**12 * d) // (n * (n - d))
    assert 0 <= g_exact - Fraction(g_e12, 10**12) < Fraction(k + 1, 10**12)


# ---------------------------------------------------- q414 Cliff's delta


@given(
    st.lists(st.integers(0, 8), min_size=1, max_size=40),
    st.lists(st.integers(0, 8), min_size=1, max_size=40),
)
def test_cliffs_delta_from_u_equals_brute_force(a, b):
    """2U − n_a·n_b == #(a>b) − #(a<b) with the average-rank U (ties
    contribute 1/2 each), so the engine's integer numerator IS the
    dominance count difference."""
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    eq = sum(1 for x in a for y in b if x == y)
    u = Fraction(gt) + Fraction(eq, 2)
    assert 2 * u - len(a) * len(b) == gt - lt
    delta = Fraction(gt - lt, len(a) * len(b))
    assert -1 <= delta <= 1


# ------------------------------------------- q415 seasonal Mann-Kendall


@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(0, 5)),
        min_size=4,
        max_size=60,
    )
)
def test_seasonal_mk_s_is_sum_of_per_season_s(pairs):
    """Σ_season S_season == the all-pairs S restricted to same-season
    pairs (the Hirsch-Slack definition), counted brute-force."""
    series = [(s, i, v) for i, (s, v) in enumerate(pairs)]
    per = {}
    for s, i, v in series:
        per.setdefault(s, []).append((i, v))
    total_engine = 0
    for s, items in per.items():
        items.sort()
        total_engine += sum(
            (b > a) - (b < a)
            for idx, (_, a) in enumerate(items)
            for _, b in items[idx + 1 :]
        )
    brute = sum(
        (vb > va) - (vb < va)
        for i, (sa, ia, va) in enumerate(series)
        for sb, ib, vb in series[i + 1 :]
        if sa == sb
    )
    assert total_engine == brute


def test_mk_variance_numerator_x18_is_integer_identity():
    """n(n−1)(2n+5) − Σt(t−1)(2t+5) is 18·Var(S) for tied data —
    checked against the textbook form in Fractions."""
    rng = np.random.default_rng(5)
    for _ in range(20):
        vals = rng.integers(0, 4, size=int(rng.integers(2, 12)))
        n = len(vals)
        from collections import Counter

        ties = Counter(vals.tolist())
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
        )
        var = Fraction(var18, 18)
        assert var >= 0
        assert var * 18 == var18


# --------------------------------------- q416 personalized PageRank


def _ppr_python(edges, seeds, d=Fraction(85, 100), n_iter=5):
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    tele = {v: Fraction(1, len(seeds)) for v in seeds}
    pr = dict(tele)
    for _ in range(n_iter):
        contrib: dict = {}
        for u, p in pr.items():
            share = p / len(nbrs[u])
            for v in nbrs[u]:
                contrib[v] = contrib.get(v, Fraction(0)) + share
        pr = {}
        for v in set(tele) | set(contrib):
            pr[v] = (1 - d) * tele.get(v, Fraction(0)) + d * contrib.get(
                v, Fraction(0)
            )
    return pr


def test_ppr_recurrence_conserves_mass_and_matches_matrix_power():
    """The sparse full-outer recurrence (the operator's shape) equals
    the dense matrix-power twin in EXACT Fractions, and total mass
    stays exactly 1 on a connected undirected graph (no dangling
    nodes); teleport-localized mass dominates near the seed."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5), (3, 6)]
    nodes = sorted({v for e in edges for v in e})
    seeds = [1]
    pr = _ppr_python(edges, seeds)
    assert sum(pr.values()) == 1
    # dense twin
    idx = {v: i for i, v in enumerate(nodes)}
    deg = {v: 0 for v in nodes}
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    p = [[Fraction(0)] * len(nodes) for _ in nodes]
    for a, b in edges:
        p[idx[b]][idx[a]] = Fraction(1, deg[a])
        p[idx[a]][idx[b]] = Fraction(1, deg[b])
    tele = [Fraction(1 if v in seeds else 0) for v in nodes]
    x = tele[:]
    d = Fraction(85, 100)
    for _ in range(5):
        y = [
            sum(p[i][j] * x[j] for j in range(len(nodes)))
            for i in range(len(nodes))
        ]
        x = [(1 - d) * tele[i] + d * y[i] for i in range(len(nodes))]
    for v in nodes:
        assert pr.get(v, Fraction(0)) == x[idx[v]]
    assert pr[1] == max(pr.values())


# ------------------------------------------ q417 Siegel repeated medians


def _rank_median(vals):
    """The engine's selection convention: odd -> middle, even -> mean
    of the two middles (== the classic median)."""
    s = sorted(vals)
    m = len(s)
    if m % 2 == 1:
        return s[(m + 1) // 2 - 1]
    return (s[m // 2 - 1] + s[m // 2]) / 2


def test_siegel_matches_numpy_median_convention():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(3, 15))
        x = np.arange(n, dtype=float)
        y = rng.normal(size=n) * 10
        meds = []
        for i in range(n):
            slopes = [
                (y[j] - y[i]) / (x[j] - x[i]) for j in range(n) if j != i
            ]
            meds.append(_rank_median(slopes))
            assert math.isclose(
                _rank_median(slopes), float(np.median(slopes)), rel_tol=1e-12
            )
        slope = _rank_median(meds)
        assert math.isclose(slope, float(np.median(meds)), rel_tol=1e-12)
        icept = _rank_median([y[i] - slope * x[i] for i in range(n)])
        assert math.isclose(
            icept,
            float(np.median([y[i] - slope * x[i] for i in range(n)])),
            rel_tol=1e-12,
        )


def test_siegel_breakdown_beats_theil_sen_on_heavy_corruption():
    """With 9 of 21 points (43% — past Theil-Sen's 29% breakdown,
    inside repeated-medians' 50%) corrupted to one huge constant,
    every mixed pair's slope is poisoned: the pairwise median (TS)
    lands in the poisoned mass while the per-point medians of the
    surviving majority still see mostly-clean slopes."""
    n = 21
    x = np.arange(n, dtype=float)
    y = 2.0 * x + 1.0
    y[:9] = 1e6  # 9 of 21 corrupted
    meds = [
        _rank_median(
            [(y[j] - y[i]) / (x[j] - x[i]) for j in range(n) if j != i]
        )
        for i in range(n)
    ]
    siegel = _rank_median(meds)
    all_slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(n)
        for j in range(i + 1, n)
    ]
    theil_sen = _rank_median(all_slopes)
    assert abs(siegel - 2.0) < 1e-9
    assert abs(theil_sen - 2.0) > 10


# ----------------------------------------------------- q418 Ljung-Box


@given(st.lists(st.integers(0, 20), min_size=9, max_size=80))
def test_ljung_box_scaled_autocovariance_identity(xs):
    """A_k/A_0 with A_k = Σ(n·x_t − S)(n·x_{t+k} − S) equals the
    textbook r_k = Σ(x_t−x̄)(x_{t+k}−x̄)/Σ(x_t−x̄)² EXACTLY (the n²
    scaling cancels) — in Fractions, ties and all."""
    n = len(xs)
    s = sum(xs)
    if all(x == xs[0] for x in xs):
        return
    a0 = sum((n * x - s) ** 2 for x in xs)
    for k in (1, 3, 7):
        ak = sum(
            (n * xs[t] - s) * (n * xs[t + k] - s) for t in range(n - k)
        )
        xbar = Fraction(s, n)
        num = sum(
            (Fraction(xs[t]) - xbar) * (Fraction(xs[t + k]) - xbar)
            for t in range(n - k)
        )
        den = sum((Fraction(x) - xbar) ** 2 for x in xs)
        assert Fraction(ak, a0) == num / den


# -------------------------------------------------- q419 Theil index


def test_theil_decomposition_identity_and_invariance():
    """T_total == T_between + T_within (the additive property the
    query reports), and the index is scale-invariant — both to float
    precision on random grouped data."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        groups = {
            g: rng.integers(1, 10**7, size=int(rng.integers(2, 50)))
            for g in range(int(rng.integers(2, 8)))
        }
        allx = np.concatenate(list(groups.values())).astype(float)
        n, s = len(allx), allx.sum()
        t_total = float(np.sum(allx / s * np.log(allx * n / s)))
        tb = tw = 0.0
        for g, xs in groups.items():
            xs = xs.astype(float)
            ng, sg = len(xs), xs.sum()
            tg = float(np.sum(xs / sg * np.log(xs * ng / sg)))
            tb += sg / s * math.log((sg * n) / (ng * s))
            tw += sg / s * tg
        assert math.isclose(t_total, tb + tw, rel_tol=1e-9, abs_tol=1e-12)
        assert t_total >= -1e-12
        # scale invariance: cents vs dollars gives the same index
        t_scaled = float(
            np.sum(allx * 100 / (s * 100) * np.log(allx * 100 * n / (s * 100)))
        )
        assert math.isclose(t_total, t_scaled, rel_tol=1e-9, abs_tol=1e-12)
