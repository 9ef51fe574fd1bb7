"""Pure-Python (plus one small-Spark) property tests for the exact
constructions the round-8 queries rely on — each checked against the
naive definition it replaces:

1. q370: ordering by ln(u)/w is EXACTLY the A-Res ordering by
   u^(1/w) (the log transform is monotone, so the sampled top-k can
   never differ), and the w-weighting is directionally right: raising
   one item's weight never demotes it below an otherwise-identical
   item.
2. q371: the closed-form JS decomposition over shared tokens plus
   ln2*(1 - shared_mass) equals the textbook full-support
   sum-over-all-tokens definition.
3. q372: the simplified silhouette (sqrt(d2)-sqrt(d1))/sqrt(d2) lies
   in [0, 1) whenever 0 <= d1 <= d2 (the no-sign-of-zero claim in the
   query doc is a theorem, not an observation).
4. q373: the 16-term dyadic EWMA sum is EXACT in any summation order
   (float result == Fraction result) for integer demands below 2^20 —
   the cross-engine-stability claim.
5. exact_jaccard_pairs (the shared q346/q356/q364 verifier): i/u per
   candidate pair equal brute-force Python shingle-set math.
"""

from __future__ import annotations

import math
import random
from fractions import Fraction

from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------- q370


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=65536),  # hash16 + 1
            st.integers(min_value=1, max_value=100000),  # weight
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_ares_log_ordering_matches_power_ordering(items):
    # ln(u)/w (maximize) orders identically to u^(1/w) (maximize):
    # the monotone-transform identity the query's key relies on.
    keys_log = sorted(
        range(len(items)),
        key=lambda i: (-(math.log(items[i][0] / 65537.0) / items[i][1]), i),
    )
    keys_pow = sorted(
        range(len(items)),
        key=lambda i: (-((items[i][0] / 65537.0) ** (1.0 / items[i][1])), i),
    )
    assert keys_log == keys_pow


@given(
    st.integers(min_value=1, max_value=65536),
    st.integers(min_value=1, max_value=99999),
)
@settings(max_examples=200, deadline=None)
def test_ares_weight_monotone(u_int, w):
    # same u, larger weight => key (ln u)/w strictly closer to zero
    # (ln u < 0), i.e. strictly preferred — weighting acts in the
    # advertised direction.
    u = u_int / 65537.0
    assert math.log(u) / (w + 1) > math.log(u) / w


# ---------------------------------------------------------------- q371


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=2,
        max_size=40,
    ).filter(
        lambda cs: sum(a for a, _ in cs) > 0 and sum(b for _, b in cs) > 0
    )
)
@settings(max_examples=200, deadline=None)
def test_js_closed_form_one_sided_mass(counts):
    # counts[i] = (occurrences in A, occurrences in B) for token i.
    n1 = sum(a for a, _ in counts)
    n2 = sum(b for _, b in counts)

    # Textbook JS over the full support.
    def kl_to_mix(x, y):
        # x*ln(2x/(x+y)) with 0*ln0 = 0
        return 0.0 if x == 0 else x * math.log(2.0 * x / (x + y))

    js_direct = 0.0
    for a, b in counts:
        p, q = a / n1, b / n2
        js_direct += 0.5 * (kl_to_mix(p, q) + kl_to_mix(q, p))

    # q371's closed form: shared-token terms + ln2 * one-sided masses.
    sa = sum(
        (a / n1) * math.log(2.0 * (a / n1) / ((a / n1) + (b / n2)))
        for a, b in counts
        if a > 0 and b > 0
    )
    sb = sum(
        (b / n2) * math.log(2.0 * (b / n2) / ((a / n1) + (b / n2)))
        for a, b in counts
        if a > 0 and b > 0
    )
    ca = sum(a for a, b in counts if a > 0 and b > 0)
    cb = sum(b for a, b in counts if a > 0 and b > 0)
    js_closed = 0.5 * (sa + sb) + 0.5 * math.log(2.0) * (
        (1.0 - ca / n1) + (1.0 - cb / n2)
    )
    assert abs(js_direct - js_closed) < 1e-12
    assert -1e-12 <= js_closed <= math.log(2.0) + 1e-12


# ---------------------------------------------------------------- q372


@given(
    st.floats(min_value=0.0, max_value=1e12, allow_nan=False),
    st.floats(min_value=0.0, max_value=1e12, allow_nan=False),
)
@settings(max_examples=500, deadline=None)
def test_simplified_silhouette_range(a, b):
    d1, d2 = min(a, b), max(a, b)
    if d2 == 0:
        return  # the query pins this case to literal 0.0 on both sides
    s = (math.sqrt(d2) - math.sqrt(d1)) / math.sqrt(d2)
    # IEEE sqrt is monotone, so s >= 0 EXACTLY (never -0.0 from
    # rounding), and < 1 unless d1 == 0 exactly.
    assert s >= 0.0
    assert math.copysign(1.0, s) == 1.0
    assert s <= 1.0


# ---------------------------------------------------------------- q373


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**20), min_size=16, max_size=16
    ),
    st.randoms(),
)
@settings(max_examples=200, deadline=None)
def test_dyadic_ewma_sum_exact_any_order(zs, rng):
    # terms z_i * 2^-(i+1), i = 0..15: every partial sum fits in 53
    # bits over the common 2^-16 denominator, so float == Fraction in
    # ANY summation order — the q373 cross-engine-stability claim.
    terms = [(z, i) for i, z in enumerate(zs)]
    rng.shuffle(terms)
    got = 0.0
    for z, i in terms:
        got += z * (1.0 / (1 << (i + 1)))
    want = sum(Fraction(z, 1 << (i + 1)) for z, i in terms)
    assert Fraction(got) == want


# ------------------------------------------- exact_jaccard_pairs model


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_jaccard_pairs_matches_python_model(spark):
    from pyspark.sql import functions as F

    from big_data_bowl_2026_analytics_spark.operators.dedup import (
        exact_jaccard_pairs,
    )

    rng = random.Random(8)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(20)
    ]
    pairs = [(a, b) for a in range(20) for b in range(a + 1, 20)]
    cand_sample = rng.sample(pairs, 60)

    docs_df = spark.createDataFrame(docs, ["doc_id", "text"])
    cand_df = spark.createDataFrame(cand_sample, ["doc_a", "doc_b"])
    got = {
        (r.doc_a, r.doc_b): (r.i, r.u)
        for r in exact_jaccard_pairs(docs_df, cand_df, shingle_n=3).collect()
    }

    sh = {i: _shingles(t) for i, t in docs}
    want = {}
    for a, b in cand_sample:
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if inter > 0:  # the verifier inner-joins on a shared shingle
            want[(a, b)] = (inter, union)
    assert got == want


# ---------------------------------------------------------------- q376


@given(
    st.lists(
        st.tuples(  # per stratum: (a, b, c, d) 2x2 cells, all >= 0
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ).filter(lambda q: sum(q) >= 2),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_cmh_integer_numerator_identity(strata):
    # the q376 construction: d_k = (a*n - r1*c1)/n computed from an
    # EXACT integer numerator must equal a - E with E = r1*c1/n in
    # exact arithmetic — i.e. the integer form IS the excess, not an
    # approximation of it.
    for a, b, c, d in strata:
        n = a + b + c + d
        r1, c1 = a + b, a + c
        lhs = Fraction(a * n - r1 * c1, n)
        rhs = Fraction(a, 1) - Fraction(r1 * c1, n)
        assert lhs == rhs


# ---------------------------------------------------------------- q377


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=40), min_size=3, max_size=3),
        min_size=3,
        max_size=3,
    ).filter(lambda m: sum(map(sum, m)) > 0 and all(any(r) for r in m))
)
@settings(max_examples=200, deadline=None)
def test_g_statistic_is_2n_mutual_information(m):
    # G = 2*sum c_ij*ln(c_ij*N/(r_i*t_j)) == 2*N*MI(from; to) in nats
    # — the identity that makes q377's statistic the sequence-memory
    # measurement, not just a GOF number.
    k = len(m)
    rows = [sum(m[i]) for i in range(k)]
    cols = [sum(m[i][j] for i in range(k)) for j in range(k)]
    n = sum(rows)
    g = sum(
        2.0 * m[i][j] * math.log(m[i][j] * n / (rows[i] * cols[j]))
        for i in range(k)
        for j in range(k)
        if m[i][j] > 0
    )
    mi = sum(
        (m[i][j] / n)
        * math.log((m[i][j] / n) / ((rows[i] / n) * (cols[j] / n)))
        for i in range(k)
        for j in range(k)
        if m[i][j] > 0
    )
    assert abs(g - 2.0 * n * mi) < 1e-9 * max(1.0, abs(g))
    assert g >= -1e-12  # MI is nonnegative


# ---------------------------------------------------------------- q378


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),  # duration t
            st.booleans(),  # churned
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=900),  # tau
)
@settings(max_examples=200, deadline=None)
def test_rmst_segment_area_equals_direct_integral(life, tau):
    # q378's lag/lead segment-area construction must equal the direct
    # day-by-day integral of the KM step function up to tau.
    from collections import Counter

    events = Counter()
    at = Counter()
    for t, churned in life:
        at[t] += 1
        if churned:
            events[t] += 1
    # KM curve at event times (exact Fractions); the risk set at t is
    # every subject whose duration is >= t.
    times = sorted(t for t in events)
    curve = []  # (t, S after the drop at t)
    s = Fraction(1)
    for t in times:
        n_risk = sum(c for u, c in at.items() if u >= t)
        s = s * (1 - Fraction(events[t], n_risk))
        curve.append((t, s))
    # direct integral: S(x) constant between event times
    direct = Fraction(0)
    prev_t, prev_s = 0, Fraction(1)
    for t, s_after in curve:
        if t >= tau:
            break
        direct += prev_s * (min(t, tau) - prev_t)
        prev_t, prev_s = t, s_after
    direct += prev_s * max(tau - prev_t, 0)
    # q378's construction: initial segment + per-event-row areas
    area = Fraction(0)
    for i, (t, s_after) in enumerate(curve):
        if i == 0:
            area += min(t, tau)  # S=1 initial segment
        t_next = curve[i + 1][0] if i + 1 < len(curve) else tau
        width = max(min(t_next, tau) - min(t, tau), 0)
        area += s_after * width
    if not curve:
        area = Fraction(tau)
    assert area == direct


# ---------------------------------------------------------------- q379


@given(
    st.lists(  # per source: (token occurrences c_i, source size n_i)
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=2,
        max_size=8,
    ).filter(
        lambda xs: sum(c for c, _ in xs) > 0
        and all(c <= n for c, n in xs)
    )
)
@settings(max_examples=300, deadline=None)
def test_dp_dispersion_bounds_and_zero_iff_proportional(srcs):
    # DP = sum|c_i*N - n_i*C| / (2*C*N) in exact integers: bounded in
    # [0, 1), and 0 exactly when the token spreads proportionally to
    # source sizes.
    C = sum(c for c, _ in srcs)
    N = sum(n for _, n in srcs)
    num = sum(abs(c * N - n * C) for c, n in srcs)
    dp = Fraction(num, 2 * C * N)
    assert 0 <= dp < 1
    proportional = all(c * N == n * C for c, n in srcs)
    assert (dp == 0) == proportional
