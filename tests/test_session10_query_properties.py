"""Pure-Python property tests for the exact constructions the
round-10 queries rely on — each checked against the naive definition
it replaces:

1. q391/q396: leave-one-fold-out sufficient statistics by SUBTRACTION
   (global − fold) equal the directly-computed complement sums — the
   identity that turns k-fold CV into arithmetic instead of k passes.
   Exact integers, so equality is literal.
2. q390: the centered-ridge closed form beta = Sxy_c / (Sxx_c + lam)
   minimizes the penalized objective Σ(y - a - bx)² + lam·b² with
   a = ȳ - b·x̄ — verified in exact Fractions by perturbation (the
   quadratic's global optimum) — and at lam = 0 it equals the
   classical OLS slope.
3. q394: the randomized-response debias (4K·obs − n) / (3K) is
   exactly unbiased — in Fractions, plugging the mechanism's exact
   expected observed count E[obs_t] = n((3/4)π_t + 1/(4K)) into the
   debias formula returns n·π_t for every distribution π.
4. q395: content-defined chunk boundaries are LOCAL — prepending any
   token prefix to a stream leaves every chunk strictly after the
   first post-prefix boundary unchanged (the CDC shift-invariance
   that fixed-size blocking lacks).
5. q392: the ppm-quantized DSIR weight deviates from the exact
   real-valued log-ratio sum by at most n_tokens · (0.5 + eps) ppm —
   one half-ulp of the grid per token instance.
"""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings, strategies as st

# ------------------------------------------------------- q391 / q396


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # fold
            st.integers(min_value=0, max_value=9),  # x
            st.integers(min_value=0, max_value=1000),  # y
        ),
        min_size=1,
        max_size=60,
    )
)
def test_lofo_subtraction_equals_direct_complement(rows):
    def sums(sel):
        return (
            len(sel),
            sum(x for _, x, _ in sel),
            sum(y for _, _, y in sel),
            sum(x * x for _, x, _ in sel),
            sum(x * y for _, x, y in sel),
            sum(y * y for _, _, y in sel),
        )

    glob = sums(rows)
    for f in range(5):
        fold = sums([r for r in rows if r[0] == f])
        direct = sums([r for r in rows if r[0] != f])
        # Σy² is deliberately NOT part of the LOFO train stats in
        # q391 (only the held-out side needs it) but the identity
        # holds for every component, so check all six.
        assert tuple(g - fl for g, fl in zip(glob, fold)) == direct


# ---------------------------------------------------------------- q390


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=3,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=4096),
)
def test_ridge_closed_form_minimizes_penalized_objective(obs, lam_i):
    xs = [Fraction(x) for x, _ in obs]
    ys = [Fraction(y) for _, y in obs]
    n = Fraction(len(obs))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx_c = sxx - sx * sx / n
    sxy_c = sxy - sx * sy / n
    lam = Fraction(lam_i)
    if sxx_c + lam == 0:
        return  # degenerate: constant x and lam = 0
    beta = sxy_c / (sxx_c + lam)

    def objective(b):
        a = sy / n - b * sx / n  # the centered intercept the query uses
        return (
            sum((y - a - b * x) ** 2 for x, y in zip(xs, ys)) + lam * b * b
        )

    base = objective(beta)
    for eps in (Fraction(1, 7), Fraction(-3, 11), Fraction(1), Fraction(-5)):
        assert objective(beta + eps) >= base
    if lam == 0 and sxx_c != 0:
        assert beta == sxy_c / sxx_c  # classical OLS slope


# ---------------------------------------------------------------- q394


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=2, max_size=8)
)
def test_randomized_response_debias_is_exactly_unbiased(counts):
    n = sum(counts)
    if n == 0:
        return
    k = len(counts)
    for t, c in enumerate(counts):
        pi_t = Fraction(c, n)
        e_obs = n * (Fraction(3, 4) * pi_t + Fraction(1, 4 * k))
        est = (4 * k * e_obs - n) / Fraction(3 * k)
        assert est == n * pi_t == c


# ---------------------------------------------------------------- q395


def _chunks(tokens, is_boundary):
    """The q395 rule: a boundary falls AFTER each boundary token, so a
    token's chunk id is the count of boundary tokens strictly before
    it. Returns the list of chunk token-tuples in order."""
    out, cur = [], []
    for t in tokens:
        cur.append(t)
        if is_boundary(t):
            out.append(tuple(cur))
            cur = []
    if cur:
        out.append(tuple(cur))
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=80),
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=20),
)
def test_cdc_chunks_shift_invariant_after_first_boundary(tokens, prefix):
    is_boundary = lambda t: t % 8 == 0  # noqa: E731 (mirrors hash%8==0)
    base = _chunks(tokens, is_boundary)
    shifted = _chunks(prefix + tokens, is_boundary)
    # every chunk of the base stream that starts after the base
    # stream's first boundary appears verbatim in the shifted stream:
    # the prefix can only perturb the chunk containing the seam.
    if len(base) > 1:
        tail = base[1:]
        assert set(map(tuple, tail)) <= set(map(tuple, shifted))
        # stronger: the shifted stream ENDS with exactly those chunks,
        # in order — the seam chunk is the only one the prefix touches.
        assert shifted[-len(tail):] == tail


# ---------------------------------------------------------------- q392


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # bucket
            st.integers(min_value=1, max_value=12),  # count in doc
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=16,
        max_size=16,
    ),
)
def test_dsir_ppm_weight_within_half_grid_per_token(doc, bucket_counts):
    t_tot = float(sum(ct for ct, _ in bucket_counts))
    r_tot = float(sum(cr for _, cr in bucket_counts))
    lr_exact, lr_ppm = {}, {}
    for b, (ct, cr) in enumerate(bucket_counts):
        v = math.log((ct + 1.0) / (t_tot + 16.0)) - math.log(
            (cr + 1.0) / (r_tot + 16.0)
        )
        lr_exact[b] = v
        lr_ppm[b] = round(v * 1_000_000 + 1e-9)
    w_ppm = sum(c * lr_ppm[b] for b, c in doc)
    w_exact = sum(c * lr_exact[b] for b, c in doc)
    n_tok = sum(c for _, c in doc)
    assert abs(w_ppm - w_exact * 1_000_000) <= n_tok * 0.5000001 + 1e-3
