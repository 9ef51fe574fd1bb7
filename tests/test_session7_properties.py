"""Pure-Python property tests for the exact constructions the
round-7 queries rely on — each checked against the naive definition
it replaces:

1. q350: the level-synchronous relaxation (min over carry + neighbor
   dist + 1, k rounds) equals textbook queue-based BFS for every node
   within k hops, and leaves farther nodes unreached.
2. q355: the merged-breakpoint 1-D optimal-transport plan has the two
   histograms as EXACT marginals and its cost equals the W1 distance
   computed independently from the CDF-difference integral — the
   monotone-coupling optimality identity.
3. q356: the Jaccard triangle bound J13 >= J12 + J23 - 1 can never be
   violated by true set similarities (the audit's zero-violation
   tripwire is a theorem, not an observation).
"""

from __future__ import annotations

from collections import deque
from fractions import Fraction

from hypothesis import given, settings, strategies as st


def _python_bfs(edges: set[tuple[int, int]], src: int) -> dict[int, int]:
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    dist = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        for w in adj.get(v, []):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


@settings(max_examples=150)
@given(
    st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).map(
            lambda p: (min(p), max(p))
        ),
        min_size=1,
        max_size=25,
    ).map(lambda s: {(a, b) for a, b in s if a != b}),
    st.integers(1, 6),
)
def test_level_synchronous_bfs_equals_queue_bfs(edges, rounds):
    if not edges:
        return
    nodes = {v for e in edges for v in e}
    src = min(nodes)
    truth = _python_bfs(edges, src)
    # level-synchronous relaxation, exactly as operators/graph.py::bfs_hops
    dist = {src: 0}
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    for _ in range(rounds):
        relaxed = [(d, v) for s, v in sym if s in dist for d in [dist[s] + 1]]
        merged = dict(dist)
        for d, v in relaxed:
            if v not in merged or d < merged[v]:
                merged[v] = d
        dist = merged
    for v in nodes:
        if truth.get(v, 10**9) <= rounds:
            assert dist[v] == truth[v]
        else:
            assert v not in dist


def _ot_plan(ha: dict[int, int], hb: dict[int, int]):
    """Merged-breakpoint monotone coupling, exactly as q355: scaled
    integer CDF breakpoints, each segment assigned to the next
    at-or-after value on each side."""
    na, nb = sum(ha.values()), sum(hb.values())
    pts = []
    cum = 0
    for x in sorted(ha):
        cum += ha[x]
        pts.append((cum * nb, 0, x))
    cum = 0
    for x in sorted(hb):
        cum += hb[x]
        pts.append((cum * na, 1, x))
    pts.sort()
    plan: dict[tuple[int, int], int] = {}
    prev = 0
    for i, (s, _side, _x) in enumerate(pts):
        if s > prev:
            nxt_a = next(x for ss, sd, x in pts[i:] if sd == 0 and ss >= s)
            nxt_b = next(x for ss, sd, x in pts[i:] if sd == 1 and ss >= s)
            plan[(nxt_a, nxt_b)] = plan.get((nxt_a, nxt_b), 0) + (s - prev)
        prev = s
    return plan, na, nb


@settings(max_examples=150)
@given(
    st.dictionaries(st.integers(0, 12), st.integers(1, 9), min_size=1,
                    max_size=6),
    st.dictionaries(st.integers(0, 12), st.integers(1, 9), min_size=1,
                    max_size=6),
)
def test_ot_plan_marginals_and_w1_identity(ha, hb):
    plan, na, nb = _ot_plan(ha, hb)
    m = na * nb
    # marginals: row sums reproduce ha (scaled by nb), col sums hb
    row: dict[int, int] = {}
    col: dict[int, int] = {}
    for (a, b), w in plan.items():
        row[a] = row.get(a, 0) + w
        col[b] = col.get(b, 0) + w
    assert row == {x: c * nb for x, c in ha.items()}
    assert col == {x: c * na for x, c in hb.items()}
    # cost of the monotone coupling == W1 from the CDF integral
    cost = sum(abs(a - b) * w for (a, b), w in plan.items())
    support = sorted(set(ha) | set(hb))
    w1 = 0
    ca = cb = 0
    for x, x_next in zip(support, support[1:]):
        ca += ha.get(x, 0)
        cb += hb.get(x, 0)
        w1 += abs(ca * nb - cb * na) * (x_next - x)
    assert Fraction(cost, m) == Fraction(w1, m)


@settings(max_examples=200)
@given(
    st.sets(st.integers(0, 15), min_size=1, max_size=10),
    st.sets(st.integers(0, 15), min_size=1, max_size=10),
    st.sets(st.integers(0, 15), min_size=1, max_size=10),
)
def test_jaccard_triangle_bound_is_a_theorem(sa, sm, sc):
    def jac(p, q):
        return Fraction(len(p & q), len(p | q))

    # the q356 invariant: J(a,c) >= J(a,m) + J(m,c) - 1 always
    assert jac(sa, sc) >= jac(sa, sm) + jac(sm, sc) - 1


@settings(max_examples=100)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 3), st.integers(1, 50)),
        min_size=2,
        max_size=20,
    )
)
def test_ipf_raking_converges_to_target_marginals(cells_raw):
    # q366's schedule: 5 rounds of row-then-column scaling toward
    # uniform row marginals while preserving column (lang) marginals.
    # Property: column marginals match the target EXACTLY after every
    # column step, row marginals converge toward uniform, and total
    # mass is preserved.
    cells: dict[tuple[int, int], float] = {}
    for r, c, n in cells_raw:
        cells[(r, c)] = cells.get((r, c), 0) + n
    rows = sorted({r for r, _ in cells})
    colsum0 = {}
    for (r, c), v in cells.items():
        colsum0[c] = colsum0.get(c, 0) + v
    total = sum(cells.values())
    rt = total / len(rows)
    w = dict(cells)
    mis_prev = None
    for _ in range(5):
        rs = {}
        for (r, c), v in w.items():
            rs[r] = rs.get(r, 0) + v
        w = {(r, c): v * rt / rs[r] for (r, c), v in w.items()}
        cs = {}
        for (r, c), v in w.items():
            cs[c] = cs.get(c, 0) + v
        w = {(r, c): v * colsum0[c] / cs[c] for (r, c), v in w.items()}
        # column marginals exact after the column step
        cs2 = {}
        for (r, c), v in w.items():
            cs2[c] = cs2.get(c, 0) + v
        for c in cs2:
            assert abs(cs2[c] - colsum0[c]) < 1e-9 * max(1.0, colsum0[c])
        # row misfit is non-increasing round over round
        rs2 = {}
        for (r, c), v in w.items():
            rs2[r] = rs2.get(r, 0) + v
        mis = sum(abs(v - rt) for v in rs2.values())
        if mis_prev is not None:
            assert mis <= mis_prev + 1e-9
        mis_prev = mis
    # mass preserved (column marginals sum to the original total)
    assert abs(sum(w.values()) - total) < 1e-6 * max(1.0, total)
