"""Property tests for the fourth-session operators, each against an
independent brute-force model:

1. triangle_stats (degree-oriented wedge join) equals brute-force
   triangle enumeration on random small graphs.
2. bucketed_cummax_prev equals the global-window strict-prefix max.
3. The q210 skyline construction (group max + prefix max) equals the
   brute-force dominance filter.
4. kaplan_meier equals the textbook product-limit estimator computed
   in plain Python.
"""

from __future__ import annotations

import math
from itertools import combinations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.operators.graph import triangle_stats
from big_data_bowl_2026_analytics_spark.operators.rankops import (
    bucketed_cummax_prev,
)
from big_data_bowl_2026_analytics_spark.operators.survival import kaplan_meier


def _brute_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for trio in combinations(sorted(adj), 3)
        if trio[1] in adj[trio[0]]
        and trio[2] in adj[trio[0]]
        and trio[2] in adj[trio[1]]
    )
    wedges = sum(d * (d - 1) // 2 for d in (len(s) for s in adj.values()))
    return len(adj), len(edges), wedges, tri


@settings(max_examples=12, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
            lambda p: p[0] < p[1]
        ),
        min_size=1,
        max_size=30,
    )
)
def test_triangle_stats_matches_bruteforce(spark, edges):
    # hypothesis-randomized complement to test_graph.py's hand-picked
    # topologies (K4, star, hub-adversarial).
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    row = triangle_stats(df).collect()[0]
    n_v, n_e, wedges, tri = _brute_triangles(edges)
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        n_v,
        n_e,
        wedges,
        tri,
    )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 500), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_bucketed_cummax_prev_equals_global_window(spark, rows):
    # duplicate keys allowed: tiebreak on a unique id makes the order
    # total, matching the operator contract.
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, k long, v long")
    got = {
        r.id: r.prev_max
        for r in bucketed_cummax_prev(df, "k", ["id"], "v", "prev_max").collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.id: r.prev_max
        for r in df.withColumn("prev_max", F.max("v").over(w)).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 40), st.integers(1, 15)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_construction_matches_dominance_bruteforce(spark, pts):
    # skyline: minimize price, maximize size; ties (equal on both)
    # dominate neither way and are all kept.
    data = [(i, c, s) for i, (c, s) in enumerate(pts)]
    df = spark.createDataFrame(data, "id long, cents long, size long")
    grp = df.groupBy("cents").agg(F.max("size").alias("pmax"))
    cm = bucketed_cummax_prev(grp, "cents", [], "pmax", "prev_max")
    got = {
        r.id
        for r in df.join(cm, "cents")
        .where(
            (F.col("size") == F.col("pmax"))
            & (F.col("prev_max").isNull() | (F.col("prev_max") < F.col("size")))
        )
        .collect()
    }
    want = {
        i
        for i, (c, s) in enumerate(pts)
        if not any(
            (c2 <= c and s2 >= s and (c2 < c or s2 > s))
            for (c2, s2) in pts
        )
    }
    assert got == want


def _brute_km(lifetimes):
    """Textbook product-limit: S(t) multiplies (1 - d/n) at each event
    time; n counts subjects with duration >= t."""
    out = []
    s = 1.0
    for t in sorted({t for t, ch in lifetimes if ch}):
        n = sum(1 for t2, _ in lifetimes if t2 >= t)
        d = sum(1 for t2, ch in lifetimes if t2 == t and ch)
        s *= 1 - d / n
        out.append((t, n, d, s))
    return out


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.booleans()),
        min_size=1,
        max_size=60,
    ).filter(lambda ls: any(ch for _, ch in ls))
)
def test_kaplan_meier_matches_product_limit(spark, lifetimes):
    df = spark.createDataFrame(
        [(t, int(ch)) for t, ch in lifetimes], "t long, churned int"
    )
    got = sorted(
        (r.t, r.n_risk, r.n_events, r.survival)
        for r in kaplan_meier(df).collect()
    )
    want = _brute_km(lifetimes)
    assert [(t, n, d) for t, n, d, _ in got] == [
        (t, n, d) for t, n, d, _ in want
    ]
    for (_, _, _, s_got), (_, _, _, s_want) in zip(got, want):
        assert math.isclose(s_got, s_want, rel_tol=1e-9, abs_tol=1e-12)


def _brute_mann_whitney(xs, ys):
    """Average-rank U and tie-corrected z computed the textbook way."""
    pooled = sorted(xs + ys)
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    n1, n2 = len(xs), len(ys)
    r1 = sum(ranks[v] for v in xs)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(pooled).values())
    sigma2 = (n1 * n2 / 12.0) * ((n + 1) - ties / (n * (n - 1.0)))
    z = None if sigma2 <= 0 else (u1 - n1 * n2 / 2.0) / math.sqrt(sigma2)
    return u1, z


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(0, 8), min_size=1, max_size=40),
    st.lists(st.integers(0, 8), min_size=1, max_size=40),
)
def test_mann_whitney_matches_bruteforce(spark, xs, ys):
    from big_data_bowl_2026_analytics_spark.operators.stats import (
        mann_whitney_z,
    )

    rows = [("g1", "g2", float(v), 1) for v in xs] + [
        ("g1", "g2", float(v), 0) for v in ys
    ]
    df = spark.createDataFrame(
        rows, "ta string, tb string, value double, is_a int"
    )
    got = mann_whitney_z(df).collect()[0]
    u_want, z_want = _brute_mann_whitney(xs, ys)
    assert got.n_a == len(xs) and got.n_b == len(ys)
    assert math.isclose(got.u_a, u_want, rel_tol=0, abs_tol=1e-9)
    if z_want is None:
        assert got.z is None
    else:
        assert math.isclose(got.z, z_want, rel_tol=1e-9, abs_tol=1e-12)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0, 1, allow_nan=False, width=32),
            st.integers(1, 5),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_pav_equals_gcm(ys):
    # two independent solvers of the same strictly convex program must
    # agree exactly (up to float roundoff in different operation
    # orders).
    import numpy as np

    from big_data_bowl_2026_analytics_spark.operators.isotonic import (
        gcm_fit,
        pav_fit,
    )

    y = np.array([v for v, _ in ys], dtype=float)
    w = np.array([c for _, c in ys], dtype=float)
    x = np.arange(len(y), dtype=float)
    a = pav_fit(x, y, w)
    b = gcm_fit(y, w)
    assert np.allclose(a, b, atol=1e-9)
    assert np.all(np.diff(a) >= -1e-12)


def test_isotonic_operator_matches_local_pav(spark):
    import numpy as np

    from big_data_bowl_2026_analytics_spark.operators.isotonic import (
        isotonic_calibration,
        pav_fit,
    )

    rows = []
    rng = [(i * 37 + 11) % 100 for i in range(200)]
    for i, r in enumerate(rng):
        rows.append(("g" + str(i % 2), float(r) / 100, float((r * 7) % 2)))
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = isotonic_calibration(df, "grp", "x", "y").collect()
    assert all(r.block_mean_ok and r.monotone_ok for r in out)
    for g in ("g0", "g1"):
        sub = sorted(
            [r for r in out if r.grp == g], key=lambda r: r.x
        )
        # recompute locally on the same grain
        import collections

        grain = collections.OrderedDict()
        for grp, x, y in rows:
            if grp != g:
                continue
            grain.setdefault(x, []).append(y)
        xs = sorted(grain)
        ym = np.array([sum(grain[x]) / len(grain[x]) for x in xs])
        w = np.array([len(grain[x]) for x in xs], dtype=float)
        want = pav_fit(np.array(xs), ym, w)
        got = np.array([r.y_iso for r in sub])
        assert np.allclose(got, want, atol=1e-12)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20000), st.integers(1, 4000)),
        min_size=1,
        max_size=50,
    )
)
def test_two_level_sweep_equals_global_running_sum(spark, intervals):
    # the q231 decomposition: within-hour running sum + hours-grain
    # base must equal the single global running sum at every boundary.
    rows = []
    for i, (s, d) in enumerate(intervals):
        rows.append((float(s), 1, i))
        rows.append((float(s + d), -1, i))
    df = spark.createDataFrame(rows, "t double, delta int, sid long")
    w_g = Window.orderBy("t", "delta", "sid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r.t, r.delta, r.sid): r.conc
        for r in df.withColumn("conc", F.sum("delta").over(w_g)).collect()
    }
    hb = F.floor(F.col("t") / 3600).cast("bigint")
    deltas = df.withColumn("hb", hb)
    w_in = (
        Window.partitionBy("hb")
        .orderBy("t", "delta", "sid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inhour = deltas.withColumn("run_in", F.sum("delta").over(w_in))
    nets = deltas.groupBy("hb").agg(F.sum("delta").alias("net"))
    w_h = Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, -1)
    bases = nets.withColumn(
        "base", F.coalesce(F.sum("net").over(w_h), F.lit(0))
    ).select("hb", "base")
    got = {
        (r.t, r.delta, r.sid): r.base + r.run_in
        for r in inhour.join(bases, "hb").collect()
    }
    assert got == want
