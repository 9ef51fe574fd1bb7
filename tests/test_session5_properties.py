"""Property tests for the fifth-session operators, each against an
independent brute-force model:

1. kcore_profile's synchronous peeling equals a plain-Python peeling
   simulation on random small graphs (same fixed round budget).
2. local_clustering equals brute-force per-node triangle counting.
3. pq_best_codes equals a numpy nearest-subcentroid argmin with the
   same (distance, code-id) tie-break.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.operators.graph import (
    kcore_profile,
    local_clustering,
)

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda t: t[0] != t[1]
    ),
    min_size=1,
    max_size=25,
)


def _canon(edges):
    return sorted({(min(a, b), max(a, b)) for a, b in edges})


def _py_peel(edges, k, n_rounds):
    """Synchronous peeling model: per round drop ALL nodes with
    current degree < k, then restrict edges; report per-round
    (n_nodes, n_edges, min_deg, max_deg)."""
    cur = set(edges)
    out = []

    def deg(es):
        d = {}
        for a, b in es:
            d[a] = d.get(a, 0) + 1
            d[b] = d.get(b, 0) + 1
        return d

    for rnd in range(n_rounds + 1):
        d = deg(cur)
        out.append(
            (
                rnd,
                len(d),
                len(cur),
                min(d.values()) if d else None,
                max(d.values()) if d else None,
            )
        )
        if rnd == n_rounds:
            break
        keep = {v for v, dv in d.items() if dv >= k}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    return out


@settings(max_examples=12, deadline=None)
@given(edges=_edges_strategy, k=st.integers(1, 4))
def test_kcore_profile_matches_python_peeling(spark, edges, k):
    canon = _canon(edges)
    df = spark.createDataFrame(canon, "a long, b long")
    kv = spark.createDataFrame([(k,)], "k long")
    got = {
        r["round"]: (r["n_nodes"], r["n_edges"], r["min_deg"], r["max_deg"])
        for r in kcore_profile(df, kv, n_rounds=4).collect()
    }
    for rnd, n_nodes, n_edges, mn, mx in _py_peel(canon, k, 4):
        assert got[rnd] == (n_nodes, n_edges, mn, mx), (rnd, k, canon)


@settings(max_examples=12, deadline=None)
@given(edges=_edges_strategy)
def test_local_clustering_matches_bruteforce(spark, edges):
    canon = _canon(edges)
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and y in adj.get(x, set())
        )
        lcc = (2.0 * tri) / (deg * (deg - 1)) if deg >= 2 else None
        want[v] = (deg, tri, lcc)
    df = spark.createDataFrame(canon, "a long, b long")
    got = {
        r["v"]: (r["deg"], r["n_triangles"], r["lcc"])
        for r in local_clustering(df).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0]
        assert got[v][1] == want[v][1]
        if want[v][2] is None:
            assert got[v][2] is None
        else:
            assert abs(got[v][2] - want[v][2]) < 1e-12


def test_pq_best_codes_matches_numpy_argmin(spark):
    import numpy as np

    from big_data_bowl_2026_analytics_spark.operators.similarity import (
        pq_best_codes,
        pq_subspace_frames,
    )

    rng = np.random.RandomState(7)
    vecs = rng.rand(30, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    subseeds, subvecs = pq_subspace_frames(df)
    got = {
        (r["vec_id"], r["sub"]): r["cid"]
        for r in pq_best_codes(subvecs, subseeds).collect()
    }
    # model: codebook = first 8 vectors by id, same slicing
    seeds = vecs[:8].astype(np.float64)
    v64 = vecs.astype(np.float64)
    for i in range(30):
        for s in range(4):
            sub = v64[i, 16 * s : 16 * s + 16]
            dists = [
                (float(((sub - seeds[c, 16 * s : 16 * s + 16]) ** 2).sum()), c)
                for c in range(8)
            ]
            want = min(dists)[1]
            assert got[(i, s)] == want, (i, s, dists)
