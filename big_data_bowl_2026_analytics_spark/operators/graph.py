"""Graph analytics over co-occurrence edges (triangle counting /
clustering coefficient) — the structural-cohesion measurements a
dedup/link-analysis pipeline runs on its pair graph (how clique-like
are the near-dup clusters? how inter-woven is the co-supply network?).

The triangle algorithm is the published degree-orientation method
(Suri & Vassilvitskii's MR-friendly form): orient every undirected
edge from its lower-(degree, id) endpoint to the higher one, build
wedges at each edge's source, close them against the edge set. Every
triangle has exactly ONE minimum vertex under the (degree, id) total
order, so it is counted exactly once, and each node generates only
O(out-degree²) wedges with out-degree bounded by O(sqrt(m)) on any
graph — the bound that keeps hub nodes from exploding the wedge join
at 100 TB (a naive neighbor self-join squares the hub degree).

Everything is integer counting over equi-joins: engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame, group_col: str, node_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """Distinct undirected edges ``(a < b)`` between nodes sharing a
    group: the generic pair-graph constructor (suppliers co-occurring
    in an order, docs sharing an LSH bucket, users sharing a session).

    Scale / CALLER CONTRACT: the pair expansion is per-group quadratic
    AND — unlike the pre-r13 self-join, which streamed the quadratic
    pairs — the collect_set form holds each whole group in one
    aggregation buffer and the full O(g²) pair array in ONE row before
    the explode. A pathological large group therefore fails HARD
    (single-row/array 2 GB limit, executor OOM) instead of merely
    running slow. Callers must bound group size: the registry callers
    group by l_orderkey (≤ 7 lineitems — safe at any SF); generic
    callers pass ``max_group_size``, which DROPS groups whose
    distinct-node set exceeds the cap before the quadratic expansion
    (a degenerate group is boilerplate a pair graph treats as one
    cluster anyway — the q32 ``max_bucket_size`` rationale).

    r13 optimization (guide §2.4): the original two-distinct + group
    self-join spent up to 5 exchanges (distinct per side, re-shuffle
    of both onto the group key, pair distinct). One collect_set
    aggregation (partial map-side) plus a map-side array pair
    expansion produces the same pair stream in 2 exchanges, and the
    shuffle carries one row per (group, node) instead of the join's
    duplicated probe rows. The per-group quadratic happens inside the
    task either way (the join co-located whole groups too).
    """
    grouped = (
        df.select(F.col(group_col).alias("_g"), F.col(node_col).alias("_v"))
        .groupBy("_g")
        .agg(F.collect_set("_v").alias("_vs"))
    )
    if max_group_size is not None:
        # Guards the O(g²) pair array (the 2 GB single-row hard limit);
        # the set buffer itself stays linear in group size — a corpus
        # whose single GROUPS outgrow executor memory needs the
        # pre-aggregated-count + semi-join form instead.
        grouped = grouped.where(F.size("_vs") <= max_group_size)
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(_vs, x ->"
                " transform(filter(_vs, y -> y > x),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("_p")
    )
    return pairs.select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b")).distinct()


def pagerank(
    edges: DataFrame, damping: float = 0.85, n_iter: int = 5
) -> DataFrame:
    """Fixed-iteration PageRank over a distinct undirected ``(a < b)``
    edge list: ``pr_{k+1}(v) = (1-d)/N + d * Σ_{u∈nbrs(v)} pr_k(u) /
    deg(u)``, uniform ``1/N`` start. Undirected co-occurrence graphs
    have no dangling nodes (every node's degree ≥ 1), so no dangling-
    mass redistribution term is needed and the per-node row count is
    invariant across iterations.

    Scale: the edge+degree frame is materialized ONCE (localCheckpoint
    pre-partitioned on ``src``) and reused every iteration; each
    iteration joins the NODE-sized rank state by explicit broadcast
    (post-checkpoint frames carry no stats, so the planner would
    otherwise SortMergeJoin — shuffling the EDGE frame every round;
    the q299/q360 class), then one groupBy(dst) whose map-side combine
    reduces to node grain before its single exchange. Lineage is
    truncated per iteration (the CC-operator lesson: reuse grows
    logical plans combinatorially). The one-row node count joins by
    broadcast. The rank broadcast grows with the node count; the
    BINDING limit is the 8 GB broadcast-relation / driver-memory
    ceiling, reached far before the 512M-row cap (nodes scale
    linearly with SF at tens of bytes per row). Past it the explicit
    hint HARD-FAILS (driver/broadcast OOM — no planner fallback), so
    a scale-up beyond ~10^8 nodes re-derives these loops with a
    partitioned state join, which is still cheaper then than
    shuffling edges per round here. The same bound governs every
    per-round node-state broadcast in this module (bfs_hops, hits,
    personalized_pagerank, kcore_profile).

    Floating-point: the per-neighbor sum is order-dependent at the
    last ulp and the damping contraction (d < 1) keeps cross-engine
    divergence at ulp scale through any fixed iteration count — callers
    comparing across engines round the FINAL ranks (fround pair), never
    intermediates.
    """
    directed = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out = (
        directed.join(deg, "src")
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src"), (F.lit(1.0) / F.col("n")).alias("pr")
    )
    teleport = 1.0 - damping
    for _ in range(n_iter):
        contrib = (
            out.join(F.broadcast(ranks), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
        )
        ranks = (
            contrib.crossJoin(F.broadcast(n_nodes))
            .select(
                F.col("dst").alias("src"),
                (
                    F.lit(teleport) / F.col("n")
                    + F.lit(damping) * F.col("s")
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("src").alias("v"), "pr")


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row frame over a distinct ``(a < b)`` edge list: node/edge
    counts, wedge count, triangle count, and the global clustering
    coefficient ``3·T / wedges`` (the fraction of open wedges that
    close).

    Three equi-joins, no cartesian anywhere: degrees (one shuffle),
    wedge generation (self-join of the ORIENTED list on its source —
    bounded by the orientation, not raw degree), and wedge closure
    against the canonical edge set.
    """
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient a→b when (deg, id) of a < (deg, id) of b. deg frames are
    # node-sized: plain shuffle joins (AQE broadcasts when small).
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    with_deg = edges.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    # Wedges at the minimum vertex: unordered {x, y} once each.
    o1 = oriented.select("src", F.col("dst").alias("x"))
    o2 = oriented.select("src", F.col("dst").alias("y"))
    wedges = o1.join(o2, "src").where(F.col("x") < F.col("y"))
    # Close against the canonical (a < b) edge set — x < y already,
    # so the closing edge is exactly (a=x, b=y): a plain equi-join.
    closed = wedges.join(
        edges, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b"))
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("bigint")
        .alias("n_wedges"),
        F.max("deg").alias("max_degree"),
    )
    one = (
        node_stats.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(tri))
    )
    clustering = F.when(
        F.col("n_wedges") > 0,
        3.0 * F.col("n_triangles") / F.col("n_wedges"),
    )
    return one.select(
        "n_nodes",
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("max_degree").cast("bigint").alias("max_degree"),
        "n_wedges",
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.round(clustering + 1e-9, 6).alias("global_clustering"),
    )


def kcore_profile(
    edges: DataFrame, k: DataFrame, n_rounds: int = 8
) -> DataFrame:
    """Synchronous k-core peeling profile over a distinct undirected
    ``(a < b)`` edge list: each round drops every node whose CURRENT
    degree is below ``k`` (a one-row frame with column ``k``,
    broadcast into the filter), then restricts the edge list to
    surviving endpoints — the degeneracy ladder behind influence-core
    extraction and graph-robustness audits. Returns one row per round
    (0 = the input graph) with node/edge counts and the degree range
    of the surviving subgraph.

    Exactness: every round is a deterministic function of the previous
    round's integer state, so any two engines running the same
    synchronous schedule agree bit-for-bit; the profile after a FIXED
    round budget is compared, with convergence reported per row
    (``converged`` = this round removed nothing) rather than assumed —
    the q28/q125 fixed-iteration contract. Chain-shaped graphs can
    legitimately still be shrinking at the budget.

    Scale: per round one groupBy(src) degree count plus two BROADCAST
    semi joins of the node-sized survivor frame (the pagerank/q299
    no-stats rule — the edge frame never shuffles); lineage is
    truncated per round (the CC-operator lesson). Aggregate stats are
    9 one-row frames unioned — the final window runs over
    ``n_rounds + 1`` rows, a bounded funnel.
    """
    from pyspark.sql import Window

    directed = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    kb = F.broadcast(k)

    # r13 optimization (guide §1.2 "don't compute things you throw
    # away"): the per-round degree frame used to be computed TWICE —
    # once for the keep filter and once inside the stats row of the
    # same round. It is now computed once per round, checkpointed, and
    # shared by both consumers (the stats aggregate then scans the
    # node-sized degree frame instead of the edge frame a second
    # time).
    def deg_of(d: DataFrame) -> DataFrame:
        return (
            d.groupBy("src")
            .agg(F.count(F.lit(1)).alias("dg"))
            .localCheckpoint(eager=False)
        )

    def stats(deg: DataFrame, rnd: int) -> DataFrame:
        agg = deg.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.coalesce((F.sum("dg") / 2).cast("bigint"), F.lit(0)).alias(
                "n_edges"
            ),
            F.min("dg").alias("min_deg"),
            F.max("dg").alias("max_deg"),
        )
        return agg.crossJoin(kb).select(
            F.lit(rnd).cast("bigint").alias("round"),
            "k",
            "n_nodes",
            "n_edges",
            "min_deg",
            "max_deg",
        )

    cur = directed
    deg = deg_of(cur)
    rows = [stats(deg, 0)]
    for rnd in range(1, n_rounds + 1):
        keep = (
            deg.crossJoin(kb)
            .where(F.col("dg") >= F.col("k"))
            .select(F.col("src").alias("v"))
            .localCheckpoint(eager=False)
        )
        # Broadcast the node-sized survivor frame into both semi
        # joins (the pagerank/q299 no-stats rule): the edge frame is
        # filtered in place instead of shuffling twice per round.
        cur = (
            cur.join(F.broadcast(keep), cur["src"] == keep["v"], "left_semi")
            .join(
                F.broadcast(keep.select(F.col("v").alias("v2"))),
                F.col("dst") == F.col("v2"),
                "left_semi",
            )
            .localCheckpoint(eager=False)
        )
        deg = deg_of(cur)
        rows.append(stats(deg, rnd))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    w = Window.orderBy("round")
    return out.select(
        "round",
        "k",
        "n_nodes",
        "n_edges",
        "min_deg",
        "max_deg",
        (F.col("n_nodes") == F.lag("n_nodes").over(w)).alias("converged"),
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over a distinct
    ``(a < b)`` edge list: ``lcc(v) = 2·T_v / (deg_v · (deg_v − 1))``
    where T_v counts triangles incident to v — NULL when deg < 2
    (no wedge to close). Returns ``(v, deg, n_triangles, lcc)``.

    Same degree-oriented wedge closure as ``triangle_stats`` (each
    triangle is found exactly once at its minimum-(deg, id) vertex as
    the ordered triple (src, x, y)), then every closed triple credits
    all three corners via a 3-way union — counts stay exact integers,
    the coefficient is an integer ratio (callers round with the fround
    pair). Join fan-out is bounded by the orientation, never by raw
    degree; no cartesian anywhere.
    """
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)  # orientation joins + final join
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("db"))
    with_deg = edges.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    o1 = oriented.select("src", F.col("dst").alias("x"))
    o2 = oriented.select("src", F.col("dst").alias("y"))
    wedges = o1.join(o2, "src").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        edges, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b"))
    ).select("src", "x", "y")
    corners = (
        closed.select(F.col("src").alias("v"))
        .unionAll(closed.select(F.col("x").alias("v")))
        .unionAll(closed.select(F.col("y").alias("v")))
    )
    tri_v = corners.groupBy("v").agg(F.count(F.lit(1)).alias("n_triangles"))
    return deg.join(tri_v, "v", "left").select(
        "v",
        "deg",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("bigint")
        .alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            (2.0 * F.coalesce(F.col("n_triangles"), F.lit(0)))
            / (F.col("deg") * (F.col("deg") - F.lit(1))),
        ).alias("lcc"),
    )


def bfs_hops(
    edges: DataFrame, n_rounds: int = 8, source: DataFrame | None = None
) -> DataFrame:
    """Level-synchronous single-source BFS over a distinct undirected
    ``(a < b)`` edge list from the graph's minimum node id (a
    deterministic landmark — no driver collect): returns ``(v, d)``
    with the exact hop distance for every node reached within
    ``n_rounds``; unreached nodes are absent (callers left-join and
    coalesce). Distances are exact integers, so unlike pagerank the
    result is engine-hashable with NO rounding.

    Each round relaxes dist through one join + a min-groupBy — the
    textbook message-passing step — with lineage truncated per round
    (the CC-operator lesson). The edge frame is symmetrized and
    checkpointed once; the NODE-sized dist frontier joins by explicit
    broadcast (post-checkpoint frames carry no stats, so the planner
    would otherwise SortMergeJoin — shuffling the EDGE frame every
    round; the q299/q360 class), and the min-groupBy map-side combines
    to node grain before its single exchange.
    """
    dsym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    if source is None:
        source = dsym.agg(F.min("src").alias("v"))
    dist = source.select("v", F.lit(0).cast("bigint").alias("d"))
    for _ in range(n_rounds):
        relaxed = F.broadcast(dist).join(dsym, dist.v == dsym.src).select(
            F.col("dst").alias("v"), (F.col("d") + 1).alias("d")
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
    return dist


def hits(edges: DataFrame, n_iter: int = 4) -> tuple[DataFrame, DataFrame]:
    """Fixed-iteration HITS (Kleinberg 1999) over a DIRECTED distinct
    edge list ``(src, dst)``: hubs live on sources, authorities on
    destinations. ``h_k(u) = Σ_{u→v} a_{k-1}(v)``, ``a_k(v) =
    Σ_{u→v} h_k(u)``, each vector max-normalized per round (the
    ∞-norm variant: dividing by the max keeps every score in (0, 1]
    and the divisor is a SELECTED value, not a float sum — no
    accumulation enters the normalizer). Returns ``(hubs(v, h),
    authorities(v, a))`` after ``n_iter`` rounds from ``a_0 ≡ 1``.

    Scale: the edge frame is checkpointed once; each round is two
    join+groupBy passes (the pagerank shape, doubled for the
    bipartite recurrence) with the NODE-sized score state joined by
    explicit broadcast (the pagerank/q299 no-stats-after-checkpoint
    rule: without the hint the EDGE frame would shuffle twice per
    round) and per-round lineage truncation; the 1-row max joins by
    broadcast. Power iteration on the
    nonnegative matrix contracts toward the principal eigenvector, so
    cross-engine float divergence stays at ulp scale through any
    fixed iteration count — callers round FINAL scores (fround pair),
    never intermediates.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    auth = e.select("dst").distinct().select(
        "dst", F.lit(1.0).alias("a")
    )
    hubs = None
    for _ in range(n_iter):
        # r13 optimization: checkpoint each PRE-norm aggregate — it
        # feeds both the max-normalizer broadcast and the normalized
        # next state, and without its own checkpoint the edge-frame
        # join + groupBy behind it executes twice per half-round
        # (once in the broadcast build, again when the normalized
        # frame's checkpoint materializes). Guide §1.2.
        hubs = (
            e.join(F.broadcast(auth), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .localCheckpoint(eager=False)
        )
        # The normalized frames are single-use cheap projections over
        # the checkpointed pre-norm frames — they no longer need their
        # own checkpoints (lineage is already truncated one node up).
        hmax = hubs.agg(F.max("h").alias("hm"))
        hubs = hubs.crossJoin(F.broadcast(hmax)).select(
            "src", (F.col("h") / F.col("hm")).alias("h")
        )
        auth = (
            e.join(F.broadcast(hubs), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .localCheckpoint(eager=False)
        )
        amax = auth.agg(F.max("a").alias("am"))
        auth = auth.crossJoin(F.broadcast(amax)).select(
            "dst", (F.col("a") / F.col("am")).alias("a")
        )
    return (
        hubs.select(F.col("src").alias("v"), "h"),
        auth.select(F.col("dst").alias("v"), "a"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
) -> DataFrame:
    """Fixed-iteration PERSONALIZED PageRank over a distinct
    undirected ``(a < b)`` edge list: the teleport mass lands on the
    ``seeds`` frame (one column ``v``, distinct node ids; uniform
    weights 1/|S|) instead of uniformly on all nodes —
    ``pr_{k+1}(v) = (1-d)·tele(v) + d·Σ_{u∈nbrs(v)} pr_k(u)/deg(u)``
    with ``pr_0 = tele``. Ranks measure proximity TO THE SEED SET
    (random walks restart there), the similarity-to-a-cohort notion
    behind "related items" and seed-expansion community detection.

    Same scale contract as ``pagerank``: the edge+degree frame and the
    bounded teleport frame are checkpointed once; each iteration is
    one broadcast join of the node-sized rank state (the pagerank
    no-stats rule — the hint keeps the EDGE frame unshuffled), one
    groupBy, and a full outer join against the teleport frame (nodes
    the walk has not reached yet simply have no row — rank exactly 0
    — rather than a dense node-grain frame every round).
    Per-iteration lineage truncation.

    Floating-point: identical contract to ``pagerank`` (damping
    contraction keeps cross-engine divergence at ulp scale; round the
    FINAL ranks only).
    """
    directed = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out = (
        directed.join(deg, "src")
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    ns = seeds.agg(F.count(F.lit(1)).alias("ns"))
    tele = (
        seeds.crossJoin(F.broadcast(ns))
        .select("v", (F.lit(1.0) / F.col("ns")).alias("tw"))
        .localCheckpoint(eager=False)
    )
    ranks = tele.select("v", F.col("tw").alias("pr"))
    tp = 1.0 - damping
    for _ in range(n_iter):
        contrib = (
            out.join(
                F.broadcast(ranks.select(F.col("v").alias("src"), "pr")),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
            .select(F.col("dst").alias("cv"), "s")
        )
        ranks = (
            tele.join(contrib, F.col("v") == F.col("cv"), "full")
            .select(
                F.coalesce(F.col("v"), F.col("cv")).alias("v"),
                (
                    F.lit(tp) * F.coalesce(F.col("tw"), F.lit(0.0))
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def bounded_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_nodes: int = 4096,
    max_edges: int = 65536,
) -> DataFrame:
    """Connected components for a CONFIG-BOUNDED graph — one whose
    node count is fixed by configuration (a spatial grid, a k-cell
    model), never by the data. The node and edge lists collect to the
    driver (the bounded-model-state pattern of the k centroid seeds;
    enforced, not assumed: the call RAISES past ``max_nodes``) and a
    union-find labels each component with its MINIMUM member id —
    exactly :func:`..operators.dedup.duplicate_clusters_star`'s output
    contract (isolated nodes label themselves), without its O(log² n)
    alternating star rounds: each round costs ~6 scheduler-floor
    shuffles, which dominates wall-clock when the graph itself is a
    few hundred rows (measured on the r13 optimization round's grid
    query: 5.6 s → ~1.3 s at sf0.1).

    Returns (id_col, cluster_id).
    """
    spark = nodes.sparkSession
    # bounded collects: caller declares the graph config-sized and the
    # bound is enforced before anything leaves the executors
    node_rows = [r[0] for r in nodes.select(F.col(id_col)).collect()]
    if len(node_rows) > max_nodes:
        raise ValueError(
            f"bounded_components got {len(node_rows)} nodes "
            f"(> max_nodes={max_nodes}) — this operator is for "
            "config-bounded graphs; use duplicate_clusters_star for "
            "data-sized ones"
        )
    # The node bound alone does not govern the collect's size (r13
    # verdict #5): a pathological ≤max_nodes graph can still carry a
    # quadratic edge multiset. The limit() bounds what ever LEAVES the
    # executors — at most max_edges+1 rows reach the driver, and one
    # row past the bound raises instead of silently truncating.
    edge_rows = pairs.select("doc_a", "doc_b").limit(max_edges + 1).collect()
    if len(edge_rows) > max_edges:
        raise ValueError(
            f"bounded_components got more than max_edges={max_edges} "
            "edges — this operator is for config-bounded graphs; use "
            "duplicate_clusters_star for data-sized ones"
        )
    parent: dict = {n: n for n in node_rows}

    def find(u):
        root = u
        while parent[root] != root:
            root = parent[root]
        while parent[u] != root:
            parent[u], u = root, parent[u]
        return root

    for a, b in edge_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union toward the smaller id so every root IS the min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(n, find(n)) for n in node_rows]
    from ..core.session import local_frame

    # LocalRelation, not a Python-RDD frame: the labels join back into
    # a data-sized plan and a LogicalRDD would re-enter a Python
    # worker on every evaluation (~0.25 s each, r14 measurement).
    out = local_frame(spark, rows, f"{id_col} long, cluster_id long")
    return out
