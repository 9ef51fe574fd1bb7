"""IVF (inverted-file) approximate nearest neighbor search.

The second similarity scale path next to sign-random-projection LSH
(``operators/similarity.py``): partition the corpus into ``k`` Voronoi
cells around centroids, then answer queries by scanning only the
``nprobe`` nearest cells — an equi-join on ``cluster_id`` instead of a
cross join, exactly like a vector database's IVF-Flat index.

Two centroid sources:

- ``seed_centroids``: the embeddings of the ``k`` smallest ids.
  Deterministic and SQL-expressible, so the registry queries built on
  it hash-match a DuckDB oracle (the correctness gate).
- ``kmeans_fit``: distributed Lloyd's iterations refining those seeds.
  Assignment is pure column math against a broadcast centroid array
  (zero shuffle); the update step is one map-side-combined shuffle of
  at most ``k x dim`` rows per upstream partition. Only the ``k x dim``
  centroid matrix itself is collected per iteration — model state, not
  data.

All distance math is the same sequential fold in float64 used by the
cosine operators, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq_l2(a: Column, b: Column, dim: int | None = None) -> Column:
    """Squared L2 distance as a sequential fold in double.

    Inputs are float32 arrays; each ``(x - y)``, product, and running
    sum is exact or correctly rounded in float64 in a fixed order, so
    any engine folding sequentially produces identical bits. With
    ``dim`` known statically the fold unrolls into codegen arithmetic
    (same order, same bits — see similarity.py::dot).
    """
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            d = F.element_at(a, i).cast("double") - F.element_at(b, i).cast(
                "double"
            )
            acc = acc + d * d
        return acc
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d)


def seed_centroids(
    vectors: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid seed: the ``k`` lowest-id vectors.

    Returns (cluster_id, centroid). cluster_id is the rank of the seed
    vector's id, so the mapping is stable across engines and runs.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.asc(id_col))
    return (
        vectors.orderBy(F.asc(id_col))
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cluster_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment: vectors x broadcast(centroids) ->
    argmin distance with a cluster-id tie-break.

    The broadcast join co-locates each vector's k candidate rows, so
    the argmin groupBy partially aggregates map-side to one row per
    vector before its single shuffle.
    """
    scored = vectors.select(id_col, vec_col).join(
        F.broadcast(centroids), how="cross"
    ).select(
        id_col,
        vec_col,
        "cluster_id",
        sq_l2(F.col(vec_col), F.col("centroid"), dim=dim).alias("dist"),
    )
    return scored.groupBy(id_col, vec_col).agg(
        F.min_by(
            F.col("cluster_id"), F.struct(F.col("dist"), F.col("cluster_id"))
        ).alias("cluster_id")
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    n_iters: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's k-means; returns the learned centroid matrix
    (k x dim, cluster_id order). Deterministic: seed-init from the k
    lowest ids, fixed iteration count, tie-breaks on cluster_id.

    Per iteration: (1) assignment is a single projection against the
    centroid ARRAY LITERAL — no join, no shuffle; (2) the centroid
    update posexplodes assigned vectors to (cluster, dim_idx, value)
    and means them — partial aggregation reduces each upstream
    partition to <= k*dim rows before the one shuffle; (3) only the
    k x dim centroid matrix (a few KB) comes back to the driver, the
    same footprint as broadcasting any trained model.
    """
    seeds = seed_centroids(vectors, k, id_col, vec_col).collect()
    centroids = [
        [float(x) for x in row["centroid"]]
        for row in sorted(seeds, key=lambda r: r["cluster_id"])
    ]
    # The iteration body re-reads the vectors n_iters times and its
    # per-row cost is the interpreted k x dim distance folds — spread
    # it across the session's parallelism regardless of how few files
    # the source has (a single parquet file otherwise pins the whole
    # fit to ONE task), and pin the materialized frame for the loop.
    sc = vectors.sparkSession.sparkContext
    vectors = vectors.select(id_col, vec_col).repartition(
        sc.defaultParallelism, F.col(id_col)
    )
    vectors.persist()
    try:
        for _ in range(n_iters):
            assigned = vectors.select(
                F.col(vec_col).alias("v"),
                nearest_centroid_expr(F.col(vec_col), centroids).alias("cluster_id"),
            )
            # decimal sums are exact, so the mean is independent of
            # partial-aggregate merge order — parallel fits stay
            # bit-deterministic run to run (float64 sums would pick up
            # merge-order ulp jitter).
            new_rows = (
                assigned.select(
                    "cluster_id", F.posexplode(F.col("v")).alias("dim_idx", "x")
                )
                .groupBy("cluster_id", "dim_idx")
                .agg(
                    F.avg(
                        F.col("x").cast("double").cast("decimal(27,12)")
                    ).alias("mean_x")
                )
                .collect()
            )
            by_cluster: dict[int, list[float]] = {}
            for row in new_rows:
                by_cluster.setdefault(row["cluster_id"], [0.0] * dim)[
                    row["dim_idx"]
                ] = float(row["mean_x"])
            # Empty clusters keep their previous centroid.
            centroids = [by_cluster.get(c, centroids[c]) for c in range(k)]
    finally:
        vectors.unpersist()
    return centroids


def nearest_centroid_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """cluster_id of the nearest centroid, as pure column math against
    the centroid literal (no join, no shuffle, whole-stage codegen).

    Ties break toward the lower cluster_id via strict '<' comparison.
    """
    dists = F.array(
        *[
            sq_l2(vec, F.array(*[F.lit(x) for x in c]).cast("array<double>"))
            for c in centroids
        ]
    )
    # array_position returns the FIRST index holding the minimum, so
    # ties resolve to the lower cluster_id. A when-chain argmin would
    # duplicate sub-expressions 2^k times; this stays linear in k.
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def quantization_error(
    vectors: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> float:
    """Mean squared distance to the assigned centroid — the quantity
    Lloyd's iterations monotonically decrease."""
    dists = [
        sq_l2(F.col(vec_col), F.array(*[F.lit(x) for x in c]).cast("array<double>"))
        for c in centroids
    ]
    row = vectors.select(F.least(*dists).alias("d")).agg(F.avg("d").alias("mse")).head()
    return float(row["mse"])


def ivf_index(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """The IVF-Flat index frame: (id, vector, squared norm,
    cluster_id) — the corpus-side cell assignment, which is the
    dominant cost of a self-contained search. Build once at ingest,
    persist bucketed by ``cluster_id`` (write_bucketed), and every
    subsequent :func:`ivf_topk_indexed` call touches only the probed
    cells."""
    from ..operators.similarity import squared_norm

    return assign_clusters(vectors, centroids, id_col, vec_col, dim=dim).select(
        F.col(id_col),
        F.col(vec_col),
        squared_norm(F.col(vec_col)).alias("sqnorm"),
        "cluster_id",
    )


def ivf_topk_indexed(
    index: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Search a prebuilt :func:`ivf_index`: rank the ``nprobe``
    nearest cells per query (queries × k_cells broadcast argmin — tiny)
    and scan only those cells via a cluster_id equi-join. Corpus-side
    assignment never runs at query time. If ``queries`` already
    carries ``sqnorm`` (a filtered slice of the index), the norm is
    reused rather than recomputed.

    (A map-side probe via an array-of-structs centroid literal was
    measured SLOWER here — k × dim distance folds inlined into one
    array_sort expression cross the codegen-size cliff documented at
    similarity.py::dot; the broadcast cross join + window over
    queries × k rows stays cheap and compiles small.)"""
    from pyspark.sql import Window

    from ..operators.similarity import cosine, squared_norm

    corpus = index.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("sqnorm").alias("c_norm"),
        "cluster_id",
    )

    q_norm = (
        F.col("sqnorm")
        if "sqnorm" in queries.columns
        else squared_norm(F.col(vec_col))
    )
    probe_scored = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        q_norm.alias("q_norm"),
    ).join(F.broadcast(centroids), how="cross").select(
        "query_id",
        "q_vec",
        "q_norm",
        "cluster_id",
        sq_l2(F.col("q_vec"), F.col("centroid"), dim=dim).alias("dist"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("cluster_id")
    )
    probes = (
        probe_scored.withColumn("probe_rank", F.row_number().over(w_probe))
        .where(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "q_norm", "cluster_id")
    )

    scored = (
        corpus.join(F.broadcast(probes), "cluster_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                )
                + 1e-9,
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-Flat search: each query probes its ``nprobe`` nearest cells
    and ranks candidates by exact cosine within them.

    Scale shape: corpus-side assignment is a broadcast argmin (one
    map-side-combined shuffle keyed by vector id), the probe list is
    queries x k rows, and the candidate scan is an equi-join on
    cluster_id — the corpus is never cross-joined. Recall rises with
    nprobe (= k recovers exact search).

    Self-contained form (assignment recomputed per call); a deployment
    issuing many searches builds :func:`ivf_index` once and calls
    :func:`ivf_topk_indexed`.
    """
    return ivf_topk_indexed(
        ivf_index(vectors, centroids, id_col, vec_col, dim=dim),
        queries,
        centroids,
        k,
        nprobe,
        id_col,
        vec_col,
        dim=dim,
    )
