"""Embedding similarity search: brute-force cosine top-k and an
LSH-bucketed (random-hyperplane) approximate variant.

Vector math stays JVM-side as higher-order array functions
(``zip_with`` + ``aggregate`` = a sequential fold, bit-identical to
DuckDB's ``list_sum(list_transform(...))``) — no explode into 64x rows,
no Python. The ANN variant buckets vectors by sign-pattern against
deterministic integer hyperplanes, turning top-k into a per-bucket
equi-join: the scale path when the corpus no longer fits a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def squared_norm(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed squared norm per side (avoids
    recomputing norms inside an N x M join)."""
    return dot(a, b) / (F.sqrt(norm_a) * F.sqrt(norm_b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank by rounded cosine with an id tie-break.

    Scale: the corpus side streams — each partition scores its vectors
    against the broadcast queries and keeps a local heap via the
    row_number window on (query_id); only #queries x k rows survive.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        squared_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        squared_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm"))
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


def hyperplane_coef(plane: int, k: Column | int) -> Column:
    """Deterministic pseudo-random hyperplane component in {-3..3}:
    ((plane*131 + k*17) % 7) - 3. Integer-valued on purpose — the
    sign test then involves no transcendental math, so bucket
    assignment is engine-exact.
    """
    kc = F.lit(k) if isinstance(k, int) else k
    return ((F.lit(plane * 131) + kc * 17) % 7 - 3).cast("double")


def lsh_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection bucket id: bit j set iff dot(vec, h_j)>=0."""
    bucket = F.lit(0)
    for j in range(n_planes):
        proj = F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda k: F.element_at(vec, k + 1).cast("double") * hyperplane_coef(j, k),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket.cast("bigint")


def ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only vectors in the query's LSH
    bucket. Recall < 1 by design; at scale, probe neighboring buckets
    or union multiple hash tables to trade compute for recall.
    """
    from pyspark.sql import Window

    # Bucketed vectors feed both the query and candidate sides;
    # materialize once instead of recomputing 8 projections per side.
    bucketed = vectors.withColumn(
        "bucket", lsh_bucket(F.col(vec_col), n_planes, dim)
    ).localCheckpoint(eager=False)
    q = bucketed.join(queries.select(id_col), id_col, "left_semi").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        squared_norm(F.col(vec_col)).alias("q_norm"),
        "bucket",
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        squared_norm(F.col(vec_col)).alias("c_norm"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm"))
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
