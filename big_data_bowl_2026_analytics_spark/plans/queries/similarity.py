"""Embedding similarity-search queries over the ``embeddings`` table.

Brute-force cosine top-k is the exact baseline; the LSH
(sign-random-projection) variants are the 100 TB scale path. All
vector math is a sequential fold in double on both engines, so even
the floating-point results agree bit-for-bit before the defensive
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators.similarity import ann_topk, brute_force_topk, lsh_bucket, squared_norm
from ...sources.readers import read_table
from ..registry import query

_DIM = 64

_NORMED_CTE = """
normed AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sqnorm
  FROM embeddings
)
"""

_DOT = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)


def _bucket_sql() -> str:
    terms = []
    for j in range(8):
        proj = (
            "list_sum(list_transform(generate_series(0, 63), "
            f"k -> CAST(embedding[k+1] AS DOUBLE) * ((({j * 131} + k*17) % 7) - 3)))"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {2**j} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "q40_cosine_topk_bruteforce",
    tags=("similarity", "topk"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm
  FROM normed WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q CROSS JOIN normed c
  WHERE c.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 5
""",
)
def q40_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for a query set: broadcast the
    queries, stream the corpus, keep per-query heaps. The exactness
    baseline every ANN variant is measured against."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=5)


@query(
    "q41_ann_lsh_buckets",
    tags=("similarity", "lsh"),
    oracle=f"""
SELECT vec_id, CAST({_bucket_sql()} AS BIGINT) AS bucket
FROM embeddings
""",
)
def q41_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection bucket per vector (8 deterministic
    integer hyperplanes -> 256 buckets): the partitioning key that
    makes ANN an equi-join instead of a cross join."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", lsh_bucket(F.col("embedding"), 8, _DIM).alias("bucket"))


@query(
    "q42_ann_topk_lsh",
    tags=("similarity", "ann"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
bucketed AS (
  SELECT vec_id, embedding, sqnorm, CAST({_bucket_sql()} AS BIGINT) AS bucket
  FROM normed
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm, bucket
  FROM bucketed WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
               / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q JOIN bucketed c ON q.bucket = c.bucket
  WHERE c.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
""",
)
def q42_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors restricted to the query's LSH
    bucket — the IVF-style scale path (probe more buckets / more hash
    tables to buy recall)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    return ann_topk(emb, queries, k=3, n_planes=8, dim=_DIM)


@query(
    "q43_embedding_stats",
    tags=("similarity", "agg"),
    oracle="""
SELECT label,
       count(*) AS n_vectors,
       round(avg(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) + 1e-9, 6)
         AS avg_sqnorm
FROM embeddings
GROUP BY label
""",
)
def q43_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector census (count + mean squared norm): the sanity
    pass before any similarity work — catches unnormalized or
    degenerate embedding batches."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(squared_norm(F.col("embedding"))) + 1e-9, 6).alias("avg_sqnorm"),
    )
