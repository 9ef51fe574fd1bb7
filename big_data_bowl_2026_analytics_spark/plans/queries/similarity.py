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
from pyspark.sql.window import Window

from ...functions.scalar import fround
from ...operators.similarity import (
    ann_topk,
    brute_force_topk,
    squared_norm,
    with_lsh_bucket,
)
from ...sources.readers import read_table
from ..registry import query
from ...core.session import local_frame

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


def _sums_cols_sql() -> str:
    """Select-list fragment binding the 7 residue-class sums
    S_r = Σ_{k ≡ r (mod 7)} embedding[k] — the exact mirror of
    operators/similarity.py::residue_sums (the hyperplane coefficient
    is periodic in k with period 7, so every plane's projection is a
    linear combination of these)."""
    return ", ".join(
        "list_sum(list_transform(generate_series("
        f"{r + 1}, 64, 7), i -> CAST(embedding[i] AS DOUBLE))) AS _lsh_s{r}"
        for r in range(7)
    )


def _bucket_sql(plane_offset: int = 0, n_planes: int = 8) -> str:
    """Bucket expression over bound _lsh_s0.._lsh_s6 columns, same
    left-associated combination order as bucket_from_sums;
    ``plane_offset``/``n_planes`` mirror the multi-table hyperplane
    families."""
    from ...operators.similarity import hyperplane_coef

    terms = []
    for j in range(n_planes):
        proj = " + ".join(
            f"{hyperplane_coef(j + plane_offset, r)} * _lsh_s{r}"
            for r in range(7)
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
WITH sums AS (
  SELECT vec_id, {_sums_cols_sql()} FROM embeddings
)
SELECT vec_id, CAST({_bucket_sql()} AS BIGINT) AS bucket
FROM sums
""",
)
def q41_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection bucket per vector (8 deterministic
    integer hyperplanes -> 256 buckets): the partitioning key that
    makes ANN an equi-join instead of a cross join. Projections are
    combined from 7 bound residue sums (see residue_sums) — 64 adds
    + 56 mul-adds per row instead of 512."""
    emb = read_table(spark, sf_dir, "embeddings")
    return with_lsh_bucket(emb, "embedding", 8, _DIM).select("vec_id", "bucket")


@query(
    "q42_ann_topk_lsh",
    tags=("similarity", "ann"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, {_sums_cols_sql()} FROM normed
),
bucketed AS (
  SELECT vec_id, embedding, sqnorm, CAST({_bucket_sql()} AS BIGINT) AS bucket
  FROM sums
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


def _sq_l2_sql(a: str, b: str) -> str:
    """DuckDB squared-L2 fold matching operators/ivf.py::sq_l2 bit-for-bit."""
    d = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return f"list_sum(list_transform(generate_series(1, 64), i -> {d} * {d}))"


_SEEDS_CTE = """
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) s
)
"""


@query(
    "q61_ivf_assignments",
    tags=("similarity", "ivf"),
    oracle=f"""
WITH {_SEEDS_CTE.strip()},
scored AS (
  SELECT e.vec_id, s.cluster_id,
         {_sq_l2_sql('e.embedding', 's.centroid')} AS dist
  FROM embeddings e CROSS JOIN seeds s
), ranked AS (
  SELECT vec_id, cluster_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
  FROM scored
)
SELECT vec_id, cluster_id FROM ranked WHERE rn = 1
""",
)
def q61_ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment: nearest of 8 deterministic seed centroids
    (lowest-id vectors) per corpus vector — the inverted-file
    partitioning key. Broadcast cross join + map-side-combined argmin;
    the learned-kmeans refinement of the same cells is exercised in
    tests (not SQL-expressible)."""
    from ...operators.ivf import assign_clusters, seed_centroids

    emb = read_table(spark, sf_dir, "embeddings")
    cents = seed_centroids(emb, 8)
    return assign_clusters(emb, cents).select("vec_id", "cluster_id")


@query(
    "q62_ivf_topk",
    tags=("similarity", "ivf", "ann"),
    oracle=f"""
WITH {_SEEDS_CTE.strip()},
normed AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sqnorm
  FROM embeddings
),
assigned AS (
  SELECT vec_id, embedding, sqnorm, cluster_id FROM (
    SELECT n.vec_id, n.embedding, n.sqnorm, s.cluster_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {_sq_l2_sql('n.embedding', 's.centroid')}, s.cluster_id
           ) AS rn
    FROM normed n CROSS JOIN seeds s
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, q_vec, q_norm, cluster_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS q_vec, q.sqnorm AS q_norm,
           s.cluster_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_sq_l2_sql('q.embedding', 's.centroid')}, s.cluster_id
           ) AS rn
    FROM (SELECT * FROM normed WHERE vec_id < 3) q CROSS JOIN seeds s
  ) WHERE rn <= 2
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(p.q_vec[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
               / (sqrt(p.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM probes p JOIN assigned c ON p.cluster_id = c.cluster_id
  WHERE c.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
""",
)
def q62_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN search: each query probes its 2 nearest of 8 cells
    and ranks candidates by exact cosine inside them — the second
    similarity scale path next to LSH (q42). The corpus is touched via
    a cluster_id equi-join only; nprobe trades compute for recall."""
    from ...operators.ivf import ivf_topk, seed_centroids

    emb = read_table(spark, sf_dir, "embeddings")
    cents = seed_centroids(emb, 8)
    queries = emb.where(F.col("vec_id") < 3)
    return ivf_topk(emb, queries, cents, k=3, nprobe=2)


@query(
    "q63_embedding_neardup",
    tags=("dedup", "similarity", "lsh"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, {_sums_cols_sql()} FROM normed
),
bucketed AS (
  SELECT vec_id, embedding, sqnorm, CAST({_bucket_sql()} AS BIGINT) AS bucket
  FROM sums
)
SELECT a_id, b_id, cosine FROM (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         round(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
               / (sqrt(a.sqnorm) * sqrt(b.sqnorm)) + 1e-9, 6) AS cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cosine >= 0.2
""",
)
def q63_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member
    of the dedup family (exact q30, MinHash q31/q32, SimHash q34,
    Jaccard q33): LSH-bucketed candidate generation turns the O(N^2)
    all-pairs cosine into a per-bucket self-join, then an exact cosine
    threshold keeps real near-dups. At scale, recall is bought with
    more hash tables, not a wider join."""
    from ...operators.similarity import cosine as _cosine

    emb = read_table(spark, sf_dir, "embeddings")
    bucketed = with_lsh_bucket(
        emb.select(
            "vec_id", "embedding", squared_norm(F.col("embedding")).alias("sqnorm")
        ),
        "embedding",
        8,
        _DIM,
    ).localCheckpoint(eager=False)
    a = bucketed.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_vec"),
        F.col("sqnorm").alias("a_norm"),
        "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_vec"),
        F.col("sqnorm").alias("b_norm"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cosine",
            F.round(
                _cosine(
                    F.col("a_vec"), F.col("b_vec"), F.col("a_norm"), F.col("b_norm")
                )
                + 1e-9,
                6,
            ),
        )
        .where(F.col("cosine") >= 0.2)
        .select("a_id", "b_id", "cosine")
    )


@query(
    "q140_ann_topk_multitable",
    tags=("similarity", "ann", "multitable"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, {_sums_cols_sql()} FROM normed
),
bucketed AS (
  SELECT vec_id, embedding, sqnorm,
         CAST({_bucket_sql(0)} AS BIGINT) AS bucket0,
         CAST({_bucket_sql(8)} AS BIGINT) AS bucket1
  FROM sums
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm,
         bucket0, bucket1
  FROM bucketed WHERE vec_id < 3
), s0 AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q JOIN bucketed c ON q.bucket0 = c.bucket0
  WHERE c.vec_id != q.query_id
), s1 AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q JOIN bucketed c ON q.bucket1 = c.bucket1
  WHERE c.vec_id != q.query_id
), dedup AS (
  SELECT query_id, neighbor_id, max(cosine) AS cosine
  FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1)
  GROUP BY query_id, neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM dedup
)
SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
""",
)
def q140_ann_topk_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 with TWO independent LSH hash tables unioned
    — the recall upgrade q42's docstring defers to: a true neighbor is
    missed only if every table separates it from the query, so recall
    improves geometrically per table while the probe cost grows
    linearly. Both tables share one residue-sum projection (the index
    carries one extra integer column, not a second signature pass);
    candidates are deduped by (query, neighbor) before a single
    ranking. Recall >= the single-table q42 by construction — asserted
    against the q40 exact baseline in tests/test_similarity_ops.py."""
    from ...operators.similarity import ann_topk_multitable

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    return ann_topk_multitable(emb, queries, k=3, n_tables=2, n_planes=8, dim=_DIM)


@query(
    "q142_ann_recall_audit",
    tags=("similarity", "ann", "audit"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, {_sums_cols_sql()} FROM normed
),
bucketed AS (
  SELECT vec_id, embedding, sqnorm,
         CAST({_bucket_sql(0, 4)} AS BIGINT) AS bucket0,
         CAST({_bucket_sql(4, 4)} AS BIGINT) AS bucket1
  FROM sums
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm,
         bucket0, bucket1
  FROM bucketed WHERE vec_id < 3
), exact_scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q CROSS JOIN bucketed c
  WHERE c.vec_id != q.query_id
), exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM exact_scored
  ) WHERE rank <= 3
), s0 AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q JOIN bucketed c ON q.bucket0 = c.bucket0
  WHERE c.vec_id != q.query_id
), s1 AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q JOIN bucketed c ON q.bucket1 = c.bucket1
  WHERE c.vec_id != q.query_id
), single_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM s0
  ) WHERE rank <= 3
), multi_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM (
      SELECT query_id, neighbor_id, max(cosine) AS cosine
      FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1)
      GROUP BY query_id, neighbor_id
    )
  ) WHERE rank <= 3
), hits AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact_top) AS n_truth,
         (SELECT CAST(count(*) AS BIGINT)
          FROM single_top JOIN exact_top USING (query_id, neighbor_id))
           AS single_hits,
         (SELECT CAST(count(*) AS BIGINT)
          FROM multi_top JOIN exact_top USING (query_id, neighbor_id))
           AS multi_hits
)
SELECT n_truth, single_hits, multi_hits,
       round(CAST(single_hits AS DOUBLE) / n_truth + 1e-9, 6)
         AS recall_single,
       round(CAST(multi_hits AS DOUBLE) / n_truth + 1e-9, 6)
         AS recall_multi
FROM hits
""",
)
def q142_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@3 of single-table and two-table LSH ANN
    against the exact baseline (q40 semantics) in ONE audited row,
    at a 4-plane (16-bucket) setting where the synthetic corpus
    yields non-trivial recall (8 planes shatter random vectors)
    — sketches and approximate indexes at 100 TB need their error
    MEASURED, not assumed (q44/q111/q121/q132 pattern, now for ANN
    recall). recall_multi >= recall_single by construction; the driver
    sees the numbers, not just a test assertion.

    All three pipelines reuse the same residue-sum index frame; hit
    counting is an integer join-count; the two ratios are integer
    quotients under the fround pair."""
    from ...operators.similarity import (
        ann_topk,
        ann_topk_multitable,
        brute_force_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    queries = emb.where(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, queries, k=3).select("query_id", "neighbor_id")
    single = ann_topk(emb, queries, k=3, n_planes=4, dim=_DIM).select(
        "query_id", "neighbor_id"
    )
    multi = ann_topk_multitable(
        emb, queries, k=3, n_tables=2, n_planes=4, dim=_DIM
    ).select("query_id", "neighbor_id")
    n_truth = exact.agg(F.count(F.lit(1)).alias("n_truth"))
    sh = single.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("single_hits")
    )
    mh = multi.join(exact, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("multi_hits")
    )
    return (
        n_truth.crossJoin(F.broadcast(sh))
        .crossJoin(F.broadcast(mh))
        .select(
            "n_truth",
            "single_hits",
            "multi_hits",
            fround(
                F.col("single_hits").cast("double") / F.col("n_truth"), 6
            ).alias("recall_single"),
            fround(
                F.col("multi_hits").cast("double") / F.col("n_truth"), 6
            ).alias("recall_multi"),
        )
    )


@query(
    "q143_int8_quantization_audit",
    tags=("similarity", "quantization", "audit"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
quant AS (
  SELECT vec_id, embedding, sqnorm,
         list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
  FROM normed
), deq AS (
  SELECT vec_id, embedding, sqnorm, scale,
         list_transform(embedding, x -> CASE WHEN scale = 0 THEN CAST(0 AS INTEGER)
           WHEN CAST(x AS DOUBLE) / scale >= 0
             THEN CAST(floor(CAST(x AS DOUBLE) / scale) AS INTEGER)
           ELSE CAST(ceil(CAST(x AS DOUBLE) / scale) AS INTEGER) END) AS qvec
  FROM quant
), recon AS (
  SELECT vec_id, embedding, sqnorm,
         list_transform(qvec, q -> CAST(q AS DOUBLE) * scale) AS dvec,
         list_sum(list_transform(qvec,
           q -> (CAST(q AS DOUBLE) * scale) * (CAST(q AS DOUBLE) * scale)))
           AS dnorm
  FROM deq
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm
  FROM recon WHERE vec_id < 3
), pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) AS cos_full,
         list_sum(list_transform(generate_series(1, 64),
             i -> CAST(q.q_vec[i] AS DOUBLE) * c.dvec[i]))
           / (sqrt(q.q_norm) * sqrt(c.dnorm)) AS cos_q
  FROM q JOIN recon c ON c.vec_id != q.query_id
  WHERE c.dnorm > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(abs(cos_q - cos_full)) + 1e-9, 6) AS mean_abs_err,
       round(max(abs(cos_q - cos_full)) + 1e-9, 6) AS max_abs_err
FROM pairs
""",
)
def q143_int8_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine distortion of int8-quantized vectors (full-precision
    query side vs int8-reconstructed corpus side) — the measurement
    that justifies shipping a 4x-smaller hot index at 100 TB: mean and
    worst-case |cos_int8 - cos_full| over every query-corpus pair.
    Quantize/dequantize is operators/similarity.py::int8_quantize
    (trunc spelled floor/ceil so Spark's truncating int cast and
    DuckDB's rounding CAST cannot diverge); both cosines are the
    bit-identical sequential fold; only the error aggregates are
    rounded."""
    from pyspark.sql import Column

    from ...operators.similarity import dequantized, dot, int8_quantize

    emb = read_table(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    quant = int8_quantize(emb)
    recon = (
        emb.join(quant, "vec_id")
        .select(
            "vec_id",
            "embedding",
            squared_norm(F.col("embedding")).alias("sqnorm"),
            dequantized(F.col("qvec"), F.col("scale")).alias("dvec"),
        )
        .withColumn("dnorm", dot(F.col("dvec"), F.col("dvec")))
        # r13 optimization: recon feeds BOTH the broadcast query side
        # and the corpus side — without lineage truncation the whole
        # quantize/dequantize subtree executes twice (guide §1.2).
        .localCheckpoint(eager=False)
    )
    q = recon.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("sqnorm").alias("q_norm"),
    )
    pairs = (
        recon.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        )
        .where(F.col("dnorm") > 0)
        .select(
            (
                dot(F.col("q_vec"), F.col("embedding"))
                / (F.sqrt(F.col("q_norm")) * F.sqrt(F.col("sqnorm")))
            ).alias("cos_full"),
            (
                dot(F.col("q_vec"), F.col("dvec"))
                / (F.sqrt(F.col("q_norm")) * F.sqrt(F.col("dnorm")))
            ).alias("cos_q"),
        )
    )
    err = F.abs(F.col("cos_q") - F.col("cos_full"))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        fround(F.avg(err), 6).alias("mean_abs_err"),
        fround(F.max(err), 6).alias("max_abs_err"),
    )


@query(
    "q156_reciprocal_rank_fusion",
    tags=("similarity", "fusion", "retrieval"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm
  FROM normed WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine,
         round(q.q_norm + c.sqnorm - 2 * {_DOT} + 1e-9, 6) AS l2sq
  FROM q CROSS JOIN normed c
  WHERE c.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine, l2sq,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS r_cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY l2sq, neighbor_id) AS r_l2
  FROM scored
), fused AS (
  SELECT query_id, neighbor_id, r_cos, r_l2,
         round(1.0 / (60 + r_cos) + 1.0 / (60 + r_l2) + 1e-9, 6) AS rrf_score
  FROM ranked
), top AS (
  SELECT query_id, neighbor_id, r_cos, r_l2, rrf_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, neighbor_id) AS rank
  FROM fused
)
SELECT query_id, neighbor_id, rank, r_cos, r_l2, rrf_score
FROM top WHERE rank <= 5
""",
)
def q156_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrievers
    over the same corpus — cosine similarity and euclidean distance
    rank candidates differently when vector norms vary, and
    RRF = sum 1/(60 + rank_i) merges the lists without score
    calibration. The standard way a retrieval pipeline combines dense,
    sparse, and metadata rankers.

    Engine-exactness: both ranks order by ROUNDED scores with an id
    tie-break (the q40 pattern), and the fused score is arithmetic on
    small integers (two IEEE divisions in fixed order) — identical
    bits before the defensive round.

    Scale: queries broadcast against the corpus; each ranker is a
    per-query window (local top lists), the fusion is column math on
    ranks — no extra scan, no corpus-sized shuffle beyond the scoring
    pass the retrievers already pay.
    """
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        "vec_id", "embedding", squared_norm(F.col("embedding")).alias("sqnorm")
    )
    q = normed.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("sqnorm").alias("q_norm"),
    )
    d = F.zip_with(
        F.col("q_vec"),
        F.col("embedding"),
        lambda x, y: x.cast("double") * y.cast("double"),
    )
    dot_col = F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)
    scored = (
        F.broadcast(q)
        .crossJoin(normed)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            fround(
                dot_col / (F.sqrt("q_norm") * F.sqrt("sqnorm")), 6
            ).alias("cosine"),
            fround(
                F.col("q_norm") + F.col("sqnorm") - 2 * dot_col, 6
            ).alias("l2sq"),
        )
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine"), "neighbor_id"
            )
        )
        .alias("r_cos"),
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy("l2sq", "neighbor_id")
        )
        .alias("r_l2"),
    )
    fused = ranked.select(
        "query_id",
        "neighbor_id",
        "r_cos",
        "r_l2",
        fround(
            F.lit(1.0) / (F.lit(60) + F.col("r_cos"))
            + F.lit(1.0) / (F.lit(60) + F.col("r_l2")),
            6,
        ).alias("rrf_score"),
    )
    top = fused.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("rrf_score"), "neighbor_id"
            )
        ),
    )
    return top.where(F.col("rank") <= 5).select(
        "query_id", "neighbor_id", "rank", "r_cos", "r_l2", "rrf_score"
    )


@query(
    "q157_diversity_capped_topk",
    tags=("similarity", "retrieval", "diversity"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, {_sums_cols_sql()} FROM normed
), bucketed AS (
  SELECT vec_id, embedding, sqnorm,
         CAST({_bucket_sql()} AS BIGINT) AS bucket
  FROM sums
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm
  FROM normed WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.bucket,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM q CROSS JOIN bucketed c
  WHERE c.vec_id != q.query_id
), in_bucket AS (
  SELECT query_id, neighbor_id, bucket, cosine,
         row_number() OVER (PARTITION BY query_id, bucket
                            ORDER BY cosine DESC, neighbor_id) AS bucket_rank
  FROM scored
), capped AS (
  SELECT query_id, neighbor_id, bucket, bucket_rank, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM in_bucket WHERE bucket_rank <= 2
)
SELECT query_id, neighbor_id, bucket, bucket_rank, rank, cosine
FROM capped WHERE rank <= 5
""",
)
def q157_diversity_capped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped retrieval: exact cosine top-5 subject to "at
    most 2 results per LSH bucket" — the cheap, deterministic stand-in
    for MMR-style re-ranking (greedy MMR is sequential; a per-cluster
    cap is two stacked windows and gives the same "don't return five
    copies of the same neighborhood" effect at any scale).

    Scale: the cap prunes WITHIN each (query, bucket) partition before
    the global per-query rank, so the second window sees at most
    2 x n_buckets rows per query. Composes with the ANN index (q42):
    at 100 TB the scored set comes from bucket probes, not the cross
    join the toy corpus affords.
    """
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    bucketed = with_lsh_bucket(emb, "embedding", 8, _DIM).select(
        "vec_id",
        "embedding",
        squared_norm(F.col("embedding")).alias("sqnorm"),
        "bucket",
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        squared_norm(F.col("embedding")).alias("q_norm"),
    )
    d = F.zip_with(
        F.col("q_vec"),
        F.col("embedding"),
        lambda x, y: x.cast("double") * y.cast("double"),
    )
    dot_col = F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)
    scored = (
        F.broadcast(q)
        .crossJoin(bucketed)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            fround(
                dot_col / (F.sqrt("q_norm") * F.sqrt("sqnorm")), 6
            ).alias("cosine"),
        )
    )
    in_bucket = scored.withColumn(
        "bucket_rank",
        F.row_number().over(
            Window.partitionBy("query_id", "bucket").orderBy(
                F.desc("cosine"), "neighbor_id"
            )
        ),
    )
    capped = in_bucket.where(F.col("bucket_rank") <= 2).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine"), "neighbor_id"
            )
        ),
    )
    return capped.where(F.col("rank") <= 5).select(
        "query_id", "neighbor_id", "bucket", "bucket_rank", "rank", "cosine"
    )


@query(
    "q161_label_centroid_separation",
    tags=("similarity", "clustering", "audit"),
    oracle="""
WITH comp AS (
  SELECT label, d.i AS i,
         round(avg(CAST(embedding[d.i] AS DOUBLE)) + 1e-9, 6) AS c
  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d
  GROUP BY label, d.i
), sizes AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label
), pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(a.c * b.c) AS dot,
         sum(a.c * a.c) AS na,
         sum(b.c * b.c) AS nb
  FROM comp a JOIN comp b ON a.i = b.i AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT label_a, label_b, sa.n AS n_a, sb.n AS n_b,
       round(dot / (sqrt(na) * sqrt(nb)) + 1e-9, 6) AS centroid_cosine
FROM pairs
JOIN sizes sa ON sa.label = label_a
JOIN sizes sb ON sb.label = label_b
""",
)
def q161_label_centroid_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids — the
    cluster-separation audit run after any labeling / clustering pass
    (centroids near cosine 1 mean the labels don't separate in
    embedding space and a classifier trained on them will struggle).

    Engine-exactness: centroid components are ROUNDED to 6 decimals
    first (absorbing the label-group float-sum association order), so
    the pairwise dot products consume engine-identical inputs; the
    final cosine gets the defensive round.

    Scale: one explode to (label, dim) cells — the centroid frame is
    |labels| x 64 rows no matter the corpus size — and the pairwise
    join runs on centroids, never on vectors.
    """
    emb = read_table(spark, sf_dir, "embeddings", ["label", "embedding"])
    comp = (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        )
        .groupBy("label", (F.col("pos") + 1).alias("i"))
        .agg(fround(F.avg(F.col("x").cast("double")), 6).alias("c"))
    )
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    a = comp.select(
        F.col("label").alias("label_a"), "i", F.col("c").alias("ca")
    )
    b = comp.select(
        F.col("label").alias("label_b"), "i", F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, "i")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sum(F.col("ca") * F.col("ca")).alias("na"),
            F.sum(F.col("cb") * F.col("cb")).alias("nb"),
        )
    )
    sa = sizes.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "label_a")
        .join(F.broadcast(sb), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            fround(
                F.col("dot") / (F.sqrt("na") * F.sqrt("nb")), 6
            ).alias("centroid_cosine"),
        )
    )


@query(
    "q168_ivf_balance_audit",
    tags=("similarity", "ivf", "audit"),
    oracle=f"""
WITH {_SEEDS_CTE.strip()},
scored AS (
  SELECT e.vec_id, s.cluster_id,
         {_sq_l2_sql('e.embedding', 's.centroid')} AS dist
  FROM embeddings e CROSS JOIN seeds s
), assigned AS (
  SELECT vec_id, cluster_id, dist FROM (
    SELECT vec_id, cluster_id, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster_id) AS rn
    FROM scored) WHERE rn = 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM embeddings
)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_vectors,
       round(count(*) * 8.0 / n_total + 1e-9, 6) AS balance_factor,
       round(sum(dist) + 1e-9, 6) AS inertia,
       round(sum(dist) / count(*) + 1e-9, 6) AS avg_sq_dist
FROM assigned, tot GROUP BY cluster_id, n_total
""",
)
def q168_ivf_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-health audit over the q61 seed partitioning: per-cell
    population, balance factor (n·k / N — 1.0 is perfectly even; a
    hot cell breaks probe-cost assumptions), and inertia (within-cell
    squared distance — the k-means objective). The numbers that
    decide when to re-train centroids or split a cell.

    Scale: centroids broadcast; the per-vector argmin partially
    aggregates map-side (one row per vector before its shuffle); cell
    statistics reduce the assignment frame to k rows. Distances are
    the bit-identical sequential fold; their per-cell sum order is
    absorbed by the round.
    """
    from ...operators.ivf import seed_centroids, sq_l2

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = seed_centroids(emb, 8)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cluster_id",
        sq_l2(F.col("embedding"), F.col("centroid")).alias("dist"),
    )
    per_vec = scored.groupBy("vec_id").agg(
        F.min_by(
            F.col("cluster_id"), F.struct(F.col("dist"), F.col("cluster_id"))
        ).alias("cluster_id"),
        F.min("dist").alias("dist"),
    )
    tot = emb.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        per_vec.crossJoin(F.broadcast(tot))
        .groupBy("cluster_id", "n_total")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            fround(F.count(F.lit(1)) * 8.0 / F.col("n_total"), 6).alias(
                "balance_factor"
            ),
            fround(F.sum("dist"), 6).alias("inertia"),
            fround(F.sum("dist") / F.count(F.lit(1)), 6).alias("avg_sq_dist"),
        )
        .drop("n_total")
        .select(
            "cluster_id", "n_vectors", "balance_factor", "inertia", "avg_sq_dist"
        )
    )


@query(
    "q169_embedding_quality_audit",
    tags=("similarity", "audit", "quality"),
    oracle="""
WITH normed AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
         len(embedding) AS dim
  FROM embeddings
)
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(*) FILTER (WHERE dim != 64) AS BIGINT) AS n_bad_dim,
       CAST(count(*) FILTER (WHERE nrm = 0) AS BIGINT) AS n_zero_norm,
       CAST(count(*) FILTER (WHERE isnan(nrm) OR isinf(nrm)) AS BIGINT)
         AS n_nonfinite,
       round(min(nrm) + 1e-9, 6) AS min_norm,
       round(quantile_cont(nrm, 0.5) + 1e-9, 6) AS p50_norm,
       round(max(nrm) + 1e-9, 6) AS max_norm
FROM normed
""",
)
def q169_embedding_quality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vector-column hygiene gate before any index build: dimension
    violations, zero vectors (cosine undefined — they poison
    normalized search), non-finite norms (one NaN component spreads
    through every dot product), and the norm distribution (a
    collapsed or bimodal norm profile usually means a broken encoder
    batch).

    Scale: pure map-side fold per vector plus one global aggregate;
    norms are the bit-identical sequential fold, so even min/max need
    no tolerance (rounded defensively; the median uses the q58
    percentile parity).
    """
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    normed = emb.select(
        F.sqrt(squared_norm(F.col("embedding"))).alias("nrm"),
        F.size("embedding").alias("dim"),
    )
    return normed.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.count_if(F.col("dim") != 64).alias("n_bad_dim"),
        F.count_if(F.col("nrm") == 0).alias("n_zero_norm"),
        F.count_if(
            F.isnan("nrm") | (F.col("nrm") == F.lit(float("inf")))
        ).alias("n_nonfinite"),
        fround(F.min("nrm"), 6).alias("min_norm"),
        fround(F.expr("percentile(nrm, 0.5)"), 6).alias("p50_norm"),
        fround(F.max("nrm"), 6).alias("max_norm"),
    )


@query(
    "q189_ndcg_retrieval_audit",
    tags=("similarity", "retrieval", "audit"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, {_sums_cols_sql()} FROM normed
), bucketed AS (
  SELECT vec_id, embedding, sqnorm,
         CAST({_bucket_sql()} AS BIGINT) AS bucket
  FROM sums
), q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm
  FROM normed WHERE vec_id < 5
), qb AS (
  SELECT b.vec_id AS query_id, b.embedding AS q_vec, b.sqnorm AS q_norm,
         b.bucket
  FROM bucketed b WHERE b.vec_id < 5
), exact AS (
  SELECT query_id, neighbor_id, rel FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm))
                      + 1e-9, 6) DESC, c.vec_id) AS r_e
    FROM q CROSS JOIN normed c WHERE c.vec_id != q.query_id
  ) t, LATERAL (SELECT CASE WHEN r_e <= 1 THEN 3 WHEN r_e <= 3 THEN 2
                             WHEN r_e <= 10 THEN 1 ELSE 0 END AS rel) r
), retrieved AS (
  SELECT query_id, neighbor_id, pos FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round({_DOT.replace('q.q_vec', 'q.q_vec')} /
                            (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6)
                      DESC, c.vec_id) AS pos
    FROM qb q JOIN bucketed c
      ON c.bucket = q.bucket AND c.vec_id != q.query_id
  ) WHERE pos <= 5
), dcg AS (
  SELECT r.query_id,
         CAST(count(*) AS BIGINT) AS n_retrieved,
         sum((pow(2, e.rel) - 1) / log2(r.pos + 1)) AS dcg
  FROM retrieved r JOIN exact e
    ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
  GROUP BY r.query_id
), idcg AS (
  SELECT query_id,
         sum((pow(2, rel) - 1) / log2(ideal_pos + 1)) AS idcg
  FROM (
    SELECT query_id, rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, neighbor_id) AS ideal_pos
    FROM exact
  ) WHERE ideal_pos <= 5
  GROUP BY query_id
)
SELECT d.query_id, d.n_retrieved,
       round(d.dcg + 1e-9, 6) AS dcg,
       round(i.idcg + 1e-9, 6) AS idcg,
       round(d.dcg / i.idcg + 1e-9, 6) AS ndcg
FROM dcg d JOIN idcg i ON d.query_id = i.query_id
""",
)
def q189_ndcg_retrieval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the LSH bucket-restricted retrieval against exact-
    cosine relevance grades — the GRADED retrieval-quality metric
    next to q142's binary recall: recall says whether true neighbors
    were found at all, NDCG says whether the best ones surface at the
    top (graded 3/2/1/0 by exact rank ≤1 / ≤3 / ≤10 / beyond).

    Engine-exactness: both rankings order by ROUNDED cosines with id
    tie-breaks, grades are integer CASE on integer ranks, and the
    DCG log2 arithmetic is fixed-order over ≤5 terms per query
    (rounded defensively).

    Scale: the exact ranking exists only to GRADE (at 100 TB the
    grades come from a labeled eval set); the retrieval side is the
    production bucket probe. Both are per-query windows over a
    broadcast query set.
    """
    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    bucketed = with_lsh_bucket(emb, "embedding", 8, _DIM).select(
        "vec_id",
        "embedding",
        squared_norm(F.col("embedding")).alias("sqnorm"),
        "bucket",
    ).localCheckpoint(eager=False)
    normed = emb.select(
        "vec_id", "embedding", squared_norm(F.col("embedding")).alias("sqnorm")
    )
    q = normed.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("sqnorm").alias("q_norm"),
    )
    d = F.zip_with(
        F.col("q_vec"),
        F.col("embedding"),
        lambda x, y: x.cast("double") * y.cast("double"),
    )
    dot_col = F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)
    cos = fround(dot_col / (F.sqrt("q_norm") * F.sqrt("sqnorm")), 6)
    exact = (
        F.broadcast(q)
        .crossJoin(normed)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("c")
        )
        .withColumn(
            "r_e",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("c"), "neighbor_id"
                )
            ),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.when(F.col("r_e") <= 1, 3)
            .when(F.col("r_e") <= 3, 2)
            .when(F.col("r_e") <= 10, 1)
            .otherwise(0)
            .alias("rel"),
        )
        .localCheckpoint(eager=False)
    )
    qb = bucketed.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("sqnorm").alias("q_norm"),
        "bucket",
    )
    retrieved = (
        F.broadcast(qb)
        .join(
            bucketed.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding"),
                F.col("sqnorm"),
                "bucket",
            ),
            "bucket",
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("c"))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("c"), "neighbor_id"
                )
            ),
        )
        .where(F.col("pos") <= 5)
    )
    dcg = (
        retrieved.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_retrieved"),
            F.sum(
                (F.pow(2, F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
            ).alias("dcg"),
        )
    )
    idcg = (
        exact.withColumn(
            "ideal_pos",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("rel"), "neighbor_id"
                )
            ),
        )
        .where(F.col("ideal_pos") <= 5)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(2, F.col("rel")) - 1) / F.log2(F.col("ideal_pos") + 1)
            ).alias("idcg")
        )
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        "n_retrieved",
        fround(F.col("dcg"), 6).alias("dcg"),
        fround(F.col("idcg"), 6).alias("idcg"),
        fround(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


def _jl_signs(out_dims: int = 16, in_dims: int = 64) -> list[list[float]]:
    """Deterministic ±1 sign matrix for the JL sketch — one md5 bit
    per (out, in) cell, inlined as LITERALS into both the Spark
    expression tree and the oracle SQL (seedless and engine-exact by
    construction; the q149 keyed-hash determinism convention)."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"jl|{j}|{i}".encode()).digest()[0] & 1
            else -1.0
            for i in range(in_dims)
        ]
        for j in range(out_dims)
    ]


_JL_SIGNS = _jl_signs()


def _jl_oracle() -> str:
    proj_cols = ",\n         ".join(
        "list_sum(list_transform(generate_series(1, 64), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ([{', '.join(str(s) for s in _JL_SIGNS[j])}])[i]"
        f")) / 4.0 AS y{j}"
        for j in range(16)
    )
    proj_d2 = " + ".join(
        f"(a.y{j} - b.y{j}) * (a.y{j} - b.y{j})" for j in range(16)
    )
    return f"""
WITH proj AS MATERIALIZED (
  SELECT vec_id, embedding,
         {proj_cols}
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(generate_series(1, 64),
           i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
              * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
         )) AS orig_d2,
         {proj_d2} AS proj_d2
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
)
SELECT vec_a, vec_b,
       round(orig_d2 + 1e-9, 6) AS orig_d2,
       round(proj_d2 + 1e-9, 6) AS proj_d2,
       round(proj_d2 / orig_d2 + 1e-9, 6) AS distortion,
       abs(round(proj_d2 / orig_d2 + 1e-9, 6) - 1.0) <= 0.5 AS within_half
FROM pairs
WHERE orig_d2 > 0
"""


@query(
    "q242_jl_projection_distortion",
    tags=("similarity", "dimensionality", "audit"),
    oracle=_jl_oracle(),
)
def q242_jl_projection_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson-Lindenstrauss sketch audit: project 64-dim embeddings
    to 16 dims with a deterministic ±1 sign matrix (scaled 1/√16 = an
    exact power of two, so the scaling adds no rounding drift) and
    measure per-pair squared-distance distortion on the consecutive-id
    pair chain — the empirical check that a cheap sketch preserves
    geometry before the ANN stack (q40-q42) is pointed at the reduced
    vectors. ``within_half`` compares the ROUNDED distortion (q228
    rule: booleans derived from floats threshold rounded magnitudes).

    Scale: the projection is 16 sequential folds per row, map-side
    only (the JIT-cliff note in operators/similarity.py::dot is why
    the fold is NOT unrolled); the pair chain is an equi-join on
    vec_id + 1 (shuffle on the id, no cross join); per-pair output is
    corpus-linear. The projected frame feeds both sides of the pair
    join, so it truncates lineage.
    """
    from ...operators.similarity import dot

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    proj = emb.select(
        "vec_id",
        "embedding",
        *[
            (
                dot(
                    F.col("embedding"),
                    F.array(*[F.lit(s) for s in _JL_SIGNS[j]]),
                )
                / 4.0
            ).alias(f"y{j}")
            for j in range(16)
        ],
    ).localCheckpoint(eager=False)  # both sides of the pair join
    a = proj.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        *[F.col(f"y{j}").alias(f"ya{j}") for j in range(16)],
    )
    b = proj.select(
        (F.col("vec_id") - 1).alias("vec_a"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        *[F.col(f"y{j}").alias(f"yb{j}") for j in range(16)],
    )
    diffs = F.zip_with(
        F.col("emb_a"),
        F.col("emb_b"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    orig_d2 = F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)
    proj_d2 = (F.col("ya0") - F.col("yb0")) * (F.col("ya0") - F.col("yb0"))
    for j in range(1, 16):
        proj_d2 = proj_d2 + (F.col(f"ya{j}") - F.col(f"yb{j}")) * (
            F.col(f"ya{j}") - F.col(f"yb{j}")
        )
    pairs = a.join(b, "vec_a").select(
        "vec_a", "vec_b", orig_d2.alias("orig_d2"), proj_d2.alias("proj_d2")
    )
    ratio = fround(F.col("proj_d2") / F.col("orig_d2"), 6)
    return pairs.where(F.col("orig_d2") > 0).select(
        "vec_a",
        "vec_b",
        fround(F.col("orig_d2"), 6).alias("orig_d2"),
        fround(F.col("proj_d2"), 6).alias("proj_d2"),
        ratio.alias("distortion"),
        (F.abs(ratio - 1.0) <= 0.5).alias("within_half"),
    )


def _pq_oracle() -> str:
    d16 = (
        "list_sum(list_transform(generate_series(1, 16), "
        "i -> (CAST(v.v[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))"
        " * (CAST(v.v[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))))"
    )
    return f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) s
), subs AS (
  SELECT unnest([0, 1, 2, 3]) AS sub
), subseeds AS MATERIALIZED (
  SELECT cid, sub,
         embedding[(1 + 16 * sub):(16 * sub + 16)] AS cvec
  FROM seeds CROSS JOIN subs
), subvecs AS (
  SELECT vec_id, sub,
         embedding[(1 + 16 * sub):(16 * sub + 16)] AS v
  FROM embeddings CROSS JOIN subs
), scored AS (
  SELECT v.vec_id, v.sub, c.cid, {d16} AS dist
  FROM subvecs v JOIN subseeds c ON v.sub = c.sub
), ranked AS (
  SELECT vec_id, sub, cid, dist,
         row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY dist, cid
         ) AS rk
  FROM scored
)
SELECT vec_id,
       CAST(sum(cid * (CASE sub WHEN 0 THEN 1 WHEN 1 THEN 8
                       WHEN 2 THEN 64 ELSE 512 END)) AS BIGINT) AS pq_code,
       round(sum(dist) + 1e-9, 6) AS recon_err
FROM ranked WHERE rk = 1
GROUP BY vec_id
"""


@query(
    "q250_product_quantization",
    tags=("similarity", "quantization", "ann"),
    oracle=_pq_oracle(),
)
def q250_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: split each 64-dim vector into 4
    sub-vectors of 16 dims, assign each to its nearest of 8 per-
    subspace codebook entries (the q61 deterministic seed convention —
    the oracle checks the ASSIGNMENT algebra; production refines
    codebooks with the distributed Lloyd's in operators/ivf.py), and
    pack the four 3-bit codes into one 12-bit ``pq_code`` — 256 bytes
    of float32 compressed to 1.5 bytes, the memory trick that lets a
    1000-executor ANN fleet hold a 100 TB corpus's vectors in RAM
    (Jégou et al.; complements q143's int8 scalar quantization with a
    per-vector reconstruction error the re-ranker budget reads).

    Scale: the codebook is 32 rows broadcast into an equi-join on the
    subspace key; per-vector work is O(4 x 8 x 16) folds, map-side;
    argmin ties break on the code id (footgun 3); the pack/error
    reduce is one groupBy(vec_id). Distances are the proven q40-class
    sequential folds — bit-identical before the defensive round.
    """
    from ...operators.similarity import pq_best_codes, pq_subspace_frames

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    emb = emb.localCheckpoint(eager=False)  # seeds + assignment branches
    subseeds, subvecs = pq_subspace_frames(emb)
    best = pq_best_codes(subvecs, subseeds)
    weight = (
        F.when(F.col("sub") == 0, 1)
        .when(F.col("sub") == 1, 8)
        .when(F.col("sub") == 2, 64)
        .otherwise(512)
    )
    return best.groupBy("vec_id").agg(
        F.sum(F.col("cid") * weight).cast("bigint").alias("pq_code"),
        fround(F.sum("dist"), 6).alias("recon_err"),
    )


def _adc_oracle() -> str:
    d16 = (
        "list_sum(list_transform(generate_series(1, 16), "
        "i -> (CAST(q.v[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))"
        " * (CAST(q.v[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))))"
    )
    d64 = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> (CAST(q.embedding[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))"
        " * (CAST(q.embedding[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))))"
    )
    return f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) s
), subs AS (
  SELECT unnest([0, 1, 2, 3]) AS sub
), subseeds AS MATERIALIZED (
  SELECT cid, sub, embedding[(1 + 16 * sub):(16 * sub + 16)] AS cvec
  FROM seeds CROSS JOIN subs
), subvecs AS MATERIALIZED (
  SELECT vec_id, sub, embedding[(1 + 16 * sub):(16 * sub + 16)] AS v
  FROM embeddings CROSS JOIN subs
), codes AS MATERIALIZED (
  SELECT vec_id, sub, cid FROM (
    SELECT q.vec_id, q.sub, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id, q.sub ORDER BY {d16}, c.cid
           ) AS rk
    FROM subvecs q JOIN subseeds c ON q.sub = c.sub
  ) WHERE rk = 1
), dtable AS MATERIALIZED (
  SELECT q.vec_id AS query_id, q.sub, c.cid, {d16} AS qdist
  FROM subvecs q JOIN subseeds c ON q.sub = c.sub
  WHERE q.vec_id < 3
), adc AS (
  SELECT t.query_id, d.vec_id, sum(t.qdist) AS approx_d2
  FROM codes d JOIN dtable t ON d.sub = t.sub AND d.cid = t.cid
  WHERE d.vec_id != t.query_id
  GROUP BY t.query_id, d.vec_id
), approx AS (
  SELECT query_id, vec_id,
         round(approx_d2 + 1e-9, 6) AS approx_d2,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(approx_d2 + 1e-9, 6), vec_id
         ) AS rk
  FROM adc
), exact AS (
  SELECT q.vec_id AS query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round({d64} + 1e-9, 6), e.vec_id
         ) AS xrk
  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
  WHERE q.vec_id < 3
)
SELECT a.query_id, CAST(a.rk AS BIGINT) AS rk, a.vec_id, a.approx_d2,
       coalesce(x.xrk <= 3, FALSE) AS in_exact_top3
FROM approx a
LEFT JOIN exact x
  ON x.query_id = a.query_id AND x.vec_id = a.vec_id AND x.xrk <= 3
WHERE a.rk <= 3
"""


@query(
    "q251_pq_adc_recall",
    tags=("similarity", "quantization", "ann", "audit"),
    oracle=_adc_oracle(),
)
def q251_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) search over the q250 PQ codes with a
    recall audit: each query precomputes a 4x8 lookup table of
    sub-distances to the codebook, an approximate distance is the SUM
    OF FOUR TABLE LOOKUPS per database vector (never a 64-dim fold at
    search time — the whole point of PQ), and the approximate top-3 is
    checked against the exact L2 top-3 — closing the encode → search
    → measure loop the ANN stack needs before trading recall for a
    16x memory cut (the q142 audit discipline applied to PQ).

    Scale: codes are corpus-linear; the lookup table is |queries| x 32
    rows broadcast into an equi-join on (subspace, code); the exact
    side scans once against the 3 broadcast queries. Both rankings
    order by ROUNDED distance with vec_id tie-break (footgun 3).
    """
    from pyspark.sql import Window

    from ...operators.similarity import (
        pq_best_codes,
        pq_sub_sq_l2,
        pq_subspace_frames,
    )

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    emb = emb.localCheckpoint(eager=False)  # codes/table/exact branches
    subseeds, subvecs = pq_subspace_frames(emb)
    subvecs = subvecs.localCheckpoint(eager=False)  # codes + query table
    codes = pq_best_codes(subvecs, subseeds).select("vec_id", "sub", "cid")
    qsub = subvecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "sub", "v"
    )
    dtable = qsub.join(F.broadcast(subseeds), "sub").select(
        "query_id",
        "sub",
        "cid",
        pq_sub_sq_l2(F.col("v"), F.col("cvec")).alias("qdist"),
    )
    adc = (
        codes.join(F.broadcast(dtable), ["sub", "cid"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qdist").alias("approx_d2"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        fround(F.col("approx_d2"), 6), F.asc("vec_id")
    )
    approx = (
        adc.select(
            "query_id",
            "vec_id",
            fround(F.col("approx_d2"), 6).alias("approx_d2"),
        )
        .withColumn("rk", F.row_number().over(wq).cast("bigint"))
        .where(F.col("rk") <= 3)
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    diffs = F.zip_with(
        F.col("qe"),
        F.col("embedding"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    exact_d2 = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    wx = Window.partitionBy("query_id").orderBy(
        fround(F.col("exact_d2"), 6), F.asc("vec_id")
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", exact_d2.alias("exact_d2"))
        .withColumn("xrk", F.row_number().over(wx))
        .where(F.col("xrk") <= 3)
        .select("query_id", "vec_id", "xrk")
    )
    return approx.join(exact, ["query_id", "vec_id"], "left").select(
        "query_id",
        "rk",
        "vec_id",
        "approx_d2",
        F.coalesce(F.col("xrk") <= 3, F.lit(False)).alias("in_exact_top3"),
    )


@query(
    "q267_lsh_1nn_label_coherence",
    tags=("similarity", "ann", "audit", "ml"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, label, {_sums_cols_sql()}
  FROM (
    SELECT n.vec_id, n.embedding, n.sqnorm, e.label
    FROM normed n JOIN embeddings e ON e.vec_id = n.vec_id
  )
),
bucketed AS MATERIALIZED (
  SELECT vec_id, embedding, sqnorm, label,
         CAST({_bucket_sql(0, 4)} AS BIGINT) AS bucket
  FROM sums
), scored AS (
  SELECT a.vec_id, a.label,
         b.vec_id AS nbr_id, b.label AS nbr_label,
         round(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(b.embedding[i] AS DOUBLE)))
               / (sqrt(a.sqnorm) * sqrt(b.sqnorm)) + 1e-9, 6) AS cosine
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket
  WHERE b.vec_id != a.vec_id
), nn AS (
  SELECT vec_id, label, nbr_label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, nbr_id
    ) AS rk FROM scored
  ) WHERE rk = 1
), perlabel AS (
  SELECT b.label,
         CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(count(n.vec_id) AS BIGINT) AS n_matched,
         CAST(sum(CASE WHEN n.nbr_label = b.label THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
  FROM bucketed b LEFT JOIN nn n ON n.vec_id = b.vec_id
  GROUP BY b.label
)
SELECT label, n_vectors, n_matched, n_correct,
       CASE WHEN n_matched > 0
            THEN round(n_correct * 1.0 / n_matched + 1e-9, 6) END
         AS nn_accuracy,
       round(n_matched * 1.0 / n_vectors + 1e-9, 6) AS coverage
FROM perlabel
""",
)
def q267_lsh_1nn_label_coherence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leave-one-out 1-NN label coherence through the PRODUCTION ANN
    path: every vector's nearest bucket-mate (4-plane LSH — the q142
    lesson: 8 planes shatter these synthetic vectors) votes a label,
    and per-label agreement + coverage says whether the embedding
    space actually clusters by label — the go/no-go audit before
    anyone trains a classifier head on these vectors, measured on the
    same index the deployment would serve from (recall losses count
    against it, honestly).

    Scale: the self-join is bucket-bounded (the whole point of LSH);
    the 1-NN is a per-vector WindowGroupLimit on the ROUNDED cosine
    with an id tie-break (footgun 3); accuracies are integer ratios
    with unmatched vectors reported as coverage, not silently
    dropped.
    """
    from pyspark.sql import Window

    emb = read_table(
        spark, sf_dir, "embeddings", ["vec_id", "embedding", "label"]
    )
    idx = (
        with_lsh_bucket(emb, "embedding", 4, _DIM)
        .select(
            "vec_id",
            "label",
            "embedding",
            "bucket",
            squared_norm(F.col("embedding")).alias("sqnorm"),
        )
        .localCheckpoint(eager=False)  # both join sides + census
    )
    a = idx.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_vec"),
        F.col("sqnorm").alias("a_norm"),
        "bucket",
    )
    b = idx.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("embedding").alias("b_vec"),
        F.col("sqnorm").alias("b_norm"),
        "bucket",
    )
    from ...operators.similarity import cosine

    scored = (
        a.join(b, "bucket")
        .where(F.col("nbr_id") != F.col("a_id"))
        .select(
            "a_id",
            "a_label",
            "nbr_id",
            "nbr_label",
            fround(
                cosine(
                    F.col("a_vec"),
                    F.col("b_vec"),
                    F.col("a_norm"),
                    F.col("b_norm"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    wn = Window.partitionBy("a_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    nn = (
        scored.withColumn("rk", F.row_number().over(wn))
        .where(F.col("rk") == 1)
        .select(F.col("a_id").alias("vec_id"), "nbr_label")
    )
    per = (
        idx.select("vec_id", "label")
        .join(nn, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count("nbr_label").alias("n_matched"),
            F.sum(
                F.when(F.col("nbr_label") == F.col("label"), 1).otherwise(
                    0
                )
            ).alias("n_correct"),
        )
    )
    return per.select(
        "label",
        "n_vectors",
        "n_matched",
        "n_correct",
        F.when(
            F.col("n_matched") > 0,
            fround(F.col("n_correct") * 1.0 / F.col("n_matched"), 6),
        ).alias("nn_accuracy"),
        fround(F.col("n_matched") * 1.0 / F.col("n_vectors"), 6).alias(
            "coverage"
        ),
    )


@query(
    "q294_ivf_pq_index_census",
    tags=("similarity", "ann", "quantization", "report"),
    oracle=f"""
WITH {_SEEDS_CTE.strip()},
ivf_scored AS (
  SELECT e.vec_id, s.cluster_id,
         {_sq_l2_sql('e.embedding', 's.centroid')} AS dist
  FROM embeddings e CROSS JOIN seeds s
), cells AS MATERIALIZED (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY dist, cluster_id
           ) AS rn
    FROM ivf_scored
  ) WHERE rn = 1
), pqseeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) s
), subs AS (
  SELECT unnest([0, 1, 2, 3]) AS sub
), subseeds AS MATERIALIZED (
  SELECT cid, sub, embedding[(1 + 16 * sub):(16 * sub + 16)] AS cvec
  FROM pqseeds CROSS JOIN subs
), subvecs AS (
  SELECT vec_id, sub, embedding[(1 + 16 * sub):(16 * sub + 16)] AS v
  FROM embeddings CROSS JOIN subs
), pqscored AS (
  SELECT v.vec_id, v.sub, c.cid, list_sum(list_transform(generate_series(1, 16), i -> (CAST(v.v[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)) * (CAST(v.v[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))) AS dist
  FROM subvecs v JOIN subseeds c ON v.sub = c.sub
), pqranked AS (
  SELECT vec_id, sub, cid, dist,
         row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY dist, cid
         ) AS rk
  FROM pqscored
), pq AS MATERIALIZED (
  SELECT vec_id,
         CAST(sum(cid * (CASE sub WHEN 0 THEN 1 WHEN 1 THEN 8
                         WHEN 2 THEN 64 ELSE 512 END)) AS BIGINT)
           AS pq_code,
         round(sum(dist) + 1e-9, 6) AS recon_err
  FROM pqranked WHERE rk = 1
  GROUP BY vec_id
)
SELECT c.cluster_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(DISTINCT p.pq_code) AS BIGINT) AS n_distinct_codes,
       round(count(DISTINCT p.pq_code) * 1.0 / count(*) + 1e-9, 6)
         AS code_diversity,
       round(avg(p.recon_err) + 1e-9, 6) AS mean_recon_err,
       round(max(p.recon_err) + 1e-9, 6) AS max_recon_err
FROM cells c JOIN pq p ON p.vec_id = c.vec_id
GROUP BY c.cluster_id
""",
)
def q294_ivf_pq_index_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF-PQ composed index census — the FAISS-style layout: vectors
    partitioned into IVF cells (q61's assignment) and compressed to
    q250's 12-bit PQ codes, reported per cell as size, code
    diversity (distinct codes / vectors — near 1 means the codebook
    still separates the cell's residents; near 0 means ADC can't
    discriminate inside it and the cell needs its own codebook), and
    the reconstruction-error envelope the re-ranker must absorb. The
    go/no-go table before committing a 100 TB corpus to a
    quantized-index memory budget.

    Scale: both stages are the proven broadcast-codebook equi-join
    patterns; the census is one join of two vector-grain frames on
    vec_id plus a cell-grain aggregate.
    """
    from ...operators.ivf import assign_clusters, seed_centroids
    from ...operators.similarity import pq_best_codes, pq_subspace_frames

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    emb = emb.localCheckpoint(eager=False)  # IVF + PQ branches
    cents = seed_centroids(emb, 8)
    cells = assign_clusters(emb, cents).select("vec_id", "cluster_id")
    subseeds, subvecs = pq_subspace_frames(emb)
    best = pq_best_codes(subvecs, subseeds)
    weight = (
        F.when(F.col("sub") == 0, 1)
        .when(F.col("sub") == 1, 8)
        .when(F.col("sub") == 2, 64)
        .otherwise(512)
    )
    pq = best.groupBy("vec_id").agg(
        F.sum(F.col("cid") * weight).cast("bigint").alias("pq_code"),
        fround(F.sum("dist"), 6).alias("recon_err"),
    )
    return (
        cells.join(pq, "vec_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("pq_code").alias("n_distinct_codes"),
            fround(
                F.countDistinct("pq_code") * 1.0 / F.count(F.lit(1)), 6
            ).alias("code_diversity"),
            fround(F.avg("recon_err"), 6).alias("mean_recon_err"),
            fround(F.max("recon_err"), 6).alias("max_recon_err"),
        )
    )


@query(
    "q298_embedding_dimension_health",
    tags=("similarity", "audit", "ml"),
    oracle="""
WITH comps AS (
  SELECT u.dim, CAST(u.x AS DOUBLE) AS x
  FROM (
    SELECT unnest(embedding) AS x,
           unnest(generate_series(1, len(embedding))) AS dim
    FROM embeddings
  ) u
), perdim AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx,
         sum(x * x) AS sxx,
         CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero
  FROM comps GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim, n,
       round(sx / n + 1e-9, 6) + 0 AS mean,
       round((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n) + 1e-9, 6)
         AS variance,
       round(n_zero * 1.0 / n + 1e-9, 6) AS zero_share,
       CASE WHEN n * sxx - sx * sx <= 0 THEN NULL
            ELSE round(abs(sx / n)
                       / sqrt((n * sxx - sx * sx)
                              / (CAST(n AS DOUBLE) * n)) + 1e-9, 4) END
         AS mean_to_std
FROM perdim
""",
)
def q298_embedding_dimension_health(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-DIMENSION embedding health: mean, population variance,
    zero share, and |mean|/std per coordinate — the anisotropy screen
    that catches dead dimensions (zero variance — wasted index
    bytes), rogue bias dimensions (large |mean|/std dominate every
    cosine — the known anisotropy failure of contrastive encoders),
    and sparsity drift, at the grain q169's vector-level hygiene
    can't see. Flag candidates feed q242's projection (drop dead
    dims before sketching).

    Scale: posexplode is a 64× map-side fan-out reduced immediately
    to the 64-row dimension grain — one shuffle on a bounded key.
    Component sums are float sums of identical doubles
    (fround-absorbed); zero tests compare exact float32 bits; the
    degenerate-variance guard is NULL on both sides.
    """
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    comps = emb.select(
        F.posexplode("embedding").alias("pos", "xf")
    ).select(
        (F.col("pos") + 1).alias("dim"), F.col("xf").cast("double").alias("x")
    )
    perdim = comps.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.when(F.col("x") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )
    var = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) / (
        F.col("n").cast("double") * F.col("n")
    )
    return perdim.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n",
        (fround(F.col("sx") / F.col("n"), 6) + 0).alias("mean"),
        fround(var, 6).alias("variance"),
        fround(F.col("n_zero") * 1.0 / F.col("n"), 6).alias("zero_share"),
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") <= 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            fround(F.abs(F.col("sx") / F.col("n")) / F.sqrt(var), 4)
        )
        .alias("mean_to_std"),
    )


@query(
    "q315_ivf_partition_stability",
    tags=("similarity", "ann", "audit"),
    oracle=f"""
WITH seeds_a AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) s
), seeds_b AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 2 = 1 ORDER BY vec_id LIMIT 8) s
), cells_a AS MATERIALIZED (
  SELECT vec_id, cluster_id AS ca FROM (
    SELECT e.vec_id, s.cluster_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sq_l2_sql('e.embedding', 's.centroid')}, s.cluster_id
           ) AS rn
    FROM embeddings e CROSS JOIN seeds_a s
  ) WHERE rn = 1
), cells_b AS MATERIALIZED (
  SELECT vec_id, cluster_id AS cb FROM (
    SELECT e.vec_id, s.cluster_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sq_l2_sql('e.embedding', 's.centroid')}, s.cluster_id
           ) AS rn
    FROM embeddings e CROSS JOIN seeds_b s
  ) WHERE rn = 1
), cont AS MATERIALIZED (
  SELECT a.ca, b.cb, CAST(count(*) AS BIGINT) AS nij
  FROM cells_a a JOIN cells_b b ON b.vec_id = a.vec_id
  GROUP BY a.ca, b.cb
), sums AS (
  SELECT CAST(sum(nij) AS BIGINT) AS n,
         CAST(sum(nij * (nij - 1) / 2) AS BIGINT) AS s_both
  FROM cont
), ma AS (
  SELECT CAST(sum(sa * (sa - 1) / 2) AS BIGINT) AS s_a FROM (
    SELECT CAST(sum(nij) AS BIGINT) AS sa FROM cont GROUP BY ca
  )
), mb AS (
  SELECT CAST(sum(sb * (sb - 1) / 2) AS BIGINT) AS s_b FROM (
    SELECT CAST(sum(nij) AS BIGINT) AS sb FROM cont GROUP BY cb
  )
)
SELECT s.n AS n_vectors, s.s_both AS pairs_both,
       ma.s_a AS pairs_a, mb.s_b AS pairs_b,
       round(s.s_both * 1.0 / (ma.s_a + mb.s_b - s.s_both) + 1e-9, 6)
         AS pair_jaccard,
       round((CAST(s.n AS DOUBLE) * (s.n - 1) / 2.0
              - (ma.s_a + mb.s_b) + 2.0 * s.s_both)
             / (CAST(s.n AS DOUBLE) * (s.n - 1) / 2.0) + 1e-9, 6)
         AS rand_index
FROM sums s CROSS JOIN ma CROSS JOIN mb
""",
)
def q315_ivf_partition_stability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF partition-stability audit: assign every vector under two
    deterministic seed sets (the standard lowest-id seeds vs an
    odd-id-only alternative — standing in for "index built last
    month" vs "index built today") and measure agreement as the EXACT
    pair-level Jaccard and Rand index, computed from the 8×8
    contingency table's cell sizes — never by materializing vector
    pairs (Σ n_ij·(n_ij−1)/2 IS the co-located pair count; the
    same counting trick as q44's exact side). Low stability means
    cell routing is sensitive to seeding and nprobe must rise (q168's
    balance audit says cells are even; this says they're REPEATABLE).

    Scale: two broadcast-seed assignments, one vec_id join to the
    contingency grain, then pure integer algebra on ≤64 cells.
    """
    from pyspark.sql import Window

    from ...operators.ivf import assign_clusters, seed_centroids

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    emb = emb.localCheckpoint(eager=False)  # two assignment branches
    cells_a = assign_clusters(emb, seed_centroids(emb, 8)).select(
        "vec_id", F.col("cluster_id").alias("ca")
    )
    odd = emb.where(F.col("vec_id") % 2 == 1)
    cells_b = assign_clusters(emb, seed_centroids(odd, 8)).select(
        "vec_id", F.col("cluster_id").alias("cb")
    )
    cont = (
        cells_a.join(cells_b, "vec_id")
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("nij"))
        .localCheckpoint(eager=False)  # three margin branches
    )
    pairs = lambda c: F.sum(F.col(c) * (F.col(c) - 1) / 2).cast("bigint")
    sums = cont.agg(
        F.sum("nij").cast("bigint").alias("n"),
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2)
        .cast("bigint")
        .alias("s_both"),
    )
    ma = (
        cont.groupBy("ca")
        .agg(F.sum("nij").alias("sa"))
        .agg(pairs("sa").alias("s_a"))
    )
    mb = (
        cont.groupBy("cb")
        .agg(F.sum("nij").alias("sb"))
        .agg(pairs("sb").alias("s_b"))
    )
    n_d = F.col("n").cast("double")
    total_pairs = n_d * (F.col("n") - 1) / 2.0
    return (
        sums.crossJoin(F.broadcast(ma))
        .crossJoin(F.broadcast(mb))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("s_both").alias("pairs_both"),
            F.col("s_a").alias("pairs_a"),
            F.col("s_b").alias("pairs_b"),
            fround(
                F.col("s_both")
                * 1.0
                / (F.col("s_a") + F.col("s_b") - F.col("s_both")),
                6,
            ).alias("pair_jaccard"),
            fround(
                (
                    total_pairs
                    - (F.col("s_a") + F.col("s_b"))
                    + 2.0 * F.col("s_both")
                )
                / total_pairs,
                6,
            ).alias("rand_index"),
        )
    )


@query(
    "q330_matryoshka_truncation_recall",
    tags=("similarity", "embedding", "audit"),
    oracle="""
WITH dims AS (
  SELECT CAST(unnest([64, 32, 16]) AS INTEGER) AS dim
), q3 AS (
  SELECT d.dim, e.vec_id AS query_id, e.embedding AS q_vec,
         list_sum(list_transform(generate_series(1, d.dim),
           i -> CAST(e.embedding[i] AS DOUBLE)
                * CAST(e.embedding[i] AS DOUBLE))) AS q_norm
  FROM embeddings e, dims d WHERE e.vec_id < 20
), c3 AS (
  SELECT d.dim, e.vec_id AS neighbor_id, e.embedding,
         list_sum(list_transform(generate_series(1, d.dim),
           i -> CAST(e.embedding[i] AS DOUBLE)
                * CAST(e.embedding[i] AS DOUBLE))) AS c_norm
  FROM embeddings e, dims d
), scored AS (
  SELECT q.dim, q.query_id, c.neighbor_id,
         round(list_sum(list_transform(generate_series(1, q.dim),
                 i -> CAST(q.q_vec[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)))
               / (sqrt(q.q_norm) * sqrt(c.c_norm)) + 1e-9, 6) AS cosine
  FROM q3 q JOIN c3 c
    ON c.dim = q.dim AND c.neighbor_id != q.query_id
), ranked AS (
  SELECT dim, query_id, neighbor_id,
         row_number() OVER (
           PARTITION BY dim, query_id ORDER BY cosine DESC, neighbor_id
         ) AS rnk
  FROM scored
), sel AS (
  SELECT dim, query_id, neighbor_id FROM ranked WHERE rnk <= 3
), truth AS (
  SELECT query_id, neighbor_id FROM sel WHERE dim = 64
), hits AS (
  SELECT s.dim, CAST(count(*) AS BIGINT) AS n_hits
  FROM sel s JOIN truth t
    ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
  GROUP BY s.dim
), nq AS (
  SELECT dim, CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries
  FROM sel GROUP BY dim
)
SELECT n.dim AS dim, n.n_queries, h.n_hits,
       round(h.n_hits * 1.0 / (3.0 * n.n_queries) + 1e-9, 6) AS recall_at3
FROM nq n JOIN hits h ON h.dim = n.dim
""",
)
def q330_matryoshka_truncation_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka embedding audit (Kusupati et al. 2022): if the
    store served only the first 32 (or 16) of the 64 embedding
    dimensions, how much of the exact top-3 cosine neighborhood
    survives? Recall@3 of prefix-truncated search against the
    full-dimension truth — the measurement that decides whether a
    deployment can halve its vector-store footprint. Synthetic random
    embeddings concentrate similarity in no prefix, so truncation
    recall here is the pessimistic floor (a trained MRL model fronts
    this same query with far better numbers).

    Prefix dot products and norms are the q40 sequential-fold
    contract on SLICED arrays (zip_with+aggregate ↔
    list_sum∘list_transform — bit-identical doubles), rounded before
    the rank with a neighbor-id tie-break. Scale: queries and the
    3-row dim frame broadcast; the corpus side streams once per dim
    and WindowGroupLimit keeps 3 rows per (dim, query).
    """
    from pyspark.sql.window import Window

    emb = read_table(spark, sf_dir, "embeddings")
    dims = local_frame(spark, [(64,), (32,), (16,)], "dim INT")
    q3 = (
        emb.where(F.col("vec_id") < 20)
        .crossJoin(F.broadcast(dims))
        .select(
            "dim",
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            squared_norm(F.expr("slice(embedding, 1, dim)")).alias("q_norm"),
        )
    )
    c3 = emb.crossJoin(F.broadcast(dims)).select(
        F.col("dim").alias("cdim"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        squared_norm(F.expr("slice(embedding, 1, dim)")).alias("c_norm"),
    )
    from ...operators.similarity import dot as _dot

    scored = c3.join(
        F.broadcast(q3),
        (F.col("cdim") == F.col("dim"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "dim",
        "query_id",
        "neighbor_id",
        F.round(
            _dot(
                F.expr("slice(q_vec, 1, dim)"),
                F.expr("slice(c_vec, 1, dim)"),
            )
            / (F.sqrt("q_norm") * F.sqrt("c_norm"))
            + 1e-9,
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    sel = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("dim", "query_id", "neighbor_id")
    )
    sel = sel.localCheckpoint(eager=False)  # truth + hits + nq branches
    truth = sel.where(F.col("dim") == 64).select(
        F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn")
    )
    hits = (
        sel.join(
            truth,
            (F.col("query_id") == F.col("tq"))
            & (F.col("neighbor_id") == F.col("tn")),
        )
        .groupBy("dim")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    nq = sel.groupBy("dim").agg(
        F.countDistinct("query_id").cast("bigint").alias("n_queries")
    )
    return nq.join(hits, "dim").select(
        "dim",
        "n_queries",
        "n_hits",
        fround(
            F.col("n_hits") * 1.0 / (3.0 * F.col("n_queries")), 6
        ).alias("recall_at3"),
    )


@query(
    "q339_mutual_nearest_neighbors",
    tags=("similarity", "dedup", "graph"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
sums AS (
  SELECT vec_id, embedding, sqnorm, {_sums_cols_sql()} FROM normed
),
bucketed AS (
  SELECT vec_id, embedding, sqnorm,
         CAST({_bucket_sql(0, 4)} AS BIGINT) AS bucket
  FROM sums
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
         round(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(q.embedding[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)))
               / (sqrt(q.sqnorm) * sqrt(c.sqnorm)) + 1e-9, 6) AS cosine
  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket
  WHERE c.vec_id != q.vec_id
), nn AS (
  SELECT query_id, neighbor_id, bucket, cosine FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rn FROM scored
  ) WHERE rn = 1
)
SELECT x.query_id AS p1, x.neighbor_id AS p2, x.bucket, x.cosine
FROM nn x JOIN nn y
  ON x.query_id = y.neighbor_id AND x.neighbor_id = y.query_id
WHERE x.query_id < x.neighbor_id
""",
)
def q339_mutual_nearest_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reciprocal (mutual) nearest-neighbor pairs within LSH buckets:
    vector pairs where EACH is the other's top-1 cosine neighbor —
    the high-precision matching rule behind bitext mining (Artetxe &
    Schwenk 2019) and near-duplicate canonicalization: a one-sided
    top-1 can be a hub artifact, a reciprocal one almost never is.
    Buckets use the 4-plane hyperplane family (q142's measured
    setting: 16 buckets keeps recall meaningful on synthetic vectors
    where 8 planes shatter the space), so the quadratic scoring is
    per-bucket, never corpus-wide — the q32/q63 candidate-blocking
    discipline applied to mutual-NN.

    Cosine is the q40 fold contract; the tie-broken top-1 makes the
    NN relation a function, and symmetry of the fold (term-wise
    commutative products, identical sum order) means both directions
    carry the same rounded score — the mutual join needs no score
    reconciliation.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    from pyspark.sql.window import Window

    bucketed = with_lsh_bucket(emb, "embedding", 4, _DIM).select(
        "vec_id",
        "embedding",
        squared_norm(F.col("embedding")).alias("sqnorm"),
        "bucket",
    )
    bucketed = bucketed.localCheckpoint(eager=False)  # self-join sides
    q = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("sqnorm").alias("q_norm"),
        "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.col("sqnorm").alias("c_norm"),
        F.col("bucket").alias("cbucket"),
    )
    from ...operators.similarity import cosine as _cosine

    scored = q.join(
        c,
        (F.col("bucket") == F.col("cbucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        "bucket",
        F.round(
            _cosine(
                F.col("q_vec"), F.col("c_vec"),
                F.col("q_norm"), F.col("c_norm"),
            )
            + 1e-9,
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    nn = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", "neighbor_id", "bucket", "cosine")
    )
    nn = nn.localCheckpoint(eager=False)  # mutual self-join sides
    y = nn.select(
        F.col("query_id").alias("yq"), F.col("neighbor_id").alias("yn")
    )
    return (
        nn.join(
            y,
            (F.col("query_id") == F.col("yn"))
            & (F.col("neighbor_id") == F.col("yq")),
        )
        .where(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("p1"),
            F.col("neighbor_id").alias("p2"),
            "bucket",
            "cosine",
        )
    )


@query(
    "q372_ivf_silhouette",
    tags=("similarity", "ivf", "audit"),
    oracle=f"""
WITH {_SEEDS_CTE.strip()},
scored AS (
  SELECT e.vec_id, s.cluster_id,
         {_sq_l2_sql('e.embedding', 's.centroid')} AS dist
  FROM embeddings e CROSS JOIN seeds s
), ranked AS (
  SELECT vec_id, cluster_id, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id)
           AS rn
  FROM scored
), two AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN cluster_id END) AS cluster_id,
         max(CASE WHEN rn = 1 THEN dist END) AS d1,
         max(CASE WHEN rn = 2 THEN dist END) AS d2
  FROM ranked WHERE rn <= 2 GROUP BY vec_id
), sil AS (
  SELECT cluster_id,
         CASE WHEN d2 = 0 THEN 0.0
              ELSE (sqrt(d2) - sqrt(d1)) / sqrt(d2) END AS s
  FROM two
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg(s) + 1e-9, 6) AS avg_silhouette,
       round(min(s) + 1e-9, 6) AS min_silhouette,
       CAST(sum(CASE WHEN round(s + 1e-9, 6) < 0.1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ambiguous
FROM sil GROUP BY cluster_id
""",
)
def q372_ivf_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette quality audit of the q61 IVF partitioning
    — the third leg of the clustering-audit stool: q168 measures cell
    BALANCE (sizes), q315 measures STABILITY (agreement between
    seedings), this measures GEOMETRIC QUALITY. Per vector, the
    simplified silhouette s = (d2 - d1)/d2 on Euclidean
    centroid distances, where d1 is the distance to the OWN (nearest)
    centroid and d2 to the nearest OTHER centroid (Hruschka et al.'s
    centroid-based relaxation of Rousseeuw 1987 — the only silhouette
    computable without the all-pairs matrix, which is the form that
    exists at 100 TB). s near 0 = the vector sits on a cell boundary
    (an ANN search must probe 2+ cells to find its neighbors — exactly
    the nprobe>1 population q62 pays for); the per-cell n_ambiguous
    (s < 0.1 after rounding) estimates that boundary population.

    Exactness: both distances come off ONE scored pass (the q61
    cross-join convention, same tie-break), so the assignment can
    never diverge from q61; sqrt of bit-identical doubles and one
    division are correctly rounded; d1 <= d2 by construction makes s
    nonnegative (no sign-of-zero exposure); the ambiguity threshold
    compares the 6-dp ROUNDED s both engines (the q348 ordering
    lesson applied to a predicate).

    Scale: broadcast 8-centroid cross join, one vec_id-keyed reduce
    (the top-2 selection is a bounded array_sort over k=8 structs —
    map-side combinable, never a data-sized window), one bounded
    cell-grain aggregate.

    Hash stability of avg_silhouette (the only float mean in the r8
    additions — r8 verdict minor note): this is the WELL-CONDITIONED
    float-sum class (q24/q204), not the q363 cancellation class. Every
    s is same-sign in [0, 1] (d1 <= d2 by construction) and nothing
    divides by a small difference, so the worst-case sum-order
    divergence of avg(s) is ~n*eps*mean(s) <= 2^-52 * n. Even at sf1
    cell sizes (n ~ 1e6) that is ~2e-10, three orders of magnitude
    inside the 6-dp round's 5e-7 half-gap — the fround pair provably
    absorbs it. (The q363 two-pass rule triggers only when a statistic
    DIVIDES by a small variance; no reformulation needed here.)
    """
    from ...operators.ivf import seed_centroids, sq_l2

    emb = read_table(spark, sf_dir, "embeddings")
    cents = seed_centroids(emb, 8)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cluster_id",
        sq_l2(F.col("embedding"), F.col("centroid"), dim=_DIM).alias("dist"),
    )
    two = scored.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("dist", "cluster_id"))),
            1,
            2,
        ).alias("t2")
    )
    d1 = F.col("t2").getItem(0).getField("dist")
    d2 = F.col("t2").getItem(1).getField("dist")
    sil = two.select(
        F.col("t2").getItem(0).getField("cluster_id").alias("cluster_id"),
        F.when(d2 == 0, F.lit(0.0))
        .otherwise((F.sqrt(d2) - F.sqrt(d1)) / F.sqrt(d2))
        .alias("s"),
    )
    return sil.groupBy(
        F.col("cluster_id").cast("bigint").alias("cluster_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        fround(F.avg("s"), 6).alias("avg_silhouette"),
        fround(F.min("s"), 6).alias("min_silhouette"),
        F.sum(
            F.when(fround(F.col("s"), 6) < 0.1, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("n_ambiguous"),
    )


@query(
    "q383_metric_choice_audit",
    tags=("similarity", "audit", "llm-pipeline"),
    oracle=f"""
WITH {_NORMED_CTE.strip()},
q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, sqnorm AS q_norm
  FROM normed WHERE vec_id < 3
), scored AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT} / (sqrt(q.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6)
           AS cosine,
         round({_sq_l2_sql('q.q_vec', 'c.embedding')} + 1e-9, 6) AS dist
  FROM q CROSS JOIN normed c WHERE c.vec_id != q.query_id
), rc AS MATERIALIZED (
  SELECT query_id, neighbor_id, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
), rl AS MATERIALIZED (
  SELECT query_id, neighbor_id, row_number() OVER (
    PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM scored
), ov AS (
  SELECT tc.query_id, CAST(count(*) AS BIGINT) AS overlap,
         CAST(sum(CASE WHEN tc.rn = 1 AND tl.rn = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS nn1
  FROM (SELECT * FROM rc WHERE rn <= 10) tc
  JOIN (SELECT * FROM rl WHERE rn <= 10) tl
    ON tc.query_id = tl.query_id AND tc.neighbor_id = tl.neighbor_id
  GROUP BY tc.query_id
)
SELECT q.query_id, COALESCE(ov.overlap, 0) AS top10_overlap,
       round(CAST(COALESCE(ov.overlap, 0) AS DOUBLE)
             / (20.0 - CAST(COALESCE(ov.overlap, 0) AS DOUBLE)) + 1e-9, 6)
         AS jaccard_top10,
       COALESCE(ov.nn1, 0) = 1 AS nn_same
FROM q LEFT JOIN ov ON q.query_id = ov.query_id
""",
)
def q383_metric_choice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the DISTANCE METRIC matter for this embedding corpus? Per
    query vector (the q42 vec_id < 3 convention): the exact top-10
    neighbor sets under cosine similarity and under squared Euclidean
    distance from ONE shared scored pass, reduced to their overlap
    size, set Jaccard, and whether the single nearest neighbor
    agrees. On L2-normalized embeddings the two rankings coincide;
    on raw embeddings they diverge with vector-norm spread — this
    audit measures that divergence so an ANN deployment (q42 LSH is
    cosine-family, q62 IVF is L2-family) knows whether its index
    metric silently changes the answer set. Companion to q169's
    norm-spread hygiene check and q142's recall audit.

    Exactness: both scores are rounded to 6 dp BEFORE ranking with a
    neighbor-id tie-break (the q348 total-order rule), so both
    engines rank identically; overlap/Jaccard are integer-exact
    (rule 5; Jaccard of two 10-sets = i/(20-i)). Zero-overlap queries
    anchor on the query frame (LEFT JOIN + coalesce).

    Scale: one corpus pass against 3 broadcast queries; both rank
    windows are per-query top-k (WindowGroupLimit keeps the heap
    bounded executor-side); the scored frame feeds two window
    branches, so it localCheckpoints (repo convention).
    """
    from ...operators.ivf import sq_l2
    from ...operators.similarity import cosine, squared_norm

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        squared_norm(F.col("embedding")).alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        squared_norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(
                    F.col("q_vec"), F.col("c_vec"),
                    F.col("q_norm"), F.col("c_norm"),
                )
                + 1e-9,
                6,
            ).alias("cosine"),
            fround(sq_l2(F.col("q_vec"), F.col("c_vec"), dim=_DIM), 6).alias(
                "dist"
            ),
        )
        .localCheckpoint(eager=False)  # two rank-window branches
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    tc = (
        scored.withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", F.col("rn").alias("rn_c"))
    )
    tl = (
        scored.withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", F.col("rn").alias("rn_l"))
    )
    ov = (
        tc.join(tl, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("overlap"),
            F.sum(
                F.when((F.col("rn_c") == 1) & (F.col("rn_l") == 1), 1)
                .otherwise(0)
            ).cast("bigint").alias("nn1"),
        )
    )
    anchor = q.select("query_id")
    ovc = F.coalesce(F.col("overlap"), F.lit(0).cast("bigint"))
    return anchor.join(ov, "query_id", "left").select(
        "query_id",
        ovc.alias("top10_overlap"),
        fround(
            ovc.cast("double") / (F.lit(20.0) - ovc.cast("double")), 6
        ).alias("jaccard_top10"),
        (F.coalesce(F.col("nn1"), F.lit(0).cast("bigint")) == 1).alias(
            "nn_same"
        ),
    )


@query(
    "q385_inertia_elbow_sweep",
    tags=("similarity", "ivf", "clustering", "audit"),
    oracle=f"""
WITH {_SEEDS_CTE.strip()},
scored AS MATERIALIZED (
  SELECT e.vec_id, s.cluster_id,
         {_sq_l2_sql('e.embedding', 's.centroid')} AS dist
  FROM embeddings e CROSS JOIN seeds s
), ks AS (SELECT CAST(unnest([2, 4, 8]) AS BIGINT) AS k),
bestk AS MATERIALIZED (
  SELECT ks.k, vec_id, min(dist) AS dist
  FROM scored CROSS JOIN ks WHERE cluster_id < ks.k
  GROUP BY ks.k, vec_id
), cell AS MATERIALIZED (
  SELECT b.k, b.vec_id, min(s.cluster_id) AS cid
  FROM bestk b JOIN scored s
    ON s.vec_id = b.vec_id AND s.dist = b.dist AND s.cluster_id < b.k
  GROUP BY b.k, b.vec_id
), cells AS (
  SELECT k, cid, CAST(count(*) AS BIGINT) AS c FROM cell GROUP BY k, cid
), perk AS MATERIALIZED (
  SELECT b.k,
         CAST(count(*) AS BIGINT) AS n_vectors,
         round(sum(b.dist) + 1e-9, 4) AS inertia,
         round(avg(b.dist) + 1e-9, 6) AS mean_sq_dist
  FROM bestk b GROUP BY b.k
), bal AS (
  SELECT k, round(CAST(max(c) AS DOUBLE)
                  / CAST(sum(c) AS DOUBLE) + 1e-9, 6) AS max_cell_share
  FROM cells GROUP BY k
)
SELECT p.k AS k, p.n_vectors, p.inertia, p.mean_sq_dist,
       b.max_cell_share,
       round((pv.inertia - p.inertia) / pv.inertia + 1e-9, 6)
         AS reduction_vs_prev
FROM perk p
JOIN bal b ON p.k = b.k
LEFT JOIN perk pv ON pv.k = p.k // 2
""",
)
def q385_inertia_elbow_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inertia elbow sweep for the IVF partitioning: score every
    vector against the q61 seed centroids ONCE, then read off the
    k = 2 / 4 / 8 clusterings simultaneously (the first-k-seeds
    nesting makes the k-sweep a FILTER, not three clusterings), and
    report per k the total within-cell inertia, mean squared
    distance, the largest cell's share (does more k actually balance
    load?), and the marginal inertia reduction vs k/2 — the elbow
    curve that justifies (or indicts) q61's k=8 before q168/q315/q372
    audit the chosen k's balance/stability/geometry.

    Exactness: one shared scored pass (q61 distance convention);
    per-(k, vector) min distance is an exact min over identical
    doubles; the assigned cell re-derives by equality join on that
    exact min with a min-cluster_id tie-break (no argmax structs —
    both engines resolve float ties identically because the doubles
    are bit-identical). Inertia is the well-conditioned same-sign
    float-sum class (q24/q372 note), absorbed at 4 dp; the marginal
    reduction divides ROUNDED inertias so the ratio starts from
    identical inputs on both engines.

    Scale: broadcast 8-row seed frame; the k-sweep multiplies the
    reduce by |ks| = 3, never re-scans the corpus; cell counts reduce
    to a ≤ 3*8-row frame. The scored frame feeds bestk and the cell
    equality join, so it localCheckpoints (repo convention).
    """
    from ...operators.ivf import seed_centroids, sq_l2

    emb = read_table(spark, sf_dir, "embeddings")
    cents = seed_centroids(emb, 8)
    scored = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cluster_id",
            sq_l2(F.col("embedding"), F.col("centroid"), dim=_DIM).alias(
                "dist"
            ),
        )
        .localCheckpoint(eager=False)  # bestk + cell equality branches
    )
    # q354 lesson: the Python shiftleft wrapper rejects a Column bit
    # count — spell the shift in SQL
    ks = spark.range(1, 4).select(
        F.expr("cast(shiftleft(1, cast(id as int)) as bigint)").alias("k")
    )
    bestk = (
        scored.join(F.broadcast(ks), F.col("cluster_id") < F.col("k"))
        .groupBy("k", "vec_id")
        .agg(F.min("dist").alias("dist"))
        .localCheckpoint(eager=False)  # perk + cell branches
    )
    cell = (
        bestk.alias("b")
        .join(
            scored.alias("s"),
            (F.col("s.vec_id") == F.col("b.vec_id"))
            & (F.col("s.dist") == F.col("b.dist"))
            & (F.col("s.cluster_id") < F.col("b.k")),
        )
        .groupBy(F.col("b.k").alias("k"), F.col("b.vec_id").alias("vec_id"))
        .agg(F.min("s.cluster_id").alias("cid"))
    )
    cells = cell.groupBy("k", "cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    perk = bestk.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        fround(F.sum("dist"), 4).alias("inertia"),
        fround(F.avg("dist"), 6).alias("mean_sq_dist"),
    )
    bal = cells.groupBy("k").agg(
        fround(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("max_cell_share")
    )
    prev = perk.select(
        (F.col("k") * 2).alias("k"), F.col("inertia").alias("prev_inertia")
    )
    return (
        perk.join(bal, "k")
        .join(prev, "k", "left")
        .select(
            "k",
            "n_vectors",
            "inertia",
            "mean_sq_dist",
            "max_cell_share",
            fround(
                (F.col("prev_inertia") - F.col("inertia"))
                / F.col("prev_inertia"),
                6,
            ).alias("reduction_vs_prev"),
        )
    )


_DOT_QC = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)

_DOT_PC = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(p.q_vec[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)


@query(
    "q388_ivf_recall_frontier",
    tags=("similarity", "ivf", "ann", "audit"),
    oracle=f"""
WITH {_SEEDS_CTE.strip()},
{_NORMED_CTE.strip()},
assigned AS MATERIALIZED (
  SELECT vec_id, embedding, sqnorm, cluster_id FROM (
    SELECT n.vec_id, n.embedding, n.sqnorm, s.cluster_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {_sq_l2_sql('n.embedding', 's.centroid')}, s.cluster_id
           ) AS rn
    FROM normed n CROSS JOIN seeds s
  ) WHERE rn = 1
), probes AS MATERIALIZED (
  SELECT query_id, q_vec, q_norm, cluster_id, rn AS pr FROM (
    SELECT q.vec_id AS query_id, q.embedding AS q_vec, q.sqnorm AS q_norm,
           s.cluster_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_sq_l2_sql('q.embedding', 's.centroid')}, s.cluster_id
           ) AS rn
    FROM (SELECT * FROM normed WHERE vec_id < 3) q CROSS JOIN seeds s
  ) WHERE rn <= 4
), exact3 AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round({_DOT_QC} / (sqrt(q.sqnorm) * sqrt(c.sqnorm)) + 1e-9, 6)
               DESC, c.vec_id) AS rn
    FROM (SELECT * FROM normed WHERE vec_id < 3) q CROSS JOIN normed c
    WHERE c.vec_id != q.vec_id
  ) WHERE rn <= 3
), cand AS MATERIALIZED (
  SELECT p.query_id, p.pr, c.vec_id AS neighbor_id,
         round({_DOT_PC} / (sqrt(p.q_norm) * sqrt(c.sqnorm)) + 1e-9, 6)
           AS cosine
  FROM probes p JOIN assigned c ON p.cluster_id = c.cluster_id
  WHERE c.vec_id != p.query_id
), nps AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS np),
ranked AS MATERIALIZED (
  SELECT np, query_id, neighbor_id, rn FROM (
    SELECT n.np, c.query_id, c.neighbor_id,
           row_number() OVER (
             PARTITION BY n.np, c.query_id
             ORDER BY c.cosine DESC, c.neighbor_id) AS rn
    FROM cand c JOIN nps n ON c.pr <= n.np
  ) WHERE rn <= 3
), hits AS (
  SELECT r.np, r.query_id, CAST(count(e.neighbor_id) AS BIGINT) AS n_hits
  FROM ranked r LEFT JOIN exact3 e
    ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
  GROUP BY r.np, r.query_id
), cost AS (
  SELECT n.np, c.query_id, CAST(count(*) AS BIGINT) AS n_candidates
  FROM cand c JOIN nps n ON c.pr <= n.np
  GROUP BY n.np, c.query_id
), corp AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM normed)
SELECT h.np AS nprobe, h.query_id, h.n_hits,
       round(CAST(h.n_hits AS DOUBLE) / 3.0 + 1e-9, 6) AS recall_at_3,
       c.n_candidates,
       round(CAST(c.n_candidates AS DOUBLE) / CAST(corp.n_corpus AS DOUBLE)
             + 1e-9, 6) AS scan_fraction
FROM hits h JOIN cost c ON h.np = c.np AND h.query_id = c.query_id
CROSS JOIN corp
""",
)
def q388_ivf_recall_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall-cost FRONTIER: per query (q62's vec_id < 3
    convention) and per nprobe in 1/2/4, the recall@3 of the
    cell-probed search against the exact brute-force top-3, next to
    the exact number of candidates the search had to score and the
    corpus fraction that represents. This is the tuning artifact an
    ANN deployment actually reads — q62 ships nprobe=2 as a constant;
    this measures what that constant buys (recall) and costs (scan
    fraction) on THIS corpus, completing the audit family: q142 (LSH
    recall at one setting), q251 (PQ/ADC recall), q168/q315/q372/q385
    (cell balance/stability/geometry/k).

    Exactness: ONE scored candidate pass (probe rank pr <= 4), with
    each nprobe setting a FILTER pr <= np — the q385 nesting trick
    applied to probes, so the three searches can never use different
    arithmetic; ranks order by the 6-dp ROUNDED cosine + id tie-break
    both engines (q62/q348 convention); hits and candidate counts are
    exact integers; recall and scan fraction are integer-count ratios
    (rule 5).

    Scale: corpus-side assignment is the broadcast argmin (q61); the
    candidate scan is a cluster_id equi-join; the np fan-out triples
    the candidate frame, never the corpus; rank windows are per
    (np, query) WindowGroupLimit heaps. Checkpoints: the candidate
    frame feeds rank + cost branches.
    """
    from pyspark.sql import Window as W

    from ...operators.ivf import ivf_index, seed_centroids, sq_l2
    from ...operators.similarity import (
        brute_force_topk,
        cosine,
        squared_norm,
    )

    # r14 (verdict #7): the layout-gated spread was TRIED here and
    # measured NO better (1.103 -> 1.164 s, min of 3 warm) — the
    # whole corpus is 2000 x 64 floats at sf0.1, so the single-task
    # fold work the spread parallelizes is cheaper than the exchange
    # it adds; the r13-disclosed 1.89 -> 2.12 "regression" does not
    # reproduce on a settled box (1.10 s at HEAD with the shuffle-free
    # assignment kept). Left unspread: at real scale the layout
    # provides the splits and the gate would make spread an identity
    # anyway.
    emb = read_table(spark, sf_dir, "embeddings")
    cents = seed_centroids(emb, 8)
    queries = emb.where(F.col("vec_id") < 3)
    exact3 = brute_force_topk(emb, queries, k=3).select(
        "query_id", "neighbor_id", F.lit(1).alias("is_exact")
    )
    idx = ivf_index(emb, cents)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        squared_norm(F.col("embedding")).alias("q_norm"),
    )
    wp = W.partitionBy("query_id").orderBy("cdist", "cluster_id")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "cdist", sq_l2(F.col("q_vec"), F.col("centroid"), dim=_DIM)
        )
        .withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= 4)
        .select("query_id", "q_vec", "q_norm", "cluster_id", "pr")
    )
    cand = (
        probes.join(idx, "cluster_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "pr",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                cosine(
                    F.col("q_vec"), F.col("embedding"),
                    F.col("q_norm"), squared_norm(F.col("embedding")),
                )
                + 1e-9,
                6,
            ).alias("cosine"),
        )
    )
    nps = spark.range(3).select(
        F.expr("cast(shiftleft(1, cast(id as int)) as bigint)").alias("np")
    ).where(F.col("np") <= 4)
    # the fanned frame feeds the rank AND cost branches — truncate
    # lineage here (one checkpoint covers the shared candidate pass)
    fanned = cand.join(
        F.broadcast(nps), F.col("pr") <= F.col("np")
    ).localCheckpoint(eager=False)
    wr = W.partitionBy("np", "query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    ranked = (
        fanned.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= 3)
        .select("np", "query_id", "neighbor_id")
    )
    hits = (
        ranked.join(F.broadcast(exact3), ["query_id", "neighbor_id"], "left")
        .groupBy("np", "query_id")
        .agg(F.count("is_exact").cast("bigint").alias("n_hits"))
    )
    cost = fanned.groupBy("np", "query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    corp = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    # q360 lesson: checkpoint-derived micro-frames carry no stats —
    # broadcast explicitly or this 9-row join plans as an SMJ
    return (
        hits.join(F.broadcast(cost), ["np", "query_id"])
        .crossJoin(F.broadcast(corp))
        .select(
            F.col("np").alias("nprobe"),
            "query_id",
            "n_hits",
            fround(F.col("n_hits").cast("double") / F.lit(3.0), 6).alias(
                "recall_at_3"
            ),
            "n_candidates",
            fround(
                F.col("n_candidates").cast("double")
                / F.col("n_corpus").cast("double"),
                6,
            ).alias("scan_fraction"),
        )
    )
