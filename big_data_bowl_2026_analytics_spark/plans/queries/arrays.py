"""Array / higher-order function library over the embeddings table.

The reference has no array types at all (SURVEY §1.3); this is the
engine's capability for vector-valued columns beyond the similarity
operators (q40-q42, q61-q63): elementwise lambda pipelines that stay
JVM-side (no explode, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...functions.scalar import fround
from ...sources.readers import read_table
from ..registry import query


@query(
    "q78_array_functions",
    tags=("arrays", "higher-order"),
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       embedding[1] AS first_elem,
       list_max(embedding) AS max_elem,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
             + 1e-9, 6) AS elem_sum,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
""",
)
def q78_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array pipeline per vector: size, element access,
    max, lambda-fold sum (floats cast to double BEFORE accumulating so
    the sequential fold is bit-identical across engines), and a
    lambda-filter count.

    Scale: every function is a JVM codegen expression over the array
    value in place — no Generate (explode) row blowup, no shuffle at
    all (map-only query), no Python. This is the pattern the
    similarity operators build on.
    """
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.array_max("embedding").alias("max_elem"),
        fround(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            6,
        ).alias("elem_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )
