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


@query(
    "q82_variant_shred",
    tags=("semistructured", "variant"),
    oracle="""
WITH agg AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
              AS BIGINT) AS sum_k,
         max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
  FROM events
  GROUP BY event_type
)
SELECT event_type, n, sum_k, max_k,
       floor(sum_k * 10000.0 / n + 0.5) / 10000.0 AS avg_k
FROM agg
""",
)
def q82_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured pipeline through the VARIANT type: parse_json
    once into the binary variant encoding, shred typed fields with
    variant_get, aggregate — the open-lakehouse answer to schemaless
    columns (vs q49's per-path get_json_object string re-parsing).

    Cross-engine exactness (round-1 driver hash mismatch, VERDICT #1):
    the field is extracted AS STRING on both engines (variant_get
    'string' here, json_extract_string in the oracle) and converted
    with a plain SQL try_cast, so JSON-type coercion rules never
    differ; all aggregates are bigint (engine-exact), and avg_k is
    derived from them in an outer projection using only IEEE ops
    (mul/div/floor — floor(x*1e4+0.5)/1e4 == HALF_UP to 4 places),
    so no engine's round() implementation is in the loop. sum_k*1e4
    stays exact in double below 2^53, i.e. sum_k < ~9e11 — far above
    any SF here.

    Scale: parse_json runs once per row map-side and variant_get reads
    the binary encoding without re-parsing text; with variant shredding
    in the storage layer the `$.k` path would come straight from
    column statistics.
    """
    ev = read_table(spark, sf_dir, "events", ["event_type", "props"])
    k = F.variant_get(F.parse_json("props"), "$.k", "string").try_cast("bigint")
    agg = (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )
    avg_k = (
        F.floor(F.col("sum_k") * F.lit(10000.0) / F.col("n") + F.lit(0.5))
        / F.lit(10000.0)
    )
    return agg.select(
        "event_type", "n", "sum_k", "max_k", avg_k.alias("avg_k")
    )


@query(
    "q83_map_functions",
    tags=("maps", "collect"),
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_types,
       '{' || string_agg('"' || event_type || '":' || n, ','
                         ORDER BY event_type) || '}' AS type_counts_json
FROM counts GROUP BY user_id
""",
)
def q83_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction and rendering: per-user event-type counts
    assembled into a map column (map_from_entries over a sorted entry
    array — collect_list order is nondeterministic, the sort fixes it)
    and emitted as canonical JSON. The oracle builds the same JSON by
    ordered string aggregation — proving the map's entry set, not an
    engine-internal layout.

    Scale: two stacked aggregations on compatible keys ((user, type)
    then user); the map lives only in the final projection — grouping
    state stays scalar.
    """
    ev = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    entries = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return entries.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.to_json("m").alias("type_counts_json"),
    )
