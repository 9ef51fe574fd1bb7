"""Set operations, JSON, string and datetime scalar libraries, and a
Python-path parity query — the general-purpose engine surface beyond
the reference's numeric core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...sources.readers import read_table
from ..registry import query


@query(
    "q48_intersect_except",
    tags=("setops",),
    oracle="""
SELECT c_custkey, 'both_segments_nations' AS src FROM (
  SELECT DISTINCT c.c_custkey
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE o.o_orderstatus = 'F'
  INTERSECT
  SELECT DISTINCT c.c_custkey
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE o.o_orderstatus = 'O'
)
UNION ALL
SELECT c_custkey, 'only_f' AS src FROM (
  SELECT DISTINCT c.c_custkey
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE o.o_orderstatus = 'F'
  EXCEPT
  SELECT DISTINCT c.c_custkey
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE o.o_orderstatus = 'O'
)
""",
)
def q48_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set semantics (beyond the reference's
    UNION-only surface): customers with both fulfilled and open orders
    vs fulfilled-only. Both compile to semi/anti join + distinct —
    no materialized set structures."""
    cust = read_table(spark, sf_dir, "customer", ["c_custkey"])
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def custs_with(status: str) -> DataFrame:
        keys = orders.where(F.col("o_orderstatus") == status)
        return cust.join(
            keys, cust.c_custkey == keys.o_custkey, "left_semi"
        ).distinct()

    f, o = custs_with("F"), custs_with("O")
    both = f.intersect(o).select("c_custkey", F.lit("both_segments_nations").alias("src"))
    only_f = f.exceptAll(o).distinct().select("c_custkey", F.lit("only_f").alias("src"))
    return both.unionByName(only_f)


@query(
    "q49_json_extraction",
    tags=("json",),
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_bucket
FROM events
""",
)
def q49_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events props column — the
    semi-structured column pattern every log pipeline needs. Spark's
    get_json_object evaluates JVM-side per row; at scale prefer
    from_json into a typed struct once, then column access (both shown
    in tests)."""
    ev = read_table(spark, sf_dir, "events", ["event_id", "props"])
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@query(
    "q53_string_library",
    tags=("string",),
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substring(c_name, 1, 8) AS name_prefix,
       concat_ws('|', c_mktsegment, c_name) AS tagged,
       replace(c_name, 'Customer', 'Cust') AS renamed,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
       length(c_name) AS name_len
FROM customer
WHERE c_name LIKE 'Customer%'
""",
)
def q53_string_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar library (upper/substring/concat_ws/replace/lpad/
    length + LIKE pushdown) — all codegen'd expressions, with the
    prefix LIKE compiled to a StartsWith scan filter."""
    cust = read_table(spark, sf_dir, "customer")
    return cust.where(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("renamed"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.length("c_name").alias("name_len"),
    )


@query(
    "q54_datetime_library",
    tags=("datetime",),
    oracle="""
SELECT o_orderkey,
       CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
       CAST(extract(month FROM o_orderdate) AS INT) AS order_month,
       CAST(extract(day FROM o_orderdate) AS INT) AS order_day,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
""",
)
def q54_datetime_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar library (extract/trunc/diff/last_day) with a
    sargable year-range predicate (explicit bounds, not
    year(col)=1996, so it pushes to the scan)."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    return orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@query(
    "q55_mapinpandas_parity",
    tags=("mapInPandas", "python-path"),
    oracle="""
SELECT doc_id,
       md5(text) AS content_md5,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
""",
)
def q55_mapinpandas_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow batch-iterator path (mapInPandas) computing values the
    JVM path also defines — hash-matched against the SQL oracle to
    prove the Python worker boundary loses nothing: same md5, same
    counts, batch-at-a-time, constant memory."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_md5": [
                        hashlib.md5(t.encode()).hexdigest() for t in pdf["text"]
                    ],
                    "n_chars": [len(t) for t in pdf["text"]],
                    "n_tokens": [len(t.split(" ")) for t in pdf["text"]],
                }
            )

    return docs.mapInPandas(
        per_batch, schema="doc_id long, content_md5 string, n_chars long, n_tokens long"
    )
