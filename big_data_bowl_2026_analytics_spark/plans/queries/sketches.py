"""Mergeable-sketch queries beyond the built-in HLL pair (q44/q147):
structures a 100 TB pipeline keeps as *columns* so monitoring never
rescans the corpus.

- q151: count-min sketch over the token stream — the mergeable
  frequency summary (heavy-hitter estimates from a fixed d x w integer
  grid). The query materializes the grid, re-estimates every vocabulary
  term through it, and pins the sketch's defining guarantee
  (estimate >= true count, always) as an oracle-checked boolean.

All hash math is the md5 instr-nibble pattern shared with the split /
sampling queries (engine-exact by q34); every cell and estimate is an
integer, so the audit needs no float tolerance at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...sources.readers import read_table
from ..registry import query
from .splits import _hash16, _hash16_sql

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_bucket_sql(j: int, key: str) -> str:
    return f"({_hash16_sql(f'cms{j}|', key)} % {_CMS_WIDTH})"


@query(
    "q151_count_min_sketch_audit",
    tags=("sketch", "llm-pipeline", "frequency"),
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS true_c
  FROM words GROUP BY tok
), hashed AS (
  SELECT tok, true_c, j,
         CASE j
           {' '.join(f"WHEN {j} THEN {_cms_bucket_sql(j, 'tok')}" for j in range(_CMS_DEPTH))}
         END AS bucket
  FROM vocab, (SELECT unnest(range({_CMS_DEPTH})) AS j)
), cells AS (
  SELECT j, bucket, CAST(sum(true_c) AS BIGINT) AS cell_total
  FROM hashed GROUP BY j, bucket
), est AS (
  SELECT h.tok, h.true_c, CAST(min(c.cell_total) AS BIGINT) AS cms_est
  FROM hashed h JOIN cells c USING (j, bucket)
  GROUP BY h.tok, h.true_c
)
SELECT tok, true_c, cms_est,
       cms_est - true_c AS overcount,
       cms_est >= true_c AS never_underestimates
FROM est
ORDER BY true_c DESC, tok
LIMIT 20
""",
)
def q151_count_min_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream, audited against exact counts.

    The sketch is a d x w grid of integer counters; each token
    increments one cell per row (md5-derived bucket), and a point
    estimate is the MIN of its d cells. Collisions only ever ADD, so
    ``estimate >= true`` deterministically — the boolean column the
    oracle hashes. The grid is 4 x 256 = 1024 cells regardless of
    corpus size, which is the whole point: per-partition grids sum
    cell-wise (mergeable), so 100 TB of shards reduce to 1024 integers
    without a vocabulary-sized shuffle.

    Scale: the exact vocabulary counts exist here only to GRADE the
    sketch (the audit needs the truth); production keeps just the
    grid. The cells frame is 1024 rows — broadcast back to the
    vocabulary for estimation, one shuffle on the token overall.
    """
    words = read_table(spark, sf_dir, "documents", ["text"]).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = words.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
    hashed = vocab.select(
        "tok",
        "true_c",
        F.posexplode(
            F.array(
                *[
                    (_hash16(f"cms{j}|", F.col("tok")) % _CMS_WIDTH).cast("int")
                    for j in range(_CMS_DEPTH)
                ]
            )
        ).alias("j", "bucket"),
    )
    cells = hashed.groupBy("j", "bucket").agg(
        F.sum("true_c").alias("cell_total")
    )
    est = (
        hashed.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("tok", "true_c")
        .agg(F.min("cell_total").alias("cms_est"))
    )
    return (
        est.select(
            "tok",
            "true_c",
            "cms_est",
            (F.col("cms_est") - F.col("true_c")).alias("overcount"),
            (F.col("cms_est") >= F.col("true_c")).alias(
                "never_underestimates"
            ),
        )
        .orderBy(F.desc("true_c"), "tok")
        .limit(20)
    )
