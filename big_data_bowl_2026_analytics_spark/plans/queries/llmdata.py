"""LLM training-data pipeline queries beyond the reference's surface:
cross-document boilerplate removal, sequence packing into fixed
context windows, domain-mixture weights, and word-entropy quality —
each held to a strict DuckDB oracle on the synthetic ``documents``
table (the packing oracle is a recursive CTE replaying the same
greedy next-fit recurrence the Arrow-grouped operator runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators.packing import pack_sequences
from ...operators.textstats import (
    boilerplate_ngram_stats,
    domain_mixing_weights,
    word_entropy,
)
from ...sources.readers import read_table
from ..registry import query

#: context-window capacity for the packing query (tokens). Documents
#: here run ~30-80 tokens, so 128 yields multi-document bins with
#: occasional rollover — both branches of the recurrence exercised.
_PACK_CAPACITY = 128


@query(
    "q92_boilerplate_ngrams",
    tags=("text", "dedup", "llm-pipeline"),
    oracle="""
WITH grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]
         ))) AS sh
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), hot AS (
  SELECT sh FROM grams GROUP BY sh HAVING count(DISTINCT doc_id) >= 4
), per_doc AS (
  SELECT doc_id, count(*) AS n_shingles FROM grams GROUP BY doc_id
), boil AS (
  SELECT g.doc_id, count(*) AS nb FROM grams g JOIN hot USING (sh) GROUP BY g.doc_id
)
SELECT p.doc_id,
       p.n_shingles,
       CAST(coalesce(b.nb, 0) AS BIGINT) AS n_boilerplate,
       round(coalesce(b.nb, 0) * 1.0 / p.n_shingles + 1e-9, 6) AS boilerplate_frac
FROM per_doc p LEFT JOIN boil b USING (doc_id)
""",
)
def q92_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate: distinct word 3-grams occurring in
    >= 4 documents, reported as a per-document contamination
    fraction — the exact-substring dedup signal an LLM pipeline
    applies before near-dup (the hot-gram set broadcasts back,
    so the exploded grams shuffle once)."""
    return boilerplate_ngram_stats(
        read_table(spark, sf_dir, "documents"), n=3, min_docs=4
    )


@query(
    "q93_sequence_packing",
    tags=("llm-pipeline", "stateful"),
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT source, doc_id,
         least(len(string_split(text, ' ')), {_PACK_CAPACITY}) AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), pack AS (
  SELECT source, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_offset,
         n_tokens AS fill
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN p.fill + t.n_tokens > {_PACK_CAPACITY}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + t.n_tokens > {_PACK_CAPACITY}
              THEN 0 ELSE p.fill END,
         CASE WHEN p.fill + t.n_tokens > {_PACK_CAPACITY}
              THEN t.n_tokens ELSE p.fill + t.n_tokens END
  FROM toks t JOIN pack p ON t.source = p.source AND t.rn = p.rn + 1
)
SELECT doc_id, source, n_tokens, bin_id, bin_offset FROM pack
""",
)
def q93_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit packing of each source's documents (doc_id
    order) into 128-token context windows — the custom sequential
    operator as one applyInPandas group per stream, parallel across
    streams; the oracle replays the identical recurrence as a
    recursive CTE, making the stateful operator exactly checkable."""
    docs = read_table(spark, sf_dir, "documents")
    with_toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_sequences(
        with_toks, capacity=_PACK_CAPACITY, id_col="doc_id",
        stream_col="source", tokens_col="n_tokens",
    )


@query(
    "q94_domain_mixing_weights",
    tags=("llm-pipeline", "aggregation"),
    oracle="""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), totals AS (
  SELECT sum(n_tokens) AS tot, count(*) AS n_sources FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(n_tokens * 1.0 / tot + 1e-9, 6) AS token_share,
       round(tot * 1.0 / (n_sources * n_tokens) + 1e-9, 6) AS mix_weight
FROM per_src CROSS JOIN totals
""",
)
def q94_domain_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights rebalancing toward a uniform token
    budget per source (domain-mixture step): one groupBy plus a
    broadcast one-row cross join."""
    return domain_mixing_weights(read_table(spark, sf_dir, "documents"))


@query(
    "q95_word_entropy",
    tags=("text", "quality", "llm-pipeline"),
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), counts AS (
  SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
)
SELECT doc_id,
       sum(c) AS n_words,
       count(*) AS n_distinct_words,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c) + 1e-9, 6) AS entropy_nats
FROM counts
GROUP BY doc_id
""",
)
def q95_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's word distribution (nats):
    repetitive/templated text scores low and drops out before
    training. Integer counts shuffle with map-side combine; the log
    algebra runs on the reduced per-word-count frame."""
    return word_entropy(read_table(spark, sf_dir, "documents"))
