"""Python UDTF parity with the native chunker + Observation API
(pipeline metrics without an extra pass)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.functions.udtf import ChunkDocument
from big_data_bowl_2026_analytics_spark.plans import all_queries
from big_data_bowl_2026_analytics_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def test_udtf_matches_native_chunker(spark):
    docs = read_table(spark, SF, "documents", ["doc_id", "text"]).limit(50)
    spark.udtf.register("chunk_document", ChunkDocument)
    docs.createOrReplaceTempView("docs_udtf_test")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.start,
               length(c.chunk) AS chunk_len, md5(c.chunk) AS chunk_hash
        FROM docs_udtf_test d,
             LATERAL chunk_document(d.text, 100, 80) c
        """
    )
    native = (
        all_queries()["q86_text_chunking"]
        .builder(spark, SF)
        .join(docs.select("doc_id"), "doc_id")  # same 50-doc subset
    )
    a = sorted(tuple(r) for r in via_udtf.collect())
    b = sorted(tuple(r) for r in native.collect())
    assert a == b and len(a) > 50


def test_observation_metrics_single_pass(spark):
    # production pipelines attach audit counters to the frame itself —
    # metrics arrive with the action, no second scan
    li = read_table(spark, SF, "lineitem", ["l_quantity", "l_extendedprice"])
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum("l_extendedprice").alias("revenue"),
        F.count_if(F.col("l_quantity") <= 0).alias("bad_qty"),
    )
    n_rows = observed.count()
    got = obs.get
    assert got["n"] == n_rows
    assert got["bad_qty"] == 0
    assert got["revenue"] > 0
