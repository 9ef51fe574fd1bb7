"""Count-min sketch operator properties (operators/sketches.py):

1. Mergeability — grids built on disjoint halves, cell-summed, equal
   the grid built on the whole stream EXACTLY (integer algebra).
2. One-sided error — estimates never undercount, on every key.
3. q151's inline construction agrees with the operator form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl_2026_analytics_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)

SF = "/root/testdata/sf0.001"


def _words(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )


def test_merge_of_halves_equals_whole(spark):
    words = _words(spark).localCheckpoint(eager=False)
    whole = cms_build(words, "tok")
    h1 = cms_build(words.where(F.col("doc_id") % 2 == 0), "tok")
    h2 = cms_build(words.where(F.col("doc_id") % 2 == 1), "tok")
    merged = cms_merge(h1, h2)
    diff = (
        whole.join(merged, ["j", "bucket"], "full")
        .where(
            whole["cell_total"].isNull()
            | merged["cell_total"].isNull()
            | (whole["cell_total"] != merged["cell_total"])
        )
        .count()
    )
    assert diff == 0


def test_estimates_never_undercount(spark):
    words = _words(spark)
    truth = words.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
    grid = cms_build(words, "tok")
    est = cms_estimate(truth, grid, "tok")
    under = est.where(F.col("cms_est") < F.col("true_c")).count()
    assert under == 0
    # and at least one collision overcounts at this tiny width, which
    # is what makes the audit non-vacuous
    assert est.count() == truth.count()


def test_weighted_build_matches_raw_build(spark):
    words = _words(spark).localCheckpoint(eager=False)
    raw = cms_build(words, "tok")
    pre = words.groupBy("tok").agg(F.count(F.lit(1)).alias("w"))
    weighted = cms_build(pre, "tok", weight_col="w")
    diff = (
        raw.join(weighted, ["j", "bucket"], "full")
        .where(
            raw["cell_total"].isNull()
            | weighted["cell_total"].isNull()
            | (raw["cell_total"] != weighted["cell_total"])
        )
        .count()
    )
    assert diff == 0


def test_q151_registry_query_agrees_with_operator(spark):
    from big_data_bowl_2026_analytics_spark.plans import all_queries

    q = all_queries()["q151_count_min_sketch_audit"].builder(spark, SF)
    rows = {r["tok"]: r for r in q.collect()}
    words = _words(spark)
    truth = words.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
    grid = cms_build(words, "tok")
    est = {
        r["tok"]: r["cms_est"]
        for r in cms_estimate(truth, grid, "tok").collect()
    }
    for tok, r in rows.items():
        assert est[tok] == r["cms_est"]
