"""SQL front-end parity: for the dialect-portable subset of the
registry, running the ORACLE SQL text through Spark's own SQL engine
(over registered temp views) must produce the same rows as the
DataFrame builder — the 'same Catalyst plans behind both front ends'
contract from SURVEY §3."""

from __future__ import annotations

import pytest

from big_data_bowl_2026_analytics_spark.plans import all_queries
from big_data_bowl_2026_analytics_spark.sources.readers import register_views

SF = "/root/testdata/sf0.001"

# Oracle SQL written in the ANSI subset both engines parse identically.
PORTABLE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_region_nation_revenue",
    "q04_exists_semi_join",
    "q05_not_exists_anti_join",
    "q06_conditional_distinct_counts",
    "q07_argmin_per_group",
    "q10_union_all_tagged",
    "q11_having_count",
    "q12_histogram",
    "q13_point_lookup",
    "q15_multikey_topk",
    "q16_distinct_projection",
    "q29_cube_aggregation",
    "q30_dedup_exact",
    "q48_intersect_except",
]


def _norm(rows):
    # CUBE/ROLLUP rows contain NULL group keys; sort with a total key
    # that tolerates mixed None/values.
    tuples = [tuple(r) for r in rows]
    return sorted(tuples, key=repr)


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_dataframe_builder(spark, name):
    register_views(spark, SF)
    spec = all_queries()[name]
    df_rows = spec.builder(spark, SF).collect()
    sql_rows = spark.sql(spec.oracle).collect()
    assert _norm(df_rows) == _norm(sql_rows)
