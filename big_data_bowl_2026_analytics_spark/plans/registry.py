"""Query registry: named engine queries paired with DuckDB oracles.

Every operator class from SURVEY.md §2 is exercised by at least one
named query over the driver's synthetic tables. A query is a
``(spark, sf_dir) -> DataFrame`` builder; its oracle is an ANSI-SQL
string DuckDB runs over the same parquet files. The driver compares
row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides,
- float aggregates are rounded identically on both sides,
- any top-k has a fully deterministic tie-break.

Queries without an oracle (``oracle=None``) are genuinely
non-SQL-expressible (iterative / stateful) and get the driver's weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryBuilder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryBuilder], QueryBuilder]:
    """Register a named query (decorator)."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


#: Explicit registry ordering for external harnesses. The driver
#: verifies the FIRST 50 registry entries per round, so the order is
#: rotated each round. Round-13 rotation (the re-certification cycle's
#: third window): the 10 round-13 additions (q420-q429) first, then
#: the 40 entries with the OLDEST driver certification (the 24-entry
#: r04 band + the oldest 16 of the r05 band), computed from the
#: CORRECTNESS_r* artifacts.
#: Every entry has a strict oracle; all pass the local strict checker
#: and driver_sim on current data. The two declared rows-only entries
#: (q28, q230) are deliberately not given window slots.
_DRIVER_ORDER = [
    "q420_kendalls_w_concordance",
    "q421_pages_l_trend",
    "q422_bowker_symmetry",
    "q423_cramer_von_mises",
    "q424_hurst_exponent",
    "q425_fleiss_kappa",
    "q426_morisita_horn_similarity",
    "q427_chain_entropy_rate",
    "q428_moods_median_test",
    "q429_pettitt_change_point",
    "q11_having_count",
    "q13_point_lookup",
    "q14_scalar_function_library",
    "q15_multikey_topk",
    "q16_distinct_projection",
    "q17_null_audit_after_left_join",
    "q18_rollup_revenue",
    "q29_cube_aggregation",
    "q45_skew_salted_aggregation",
    "q48_intersect_except",
    "q51_calibration_bins",
    "q53_string_library",
    "q56_ranking_functions",
    "q57_ordered_string_agg",
    "q58_percentiles",
    "q59_full_outer_join",
    "q69_contamination_ratio",
    "q79_grouping_sets",
    "q80_conditional_aggregates",
    "q81_correlated_scalar_subquery",
    "q87_merge_upsert",
    "q88_row_unpivot",
    "q90_snapshot_diff",
    "q95_word_entropy",
    "q116_levenshtein_neardup",
    "q117_bigram_pmi",
    "q118_sorted_neighborhood_pairs",
    "q119_key_skew_gini",
    "q120_drift_audit",
    "q121_approx_percentile_audit",
    "q122_correlation_matrix",
    "q123_triangle_count",
    "q124_lsh_blocked_levenshtein",
    "q125_pagerank",
    "q126_zorder_layout_audit",
    "q127_hash_split_assignment",
    "q128_stratified_hash_sample",
    "q129_chi_square_homogeneity",
    "q131_join_cardinality_forecast",
    "q132_bloom_filter_audit",
]


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once. load_all() forces the
    # full sweep even under BDBL_LAZY_QUERIES=1, so the registry a
    # consumer sees here is always complete.
    from . import queries

    queries.load_all()

    ordered = {
        name: _REGISTRY[name] for name in _DRIVER_ORDER if name in _REGISTRY
    }
    ordered.update(
        (name, spec) for name, spec in _REGISTRY.items() if name not in ordered
    )
    return ordered


def builders() -> dict[str, QueryBuilder]:
    return {name: spec.builder for name, spec in all_queries().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
