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
#: rotated each round. Round-12 rotation (the re-certification cycle's
#: second window): the 10 round-12 additions (q410-q419) first, then
#: the 40 entries with the OLDEST driver certification (last green in
#: CORRECTNESS_r03/r04), computed from the CORRECTNESS_r* artifacts.
#: Every entry has a strict oracle; all pass the local strict checker
#: and driver_sim on current data. The two declared rows-only entries
#: (q28, q230) are deliberately not given window slots.
_DRIVER_ORDER = [
    "q410_inter_doc_ngram_dup",
    "q411_runs_test_randomness",
    "q412_allan_variance",
    "q413_km_greenwood_bands",
    "q414_cliffs_delta",
    "q415_seasonal_mann_kendall",
    "q416_personalized_pagerank",
    "q417_siegel_repeated_medians",
    "q418_ljung_box",
    "q419_theil_decomposition",
    "q100_asof_forward",
    "q101_unigram_logprob",
    "q102_ewm_decay",
    "q103_incremental_agg",
    "q65_trailing_hour_window",
    "q70_gap_fill_locf",
    "q71_hash_split",
    "q72_stats_moments",
    "q73_column_profile",
    "q74_funnel_conversion",
    "q75_histogram_bins",
    "q76_group_sample",
    "q77_zorder_layout",
    "q78_array_functions",
    "q82_variant_shred",
    "q83_map_functions",
    "q84_window_navigation",
    "q89_cohort_retention",
    "q99_salted_join",
    "q02_top_revenue_orders",
    "q03_region_nation_revenue",
    "q04_exists_semi_join",
    "q05_not_exists_anti_join",
    "q06_conditional_distinct_counts",
    "q07_argmin_per_group",
    "q08_pivot_returnflag",
    "q09_first_last_per_group",
    "q104_weighted_bernoulli_sample",
    "q105_interval_overlap_join",
    "q106_scd2_history",
    "q107_bpe_pair_counts",
    "q108_vocab_oov_rate",
    "q109_heavy_hitters",
    "q10_union_all_tagged",
    "q110_rolling_regression",
    "q111_minhash_estimate_error",
    "q112_winsorize",
    "q113_robust_zscore",
    "q114_prefix_filter_jaccard",
    "q115_expectation_audit",
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
