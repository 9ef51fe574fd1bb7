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
#: rotated each round. Round-4 rotation, in priority order:
#: 1. The 31 queries whose only driver-green row is round 1, i.e.
#:    certified on the PRE-regeneration testdata (q01-q11, q13-q18,
#:    q29, q45, q48, q53, q56-q59, q79-q81, q87, q88, q90). All pass
#:    the local strict checker + driver_sim on current data; this is
#:    exposure debt, not a known bug — but r02 proved regeneration can
#:    silently break r01-green queries, so re-certify.
#: 2. Queries CHANGED in round 4 (q113 MAD=0 guard, q114 scale
#:    refactor, q28 self-validating objective column, q52/q51 scoring
#:    path, q110 sign-of-zero class, q42/q62 index amortization).
#: 3. Watch slots: first-driver-round r3 queries and the HUGEINT
#:    class (q69/q95) — newly derived doubles are the riskiest class
#:    under testdata regeneration (CLAUDE.md footguns 8/9).
#: Everything else was driver-green in r02/r03 on current data.
_DRIVER_ORDER = [
    # 1. r01-only greens: re-certify on regenerated testdata
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_region_nation_revenue",
    "q04_exists_semi_join",
    "q05_not_exists_anti_join",
    "q06_conditional_distinct_counts",
    "q07_argmin_per_group",
    "q08_pivot_returnflag",
    "q09_first_last_per_group",
    "q10_union_all_tagged",
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
    "q53_string_library",
    "q56_ranking_functions",
    "q57_ordered_string_agg",
    "q58_percentiles",
    "q59_full_outer_join",
    "q79_grouping_sets",
    "q80_conditional_aggregates",
    "q81_correlated_scalar_subquery",
    "q87_merge_upsert",
    "q88_row_unpivot",
    "q90_snapshot_diff",
    # 2. changed in round 4
    "q113_robust_zscore",
    "q114_prefix_filter_jaccard",
    "q28_changepoint_detection",
    "q52_binary_metrics",
    "q51_calibration_bins",
    "q110_rolling_regression",
    "q42_ann_topk_lsh",
    "q62_ivf_topk",
    # 3. watch: first-driver-round r3 queries + HUGEINT class
    "q104_weighted_bernoulli_sample",
    "q105_interval_overlap_join",
    "q106_scd2_history",
    "q107_bpe_pair_counts",
    "q108_vocab_oov_rate",
    "q109_heavy_hitters",
    "q111_minhash_estimate_error",
    "q112_winsorize",
    "q115_expectation_audit",
    "q69_contamination_ratio",
    "q95_word_entropy",
]


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once.
    from . import queries  # noqa: F401

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
