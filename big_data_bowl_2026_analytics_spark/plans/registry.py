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
#: rotated each round. Round-3 rotation, in priority order:
#: 1. The 16 red/err rows from CORRECTNESS_r02 (all but q69/q95 were
#:    the events TIMESTAMP(NANOS)->TIMESTAMP(MICROS) regeneration
#:    breaking read_table; q69/q95 were DuckDB HUGEINT->float64 vs
#:    Spark bigint hash-kind mismatches) — re-verify the fixes first.
#: 2. The 5 queries no driver round ever sampled.
#: 3. r01-green queries NOT re-verified since: the testdata was
#:    regenerated before r02, so r01 rows certify the OLD data —
#:    events-readers first (their read path changed), then the rest
#:    until the 50-slot window fills. Remaining r01-only greens
#:    (q10/q11/q13/q14/q15/q16/q17/q18/q29/q45/q48/q53/q59/q79/q80/
#:    q81/q87/q88/q90) rotate in next round.
_DRIVER_ORDER = [
    # 1. CORRECTNESS_r02 red/err rows
    "q82_variant_shred",
    "q21_lag_delta",
    "q22_rebase_time_axis",
    "q24_sessionization",
    "q25_tumbling_window_hourly",
    "q26_daily_active_users",
    "q27_session_window_native",
    "q28_changepoint_detection",
    "q46_asof_join",
    "q47_range_join_bucketed",
    "q64_hierarchical_rollup",
    "q65_trailing_hour_window",
    "q69_contamination_ratio",
    "q84_window_navigation",
    "q95_word_entropy",
    "q100_asof_forward",
    # 2. never sampled by any driver round (q104-q109 are new in r3)
    "q101_unigram_logprob",
    "q99_salted_join",
    "q103_incremental_agg",
    "q102_ewm_decay",
    "q20_running_total",
    "q104_weighted_bernoulli_sample",
    "q105_interval_overlap_join",
    "q106_scd2_history",
    "q107_bpe_pair_counts",
    "q108_vocab_oov_rate",
    "q109_heavy_hitters",
    "q110_rolling_regression",
    "q111_minhash_estimate_error",
    "q112_winsorize",
    "q113_robust_zscore",
    "q114_prefix_filter_jaccard",
    "q115_expectation_audit",
    # 3a. r01-only green, reads events (read path changed this round)
    "q83_map_functions",
    "q70_gap_fill_locf",
    "q74_funnel_conversion",
    "q12_histogram",
    "q19_angle_geometry_library",
    "q89_cohort_retention",
    "q49_json_extraction",
    # 3b. r01-only green, regenerated-data re-certification
    "q78_array_functions",
    "q50_model_scoring_udf",
    "q51_calibration_bins",
    "q52_binary_metrics",
    "q71_hash_split",
    "q72_stats_moments",
    "q73_column_profile",
    "q75_histogram_bins",
    "q76_group_sample",
    "q77_zorder_layout",
    # (q56-q58, q01-q09 pushed past the 50-slot window by the twelve
    # new r3 queries; they rotate next round with the rest of 3b.)
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
