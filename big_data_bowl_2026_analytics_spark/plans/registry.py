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
#: rotated each round. Round-8 rotation: the r07 window (q219-q268)
#: came back 50/50 green (q230 rows-only as declared), so those slots
#: are released. This round rotates in the next never-driver-certified
#: batch in number order: q269-q318 (fifth-session tail). Every entry
#: in this window has a strict oracle (no rows-only entries). All pass
#: the local strict checker at sf0.001/0.01/0.1 and driver_sim on
#: current data; this is certification exposure, not known bugs.
#: Remaining never-certified queries (q319-q369 + any r8 additions)
#: rotate in round 9 per CLAUDE.md.
_DRIVER_ORDER = [
    "q269_ship_sla_attainment",
    "q270_deletion_impact_report",
    "q271_retrieval_mrr_map",
    "q272_eb_shrunk_path_conversion",
    "q273_haar_energy_decomposition",
    "q274_newsvendor_stock_levels",
    "q275_feed_uptime_nines",
    "q276_consistent_hash_balance",
    "q277_heaps_law_growth",
    "q278_sku_lifecycle_census",
    "q279_shuffle_skew_forecast",
    "q280_dedup_threshold_sweep",
    "q281_storage_tiering_plan",
    "q282_quality_filter_yield",
    "q283_quality_perplexity_spearman",
    "q284_token_budget_waterfill",
    "q285_lmdi_revenue_drivers",
    "q286_queue_backlog_curve",
    "q287_order_velocity_screen",
    "q288_calendar_outlier_days",
    "q289_behavior_predictability",
    "q290_small_cell_suppression",
    "q291_good_turing_unseen_mass",
    "q292_rich_club_coefficient",
    "q293_forecast_ensemble",
    "q294_ivf_pq_index_census",
    "q295_breusch_pagan_screen",
    "q296_rapid_repeat_runs",
    "q297_new_vs_returning_revenue",
    "q298_embedding_dimension_health",
    "q299_bradley_terry_strength",
    "q300_sampling_accuracy_planner",
    "q301_single_sourcing_risk",
    "q302_hour_of_day_envelope",
    "q303_recommender_coverage_audit",
    "q304_effective_sample_size",
    "q305_substitution_screen",
    "q306_session_unicity_sweep",
    "q307_price_ending_census",
    "q308_first_order_ltv_signal",
    "q309_trade_flow_matrix",
    "q310_supplier_reliability_scorecard",
    "q311_order_consolidation",
    "q312_discount_ladder",
    "q313_returns_interaction",
    "q314_hapax_gibberish_screen",
    "q315_ivf_partition_stability",
    "q316_basket_expander_score",
    "q317_suspected_outage_hours",
    "q318_shipment_fragmentation",
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
