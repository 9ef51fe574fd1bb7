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
#: rotated each round. Round-9 rotation: the r08 window (q269-q318)
#: came back 50/50 strict-green, so those slots are released. This
#: round rotates in the oldest never-driver-certified batch in number
#: order: q319-q368. Every entry in this window has a strict oracle
#: (no rows-only entries). All pass the local strict checker at
#: sf0.001/0.01/0.1 and driver_sim on current data; this is
#: certification exposure, not known bugs. Remaining never-certified
#: queries (q369-q379 + any r9 additions) rotate in round 10 per
#: CLAUDE.md.
_DRIVER_ORDER = [
    "q319_assortment_breadth_trend",
    "q320_winnowing_fingerprints",
    "q321_shapley_attribution",
    "q322_cooks_distance_screen",
    "q323_kendall_tau",
    "q324_link_prediction",
    "q325_logrank_test",
    "q326_ttl_cache_planner",
    "q327_hilbert_layout_audit",
    "q328_cuped_adjustment",
    "q329_policy_replay_eval",
    "q330_matryoshka_truncation_recall",
    "q331_boosted_stumps",
    "q332_pca_2x2_closed_form",
    "q333_ransac_line_fit",
    "q334_ewma_control_chart",
    "q335_overdispersion_audit",
    "q336_broadcast_planner",
    "q337_theil_decomposition",
    "q338_cohort_ltv_triangle",
    "q339_mutual_nearest_neighbors",
    "q340_wasserstein_source_drift",
    "q341_revenue_recognition",
    "q342_sprt_return_rate_monitor",
    "q343_hamilton_sampling_allocation",
    "q344_negative_sampling_plan",
    "q345_novel_trigram_rate",
    "q346_neardup_evidence_pairs",
    "q347_hill_tail_index",
    "q348_wilson_lower_bound",
    "q349_matched_cohort_uplift",
    "q350_bfs_hop_profile",
    "q351_encoding_advisor",
    "q352_safety_stock_planner",
    "q353_transition_predictability",
    "q354_vocab_source_upset",
    "q355_ot_transport_plan",
    "q356_triangle_bound_audit",
    "q357_filter_attribution_audit",
    "q358_erlang_staffing_planner",
    "q359_price_elasticity",
    "q360_service_level_backtest",
    "q361_functional_dependency_audit",
    "q362_markov_stationary_mix",
    "q363_empirical_bayes_shrinkage",
    "q364_hard_negative_mining",
    "q365_double_sweep_diameter",
    "q366_raking_ipf_plan",
    "q367_vocabulary_richness",
    "q368_slo_burn_rate_alerts",
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
