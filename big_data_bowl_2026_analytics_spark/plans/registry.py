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
#: rotated each round. Round-6 rotation: the r05 window (q116-q167)
#: came back 50/50 green — the first perfect window — so those slots
#: are released. This round rotates in the next never-driver-certified
#: batch in number order: q168-q199 (third-session tail) plus
#: q200-q218 (fourth-session head; no q202 exists). All pass the
#: local strict checker at sf0.001/0.01/0.1 and driver_sim on current
#: data; this is certification exposure, not known bugs. Remaining
#: never-certified queries (q219-q339, 121 queries) rotate in over
#: rounds 7-9 per CLAUDE.md.
_DRIVER_ORDER = [
    "q168_ivf_balance_audit",
    "q169_embedding_quality_audit",
    "q170_encoding_audit",
    "q171_order_total_consistency",
    "q172_vocab_coverage_curve",
    "q173_seasonal_naive_backtest",
    "q174_psi_score_stability",
    "q175_association_rules",
    "q176_quantile_transform",
    "q177_ab_test_welch",
    "q178_lsh_recall_audit",
    "q179_component_size_distribution",
    "q180_last_touch_attribution",
    "q181_hll_intersection_estimate",
    "q182_point_in_time_join",
    "q183_labeler_agreement_kappa",
    "q184_conformal_calibration",
    "q185_split_leakage_audit",
    "q186_woe_information_value",
    "q187_anova_decomposition",
    "q188_decision_stump",
    "q189_ndcg_retrieval_audit",
    "q190_outlier_method_agreement",
    "q191_cusum_control_chart",
    "q192_market_concentration",
    "q193_hierarchical_shares",
    "q194_poisson_goodness_of_fit",
    "q195_calendar_completeness",
    "q196_near_duplicate_transactions",
    "q197_retention_half_life",
    "q198_period_over_period",
    "q199_abc_classification",
    "q200_benford_first_digit",
    "q201_kaplan_meier",
    "q203_autocorrelation",
    "q204_normal_equation_ols",
    "q205_record_linkage_scores",
    "q206_grid_nearest_neighbor",
    "q207_poisson_bootstrap_ci",
    "q208_temperature_mixture",
    "q209_position_attribution",
    "q210_skyline_pareto_front",
    "q211_mann_whitney_pairs",
    "q212_bh_fdr_correction",
    "q213_seasonal_decomposition",
    "q214_theil_sen_trend",
    "q215_degree_assortativity",
    "q216_interevent_burstiness",
    "q217_rfm_segmentation",
    "q218_pareto_knee",
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
