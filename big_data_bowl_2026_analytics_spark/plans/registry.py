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
#: rotated each round. Round-7 rotation: the r06 window (q168-q218)
#: came back 50/50 green, so those slots are released. This round
#: rotates in the next never-driver-certified batch in number order:
#: q219-q268 (fourth-session tail + fifth-session head). All pass the
#: local strict checker at sf0.001/0.01/0.1 and driver_sim on current
#: data; this is certification exposure, not known bugs. Note q230
#: (isotonic/PAV) is a declared no-oracle entry (rows-only driver
#: check; sequential pooling is not SQL-expressible — KKT invariants
#: + cross-algorithm hypothesis tests stand in). Remaining
#: never-certified queries (q269-q346, 78 queries) rotate in over
#: rounds 8-9 per CLAUDE.md.
_DRIVER_ORDER = [
    "q219_bpe_merge_step",
    "q220_span_corruption_plan",
    "q221_sliding_window_chunks",
    "q222_class_balance_weights",
    "q223_stratified_kfold_plan",
    "q224_length_bucketed_batching",
    "q225_capture_recapture",
    "q226_lift_gains_table",
    "q227_model_ks_separation",
    "q228_randomization_test",
    "q229_mann_kendall_trend",
    "q230_isotonic_calibration",
    "q231_peak_concurrency",
    "q232_price_index",
    "q233_growth_accounting",
    "q234_langid_confusion",
    "q235_pinball_loss",
    "q236_item_item_cf",
    "q237_grid_density_clusters",
    "q238_bm25_retrieval",
    "q239_sequence_pattern_mining",
    "q240_brier_decomposition",
    "q241_kcore_profile",
    "q242_jl_projection_distortion",
    "q243_tokenizer_fertility",
    "q244_session_path_topk",
    "q245_target_encoding_loo",
    "q246_cross_correlation",
    "q247_bootstrap_auc_ci",
    "q248_local_clustering",
    "q249_simpson_paradox_screen",
    "q250_product_quantization",
    "q251_pq_adc_recall",
    "q252_hierarchical_percentiles",
    "q253_business_day_normalization",
    "q254_markov_attribution",
    "q255_behavioral_user_similarity",
    "q256_abc_xyz_matrix",
    "q257_grid_quantile_regression",
    "q258_dedup_cluster_conflicts",
    "q259_kwic_snippets",
    "q260_popularity_recommender_backtest",
    "q261_difference_in_differences",
    "q262_source_ablation_diversity",
    "q263_peak_detection",
    "q264_price_volume_mix",
    "q265_dedup_savings_report",
    "q266_customer_feature_assembly",
    "q267_lsh_1nn_label_coherence",
    "q268_friedman_dow_test",
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
