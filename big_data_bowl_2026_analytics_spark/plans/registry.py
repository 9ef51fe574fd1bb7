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
#: rotated each round. Round-5 rotation: the r04 window (31 r01-only
#: re-certifications + round-4-changed + watch slots) came back 49/50
#: green (q28 is the declared no-oracle row), so those slots are
#: released. This round rotates in the oldest never-driver-certified
#: batch: q116-q150 (33 queries, round-4 first/second session) plus
#: the head of the third-session batch (q151-q167). All pass the
#: local strict checker at sf0.001/0.01/0.1 and driver_sim on current
#: data; this is certification exposure, not known bugs. Remaining
#: never-certified queries (q168-q199 tail, q200-q235, q236-q319)
#: rotate in over rounds 6-9 per CLAUDE.md.
_DRIVER_ORDER = [
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
    "q133_containment_pairs",
    "q134_mixture_rebalance",
    "q136_partition_size_planner",
    "q137_idf_weighted_jaccard",
    "q138_event_transition_matrix",
    "q139_community_modularity",
    "q140_ann_topk_multitable",
    "q141_inverted_index",
    "q142_ann_recall_audit",
    "q143_int8_quantization_audit",
    "q144_spend_quintile_mobility",
    "q145_weighted_median_grouped_agg",
    "q146_rolling_distinct_users",
    "q147_hll_sketch_merge",
    "q148_join_preserving_pseudonymization",
    "q149_laplace_noisy_counts",
    "q150_per_slice_metrics",
    "q151_count_min_sketch_audit",
    "q152_k_anonymity_audit",
    "q153_horvitz_thompson_audit",
    "q154_decontamination_span_removal",
    "q155_m4_downsampling",
    "q156_reciprocal_rank_fusion",
    "q157_diversity_capped_topk",
    "q158_bigram_perplexity",
    "q159_out_of_order_audit",
    "q160_mutual_information_screen",
    "q161_label_centroid_separation",
    "q162_event_dedup_audit",
    "q163_zipf_law_audit",
    "q164_cross_source_duplication",
    "q165_ks_drift_per_source",
    "q166_referential_integrity",
    "q167_funnel_latency",
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
