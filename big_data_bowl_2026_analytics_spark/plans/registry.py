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
#: rotated each round. Round-11 rotation: the r10 window came back
#: 50/50 strict-green and the never-certified backlog is CLEARED, so
#: this window starts the re-certification cycle the r10 verdict asked
#: for: the 10 round-11 additions (q400-q409) first, then the 40
#: entries with the OLDEST driver certification (last green in
#: CORRECTNESS_r02/r03 — the band never re-run since the testdata
#: regenerations), computed from the CORRECTNESS_r* artifacts. Every
#: entry has a strict oracle; all pass the local strict checker and
#: driver_sim on current data. The two declared rows-only entries
#: (q28, q230) are deliberately not given window slots.
_DRIVER_ORDER = [
    "q400_viterbi_regime_decode",
    "q401_page_hinkley_drift",
    "q402_sprt_sequential_ab",
    "q403_shift_share_decomposition",
    "q404_benford_second_digit",
    "q405_cuped_adjusted_ab",
    "q406_sampling_design_effect",
    "q407_kruskal_wallis",
    "q408_cochran_armitage_trend",
    "q409_jonckheere_terpstra",
    "q23_linear_interpolation",
    "q31_minhash_signatures",
    "q33_jaccard_similar_pairs",
    "q34_simhash",
    "q35_language_id",
    "q36_text_quality",
    "q37_token_stats",
    "q38_shingle_fingerprint",
    "q39_multimodal_blob_metadata",
    "q41_ann_lsh_buckets",
    "q43_embedding_stats",
    "q44_approx_count_distinct",
    "q54_datetime_library",
    "q55_mapinpandas_parity",
    "q60_dedup_connected_components",
    "q61_ivf_assignments",
    "q63_embedding_neardup",
    "q66_tfidf_top_terms",
    "q67_repetition_ratio",
    "q68_regex_token_patterns",
    "q85_fuzzy_match_blocked",
    "q86_text_chunking",
    "q91_dedup_cc_star",
    "q92_boilerplate_ngrams",
    "q93_sequence_packing",
    "q94_domain_mixing_weights",
    "q96_approx_percentile_bound",
    "q97_pii_redaction",
    "q98_dedup_survivors",
    "q12_histogram",
    "q19_angle_geometry_library",
    "q20_running_total",
    "q21_lag_delta",
    "q22_rebase_time_axis",
    "q26_daily_active_users",
    "q27_session_window_native",
    "q46_asof_join",
    "q47_range_join_bucketed",
    "q49_json_extraction",
    "q64_hierarchical_rollup",
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
