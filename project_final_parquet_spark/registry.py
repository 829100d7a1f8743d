"""Query registry — the single source of truth for the driver contract.

Every operator the engine claims is registered here via the ``@query``
decorator, pairing a (spark, sf_dir) -> DataFrame callable with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables. The
driver hash-compares both at sf0.01 (CORRECTNESS gate), so the pair must
agree on column NAMES and VALUES exactly.

Cross-engine determinism conventions (applied in both the Spark code and
the oracle SQL; deviations are bugs):

1.  Alias every computed column identically on both sides.
2.  Double aggregation: per-row arithmetic stays in IEEE double (bit-
    identical across engines), but the SUM is done in DECIMAL(38,10)
    (exact, order-independent) and cast back to double:
    Spark  ``F.sum(expr.cast("decimal(38,10)")).cast("double")``
    DuckDB ``CAST(SUM(CAST(expr AS DECIMAL(38,10))) AS DOUBLE)``
    AVG = decimal-sum / count (double division is deterministic).
3.  Integer aggregates: cast to BIGINT in SQL (DuckDB SUM(int) is
    HUGEINT, Spark's is long).
4.  Timestamps are TIMESTAMP_NTZ on the Spark side (matches DuckDB's
    naive timestamps); events.ts is truncated to microseconds by the
    loader.
5.  Any LIMIT/top-k is preceded by a TOTAL ordering (unique tiebreaker
    column included).

Contract note — iterative queries (dedup_cluster_components, ml_kmeans,
embeddings_top_eigenvector, events_markov_stationary) truncate lineage
with eager localCheckpoint each round, so calling their query function
EXECUTES the iterations at construction time; the returned DataFrame is
the (cheap) final aggregation over materialized state. Every other
query returns a fully lazy plan.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a driver-visible query named ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


# The driver's per-round CORRECTNESS gate covers the FIRST 50 registered
# queries, so exposure order is rotated each round: queries without a
# prior driver-green row lead, driver-green queries refill the window.
# Explicit list (not import order — transitive module imports would
# scramble it).
#
# Round-4 window (positions 1-50) — closes the full-registry union:
#   1     text_inverted_index — round 3's only red row, re-gated with the
#         array→string output fix (postings_head serialized)
#   2     dedup_cluster_components — re-gate: implementation swapped to
#         the convergence-detecting form in round 3 (r1-green under the
#         fixed-iteration form; driver evidence must attach to the swap)
#   3-43  the 41 queries never driver-gated across r1-r3
#         (CORRECTNESS_r0{1,2,3}.json union = 149 names; registry = 190)
#   44-50 refills: driver-green anchors re-gated for freshness.
# tests/test_registry_lint.py::test_round4_window_closes_registry_union
# mechanically asserts the window ⊇ never-gated ∪ re-gates.
_GATE_FIRST = [
    "text_inverted_index",
    "dedup_cluster_components",
    # never gated in r1-r3: r3-window overflow (positions 51-74 last round)
    "events_asof_nearest",
    "text_bigram_stats",
    "events_user_rfm",
    "ml_cluster_purity",
    "events_winsorized_stats",
    "events_time_weighted_avg",
    "basket_part_pairs",
    "ivm_merge_agg",
    "sql_text_frontend",
    "q64_groupwise_ols",
    "events_quantile_normalize",
    "events_longest_streak",
    "pipeline_e2e_pretrain",
    "events_abtest_lift",
    "sim_matryoshka_prefix",
    "events_active_users",
    "events_seasonality_profile",
    "text_prefix_autocomplete",
    "events_pareto_concentration",
    "q65_excess_share_suppliers",
    "q66_waiting_suppliers",
    "q67_dormant_rich_accounts",
    "events_sessionize",
    "events_rolling_distinct",
    # never gated: round-3 additions
    "pack_sequences",
    "curriculum_order",
    "scd2_point_in_time_join",
    "text_boilerplate_ngrams",
    "text_bpe_merge_pairs",
    "events_ewma",
    "q68_revenue_mom_change",
    "embeddings_norm_audit",
    "q69_variant_shred",
    "src_federated_union",
    "bootstrap_token_stats",
    "sim_pq_trained",
    "dedup_semantic",
    "src_bucketed_join",
    "sample_weighted_reservoir",
    "snapshot_diff",
    "stream_custom_state",
    # round-4 additions (new this round, gated immediately)
    "mm_real_decode_stats",
    # refills (driver-green r1 anchors, one per major family)
    "q1_pricing_summary",
    "dedup_exact",
    "dedup_near_minhash_lsh",
    "sim_topk_cosine",
    "ml_kmeans",
    "enc_roundtrip_agg",
    # --- end of round-4 window (50) ---
    # ROUND-5 QUEUE: queries added after the round-4 window froze; they
    # lead round 5's rotation (tests/test_registry_lint.py knows them).
    "sample_temperature_mix",
    "events_funnel_windowed",
    "cdc_merge_on_read",
    "text_tfidf_topterms",
    "embeddings_dim_stats",
    "events_user_path_topk",
    "dq_freshness_by_type",
    "text_cooccurrence_lift",
    "sim_knn_graph",
    "layout_compaction_plan",
    "text_quality_gate",
    "embeddings_top_eigenvector",
    "q70_recursive_org_rollup",
    "src_reffile_datasource",
    "events_heatmap_dow_hour",
    "text_chunk_dedup",
    "orders_backlog_timeseries",
    "sim_ivf_pq",
    "events_markov_stationary",
    # round-3 window names (all driver-green in CORRECTNESS_r03) follow so
    # their ordering stays deterministic; the rest of the registry trails
    # in registration order via _ordered().
    "q56_decimal_exact",
    "q57_interval_arith",
    "q58_string_agg",
    "split_train_val_test",
    "text_oov_rate",
    "upsert_snapshot",
    "events_rollup_multigrain",
    "q59_stat_moments",
    "events_funnel",
    "events_cohort_retention",
    "events_transitions",
    "q60_try_funcs",
    "q61_struct_explode",
    "events_gap_fill",
    "dedup_fuzzy_levenshtein",
    "sim_random_projection",
    "text_rare_token_score",
    "events_anomaly_zscore",
    "udaf_grouped_pandas",
    "sim_pq_adc",
    "text_bm25_rank",
    "stream_static_enrich",
    "dedup_canonicalize",
    "layout_zorder_stats",
    "graph_pagerank",
    "profile_table",
    "sample_rebalance_classes",
    "dedup_eval_recall",
    "events_percentiles_exact",
    "events_rolling_1h",
    "scd2_build",
    "text_source_divergence",
    "text_vocab_coverage",
    "events_value_histogram",
    "enc_key_rotation",
    "mm_arrow_features",
    "events_attribution_last_touch",
    "events_value_deciles",
    "sim_binary_quant",
    "udtf_token_positions",
    "cdc_tombstone_merge",
    "sim_ivf_multiprobe",
    "src_json_corrupt_records",
    "q62_nested_order_lines",
    "q63_hll_sketch_union",
    "sample_negatives",
    "dq_constraint_checks",
    "dedup_containment",
    "events_late_data_metrics",
]

# Names registered after the round-4 gate window froze: they sit at
# positions 51+ (never-gated is unavoidable for in-round additions once
# the 50-slot window is spoken for) and MUST lead the round-5 window.
ROUND5_QUEUE = [
    "sample_temperature_mix",
    "events_funnel_windowed",
    "cdc_merge_on_read",
    "text_tfidf_topterms",
    "embeddings_dim_stats",
    "events_user_path_topk",
    "dq_freshness_by_type",
    "text_cooccurrence_lift",
    "sim_knn_graph",
    "layout_compaction_plan",
    "text_quality_gate",
    "embeddings_top_eigenvector",
    "q70_recursive_org_rollup",
    "src_reffile_datasource",
    "events_heatmap_dow_hour",
    "text_chunk_dedup",
    "orders_backlog_timeseries",
    "sim_ivf_pq",
    "events_markov_stationary",
]


def _ordered() -> dict[str, RegisteredQuery]:
    _load_all()
    # Loud on drift: a typo/renamed entry here would silently shift the
    # 50-query gate window and un-gate queries the rotation plan assumes
    # are covered.
    unknown = [n for n in _GATE_FIRST if n not in _REGISTRY]
    assert not unknown, f"_GATE_FIRST names not in registry: {unknown}"
    lead = list(_GATE_FIRST)
    lead_set = set(lead)
    rest = [n for n in _REGISTRY if n not in lead_set]
    return {n: _REGISTRY[n] for n in [*lead, *rest]}


def all_queries() -> dict[str, QueryFn]:
    return {n: r.fn for n, r in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {n: r.oracle for n, r in _ordered().items() if r.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Import order == registration order == driver-gate order. The driver's
    # CORRECTNESS gate covers the first 50 registered queries per round, so
    # coverage is ROTATED round-over-round: round 1 gated the first 50 of the
    # old order (asof/dedup/encrypted/llm_text/ml_kmeans/multimodal/relational
    # q1-q30); round 2 front-loads the 27 queries round 1 left ungated
    # (relational2, similarity, skew, sources, streaming) so every registered
    # query has driver-green evidence across the union of rounds.
    # never-driver-gated queries first (round-2 additions included), then
    # round-1-green modules refilling the remainder of the gate window
    from .operators import (  # noqa: F401
        relational2,
        similarity,
        skew,
        sources,
    )
    from .streaming import events as streaming_events  # noqa: F401
    from .operators import (  # noqa: F401
        relational3,
        relational4,
        relational5,
        events_analytics2,
        llm_text2,
        llm_text3,
        similarity2,
        similarity3,
        similarity4,
        text_index,
        dedup2,
        dedup3,
        layout,
        graph,
        profiling,
        text_stats,
        similarity5,
        udtf_ops,
        pipeline,
        pipeline2,
        pipeline3,
        vector_stats,
        reffile_source,
        events_analytics,
        encrypted,
        asof,
        dedup,
        llm_text,
        ml_kmeans,
        multimodal,
        relational,
    )

    _LOADED = True


# --- shared helpers used by operator modules -------------------------------


def dsum(col):
    """Order-independent SUM of a double expression (convention #2)."""
    from pyspark.sql import functions as F

    return F.sum(col.cast("decimal(38,10)")).cast("double")


# The VARCHAR round-trip matters: DuckDB's direct DECIMAL→DOUBLE cast is
# not correctly rounded (verified: 289473120.0300000000 → …03000003), but
# DECIMAL→VARCHAR→DOUBLE is, and matches Spark's BigDecimal.doubleValue.
DSUM_SQL = "CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"


def davg(col):
    """Order-independent AVG of a double expression (convention #2)."""
    from pyspark.sql import functions as F

    return (
        F.sum(col.cast("decimal(38,10)")).cast("double") / F.count(col)
    )


DAVG_SQL = (
    "CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
    " / COUNT({expr})"
)
