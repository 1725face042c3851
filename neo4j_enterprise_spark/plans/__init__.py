"""Declared-query registry.

Every implemented operator from SURVEY.md §2 is exposed here as a named
pair: a PySpark plan ``(spark, sf_dir) -> DataFrame`` and (where SQL can
express it) the equivalent DuckDB oracle SQL over the driver's
pre-registered views. The driver hash-compares the two at sf0.01
(CORRECTNESS_r{N}.json); ``tests/test_oracle_parity.py`` runs the same
comparison locally at sf0.001.

Determinism rules every query follows:
- money/ratio aggregates are computed on exact DECIMAL casts, and only the
  *final* value is cast to DOUBLE (identical nearest-double on both
  engines) — never sum raw doubles (order-dependent);
- every computed column is aliased identically in both plans;
- timestamps are reduced to DATE or epoch BIGINT at the output boundary.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


# The driver's correctness harness checks the FIRST 50 entries of
# ``queries()`` in iteration order.  Rounds 1-2 checked the graph family
# (registered first) twice; the TPC-H / events / docs-ANN families never got
# a driver row.  ``_DRIVER_PRIORITY`` rotates those never-checked,
# oracle-bearing queries to the front for round 3; everything else keeps its
# registration order after them.  bench.py and the local parity tests are
# order-independent.
#
# ROUND 4 TODO: after CORRECTNESS_r03 lands, rotate again — move the r3-green
# first-50 to the back and promote the next never-driver-checked block
# (positions ~51-110: the demoted docs extras + every round-3 addition from
# "cypher_with_having" onward) into the top 50. The late-r3 additions are
# prime candidates: the community/centrality family
# (graph_node_similarity, graph_nation_trade_scc,
# graph_trade_condensation_layers, parts_brand_modularity,
# parts_ktruss_bounded, graph_louvain_move_round,
# graph_louvain_communities, graph_mis_luby, graph_hits_scores,
# graph_katz_truncated, graph_degree_assortativity), the Cypher extensions
# (cypher_union_dedup, cypher_where_or, cypher_merge_nodes,
# cypher_with_topk_expand), the store-format pair (graph_jsonl_roundtrip,
# store_upgrade_read), and the docs/events additions
# (docs_unigram_commonness, docs_curriculum_phases, docs_source_interleave,
# docs_inverted_index, docs_bigram_counts, docs_keyword_search,
# docs_prefix_simjoin, emb_centroid_similarity, customer_rfm_segments,
# supplier_pareto_share, events_path_trigrams, events_activity_streaks,
# parts_frequent_triples) — all locally sf0.01-gate-green in r3, none
# driver-checked yet.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # TPC-H family (18) — never driver-checked
    "q1_pricing_summary",
    "q2_best_supplier_per_part",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_items",
    "q11_part_value_threshold",
    "q12_delay_class_priority",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_supplier_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_supplier_part_share",
    "q21_sole_late_supplier",
    "q22_global_sales_opportunity",
    # relational extras — never driver-checked
    "election_winner_per_nation",
    "pricing_rollup_subtotals",
    "orders_price_quartiles",
    # events family — never driver-checked
    "events_hourly_rollup",
    "events_sliding_rollup",
    "events_stream_hourly_rollup",
    "events_stream_hourly_append",
    "events_stream_sessions_append",
    "events_session_windows",
    "events_asof_attribution",
    "events_errors_per_session",
    "events_user_sessions",
    "events_props_json_rollup",
    "events_incremental_rollup",
    "events_value_outliers",
    "events_column_profile",
    "events_value_histogram",
    "events_gap_distribution",
    "events_funnel_signup_purchase",
    "events_retention_cohorts",
    "events_per_user_cap",
    # docs / ANN family — never driver-checked (dedup ladder first: the
    # LLM-pipeline surface deserves driver slots over trivial projections)
    "docs_fingerprints",
    "docs_token_stats",
    "docs_chunk_windows",
    "ann_cosine_top5",
    "docs_minhash_md5_candidates",
    "docs_simhash_md5",
    "docs_simhash_neardup_pairs",
    "docs_ngram_jaccard_pairs",
    # demoted extras (still ahead of the twice-green graph family;
    # top_orders_per_customer duplicates driver-green priority_take_k's
    # rank-window shape)
    "top_orders_per_customer",
    "record_counts_per_table",
    "property_projection_default",
    "orders_cube_pricing",
    "docs_embedding_near_dup",
    "docs_neardup_clusters",
    "docs_lang_id",
    "docs_quality_scores",
    "docs_hash_split_counts",
    "docs_stratified_sample",
    "docs_train_eval_contamination",
    "docs_vocabulary_top_terms",
    "docs_bpe_token_stats",
    "docs_pii_redaction",
    "docs_exact_k_sample",
    "docs_dup_rate_by_source",
    "docs_repetition_stats",
    "docs_sequence_packing",
    "docs_mixture_resample",
    "docs_normalized_dedup",
    "docs_filter_pipeline",
    "docs_term_lift_by_source",
    "docs_lang_source_rollup",
    # round-3 additions — never driver-checked
    "cypher_with_having",
    "cypher_with_collect",
    "ann_lsh_md5_top5",
    "ann_ivf_fixed_top5",
    "docs_incremental_dedup",
    "graph_harmonic_centrality",
    "docs_span_dedup",
    "docs_heavy_hitter_terms",
    "docs_epoch_shuffle",
    "orders_incremental_join_view",
    "cypher_shortest_path",
    "cypher_collect_unwind",
    "cypher_rel_var_counts",
    "cypher_case_classify",
    "cypher_set_tier",
    "events_cumulative_users",
    "events_hourly_gapfill",
    "customer_scd2_batch",
    "customer_fuzzy_match",
    "events_equidepth_histogram",
    "lineitem_skew_report",
    "cypher_type_alternation",
    "events_stream_interval_join",
    "events_stream_stateful_totals",
    "docs_leakage_safe_split",
    "events_rolling_hour_counts",
    "graph_random_walks",
    "docs_cdc_dedup",
    "docs_token_budget_sample",
    "txlog_as_of_read",
    "cypher_exists_inactive",
    "docs_containment_pairs",
    "graph_schema_summary",
    "events_stream_dedup_rollup",
    "events_hourly_leaderboard",
    "events_conversion_latency",
    "docs_tokenizer_fertility",
    "emb_label_centroids",
)


def all_queries() -> dict[str, Query]:
    # import side-effect populates REGISTRY
    from . import graph_queries  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import relational  # noqa: F401

    ordered: dict[str, Query] = {}
    for name in _DRIVER_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, query in REGISTRY.items():
        if name not in ordered:
            ordered[name] = query
    return ordered
