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
# ``queries()`` in iteration order.  Window history:
#   r1-r2: graph family (registered first) — 98 distinct greens.
#   r3:    TPC-H / events / docs-ANN families — 49 green, q12 red on the
#          HUGEINT hash artifact (fixed: oracle now CASTs to BIGINT, and
#          tests/test_oracle_dtypes.py guards the whole class).
#   r4 (this window): q12 re-check + 49 NEVER-driver-checked queries,
#          leading with the iterative-oracle community/centrality family,
#          the Cypher surface, the dedup ladder remainder, ANN variants,
#          store-format round-trips, and the driven-streaming parity rows.
#   r5 TODO: promote the remaining ~50 never-checked (events extras:
#          time_profile/burst/autocorr/gapfill/streaks/path_trigrams/
#          cumulative/equidepth/rolling/leaderboard/conversion_latency;
#          docs extras: lang_id/quality/splits/sampling/packing/mixture/
#          bpe/pii/vocabulary/fingerprint extras/inverted_index/bigrams/
#          keyword_search/unigram_commonness/curriculum/interleave;
#          metrics: nation_supplier_hhi/supplier_pareto_share;
#          parts_frequent_triples/parts_association_rules; SCD2/fuzzy/
#          incremental-view/txlog_as_of/skew_report + the relational
#          demotions), PLUS the round-4 additions past slot 50
#          (docs_countmin_freq, graph_orc_roundtrip,
#          graph_label_propagation, orders_salted_join_rollup), then
#          resume cycling so every oracle query gets a driver row at
#          least once per ~4 rounds.
# bench.py and the local parity tests are order-independent.
_DRIVER_PRIORITY: tuple[str, ...] = (
    "q12_delay_class_priority",  # r3 red (HUGEINT artifact) - re-check the fix
    "graph_louvain_communities",
    "graph_louvain_move_round",
    "graph_mis_luby",
    "graph_hits_scores",
    "graph_katz_truncated",
    "graph_nation_trade_scc",
    "graph_trade_condensation_layers",
    "parts_ktruss_bounded",
    "graph_node_similarity",
    "graph_degree_assortativity",
    "parts_brand_modularity",
    "graph_harmonic_centrality",
    "graph_trade_reciprocity",
    "graph_rich_club",
    "graph_random_walks",
    "graph_betweenness_exact_small",
    "cypher_shortest_path",
    "cypher_union_dedup",
    "cypher_where_or",
    "cypher_merge_nodes",
    "cypher_with_topk_expand",
    "cypher_with_having",
    "cypher_with_collect",
    "cypher_collect_unwind",
    "cypher_rel_var_counts",
    "cypher_case_classify",
    "cypher_set_tier",
    "cypher_type_alternation",
    "cypher_exists_inactive",
    "docs_ngram_jaccard_pairs",
    "docs_containment_pairs",
    "docs_incremental_dedup",
    "docs_span_dedup",
    "docs_cdc_dedup",
    "docs_prefix_simjoin",
    "docs_neardup_clusters",
    "ann_lsh_md5_top5",
    "ann_ivf_fixed_top5",
    "emb_label_centroids",
    "emb_centroid_similarity",
    "graph_jsonl_roundtrip",
    "store_upgrade_read",
    "media_decode_pipeline",
    "events_stream_interval_join",
    "events_stream_stateful_totals",
    "events_stream_dedup_rollup",
    "cypher_merge_rels",
    "customer_rfm_segments",
    "customer_spend_gini",
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
