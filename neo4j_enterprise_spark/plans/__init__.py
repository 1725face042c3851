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
#   r4: q12 re-check + 49 NEVER-driver-checked queries (iterative-oracle
#          community/centrality, Cypher surface, dedup ladder, ANN
#          variants, round-trips, driven-streaming parity) — 49/50 green;
#          emb_label_centroids red on the driver canon's list-cell crash.
#   r5 (this window): the two array-output fixes (emb_label_centroids
#          re-check after the explode fix; docs_inverted_index first-ever
#          after array_join), the 7 NEW corrupted-fixture checker oracles
#          (J1-J11 per-family rows, plans/checker.py), then 41 of the 59
#          remaining never-checked (docs extras, events extras,
#          SCD2/fuzzy/incremental-view, HHI/Pareto, skew report, and the
#          r4 additions past slot 50).
#   r5:    the two array-output fixes, 7 corrupted-fixture checker
#          oracles, then 41 of the 59 remaining never-checked — 50/50
#          green (CORRECTNESS_r05.json).
#   r6 (this window): check_fixture_graph_props (NEW — the NeoStore
#          singleton family's first oracle row, on the r6-extended
#          fixture) + check_fixture_summary re-check (now 7 families);
#          q1/q5/q10 re-checks (their oracles were rewritten in r5 —
#          quantized revenue — so the r3 greens are stale);
#          docs_heavy_hitter_mg (new in r5); the 18 last never-checked
#          oracle queries (docs sampling family, events extras,
#          graph_schema_summary, orders_cube_pricing,
#          property_projection_default, record_counts_per_table,
#          top_orders_per_customer). After this window, ZERO
#          oracle-bearing queries have never had a driver row. The
#          remaining 26 slots recycle the oldest r1-green graph-family
#          queries (driver evidence age ~5 rounds).
#   r7 (this window): docs_repetition_stats FIRST (the r6 red — missing
#          Window import, fixed + suite re-run this round), then the 8
#          retrieval/curation queries REGISTERED in r6 after the window
#          froze (first driver rows), then recycle by evidence age:
#          the two r1 rows, all 21 remaining r2 rows, and the 18
#          never-re-checked r3 TPC-H rows (q2-q22 — re-greens the whole
#          TPC-H family alongside the bucketed-layout work). After this
#          window every oracle query's evidence is ≤4 rounds old.
#   r8 TODO: lead with the six queries REGISTERED in r7 after the
#          window froze (docs_ngram_novelty, docs_phrase_search_postings,
#          emb_semdedup, ann_pq_fixed_top5, docs_exact_substr_spans,
#          ann_ivf_pq_fixed_top5 — first driver rows; all six are
#          local-parity + sf0.01 gate_subset green, and the end-of-r7
#          full gate replay covered the whole 249-query registry),
#          then continue recycling oldest evidence
#          (r3 events/docs families next: events_asof_attribution,
#          events_session_windows, docs_token_stats, ann_cosine_top5,
#          election_winner_per_nation, ...).
# bench.py and the local parity tests are order-independent.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- the r6 red, fixed this round (Window import) -----------------
    "docs_repetition_stats",
    # -- registered r6 after the window froze: first driver rows ------
    "docs_bm25_search",
    "docs_phrase_search",
    "docs_winnow_overlap",
    "docs_bloom_contamination",
    "docs_nb_lang_classifier",
    "docs_dsir_importance",
    "docs_collocations",
    "docs_bigram_fluency",
    # -- oldest evidence: r1 -------------------------------------------
    "docs_embedding_near_dup",
    "docs_lang_source_rollup",
    # -- oldest evidence: r2 -------------------------------------------
    "bfs_shortest_hops",
    "cypher_optional_match",
    "cypher_property_map_match",
    "cypher_return_distinct",
    "cypher_skip_page",
    "cypher_string_predicates",
    "cypher_where_aggregate",
    "docs_exact_dup_groups",
    "graph_kcore_summary",
    "graph_label_propagation",
    "index_lookup_materialized",
    "index_put_if_absent",
    "parts_copurchase_top20",
    "parts_triangle_clustering",
    "parts_weighted_distances",
    "property_stats_histogram",
    "property_store_scan",
    "property_upsert_projection",
    "row_checksums",
    "snapshot_diff_added",
    "txlog_replay_lww",
    # -- oldest evidence: r3 — the TPC-H family ------------------------
    "q2_best_supplier_per_part",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q11_part_value_threshold",
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
)


def all_queries() -> dict[str, Query]:
    # import side-effect populates REGISTRY
    from . import checker  # noqa: F401
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
