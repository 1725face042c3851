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
#   r7 TODO: lead with the queries REGISTERED in r6 after the window
#          froze (docs_bm25_search, docs_bloom_contamination,
#          docs_winnow_overlap, docs_nb_lang_classifier,
#          docs_dsir_importance, docs_phrase_search, docs_collocations — first driver
#          rows), then
#          continue recycling r1-r2 greens (snapshot/txlog/cypher
#          families next: traverse_dfs_preorder,
#          snapshot_branch_divergence, txlog_replay_lww,
#          snapshot_diff_added, row_checksums, bfs_shortest_hops, ...)
#          so every oracle query gets a driver row at least once per
#          ~4 rounds.
# bench.py and the local parity tests are order-independent.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- new / changed this round ------------------------------------
    "check_fixture_graph_props",  # NEW: NeoStore family oracle row
    "check_fixture_summary",  # re-check: now includes graph_props
    # -- stale driver evidence (oracle rewritten r5) -----------------
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q10_returned_items",
    # -- never driver-checked ----------------------------------------
    "docs_heavy_hitter_mg",
    "top_orders_per_customer",
    "record_counts_per_table",
    "property_projection_default",
    "orders_cube_pricing",
    "docs_exact_k_sample",
    "docs_epoch_shuffle",
    "docs_token_budget_sample",
    "docs_curriculum_phases",
    "docs_source_interleave",
    "docs_hash_split_counts",
    "docs_stratified_sample",
    "docs_dup_rate_by_source",
    "docs_repetition_stats",
    "events_rolling_hour_counts",
    "events_hourly_leaderboard",
    "events_activity_streaks",
    "events_time_profile",
    "graph_schema_summary",
    # -- recycled oldest r1 greens (evidence age ~5 rounds) ----------
    "node_counts_by_kind",
    "rel_counts_by_type",
    "node_point_lookup",
    "index_lookup_by_kind",
    "adjacency_out_typed",
    "neighborhood_1hop",
    "degree_by_type",
    "degree_histogram",
    "endpoints_not_in_use",
    "violations_summary",
    "first_in_chain",
    "chain_neighbors",
    "bfs_2hop_reach",
    "record_model_validation",
    "pattern_2hop_paths",
    "cypher_region_supply_paths",
    "cypher_var_length_reach",
    "traverse_pruned_2hop",
    "round_robin_assignment",
    "connected_components",
    "degree_pivot_by_type",
    "customer_props_unpivot",
    "priority_take_k",
    "cluster_member_rollup",
    "traverse_dfs_preorder",
    "snapshot_branch_divergence",
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
