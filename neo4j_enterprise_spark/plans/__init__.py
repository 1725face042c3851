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
#   r6 TODO: docs_heavy_hitter_mg (new in r5 — the MG pipeline kept as
#          its own oracle query after docs_heavy_hitter_terms switched
#          to the exact one-scan plan), then the 18 still-never-checked
#          (top_orders_per_customer,
#          record_counts_per_table, property_projection_default,
#          orders_cube_pricing, docs_exact_k_sample, docs_epoch_shuffle,
#          docs_token_budget_sample, docs_curriculum_phases,
#          docs_source_interleave, docs_hash_split_counts,
#          docs_stratified_sample, docs_dup_rate_by_source,
#          docs_repetition_stats, events_rolling_hour_counts,
#          events_hourly_leaderboard, events_activity_streaks,
#          events_time_profile, graph_schema_summary), then resume
#          cycling so every oracle query gets a driver row at least once
#          per ~4 rounds.
# bench.py and the local parity tests are order-independent.
_DRIVER_PRIORITY: tuple[str, ...] = (
    "emb_label_centroids",  # r4 red (canon list-cell crash) - re-check the fix
    "docs_inverted_index",  # same latent bug, fixed preemptively
    "check_fixture_nodes",
    "check_fixture_relationships",
    "check_fixture_first_property",
    "check_fixture_properties",
    "check_fixture_ownership",
    "check_fixture_dictionaries",
    "check_fixture_summary",
    "txlog_as_of_read",
    "parts_frequent_triples",
    "parts_association_rules",
    "graph_orc_roundtrip",
    "graph_negative_samples",
    "docs_lang_id",
    "docs_quality_scores",
    "docs_train_eval_contamination",
    "docs_vocabulary_top_terms",
    "docs_bpe_token_stats",
    "docs_pii_redaction",
    "docs_sequence_packing",
    "docs_mixture_resample",
    "docs_normalized_dedup",
    "docs_filter_pipeline",
    "docs_term_lift_by_source",
    "docs_heavy_hitter_terms",
    "docs_leakage_safe_split",
    "docs_tokenizer_fertility",
    "docs_unigram_commonness",
    "docs_bigram_counts",
    "docs_keyword_search",
    "docs_countmin_freq",
    "emb_hard_negatives",
    "docs_incremental_minhash",
    "orders_incremental_join_view",
    "events_cumulative_users",
    "events_hourly_gapfill",
    "customer_scd2_batch",
    "customer_fuzzy_match",
    "events_equidepth_histogram",
    "lineitem_skew_report",
    "events_conversion_latency",
    "events_path_trigrams",
    "supplier_pareto_share",
    "events_stream_leaderboard",
    "events_hourly_autocorr",
    "events_burst_hours",
    "nation_supplier_hhi",
    "orders_salted_join_rollup",
    "events_stream_countmin",
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
