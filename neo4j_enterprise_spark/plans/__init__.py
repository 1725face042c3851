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
#   r7:    docs_repetition_stats (the r6 red) first, the 8 queries
#          registered in r6 after the window froze, then recycle by
#          evidence age (r1, r2, r3 TPC-H) — 50/50 green
#          (CORRECTNESS_r07.json). After r7 every oracle query's
#          evidence is <=4 rounds old; only the six registered in r7
#          after the window froze have never had a driver row.
#   r8 (this window): the six queries REGISTERED in r7 after the
#          window froze lead (first driver rows — all six were
#          local-parity + sf0.01 gate_subset green at the r7 head);
#          docs_phrase_search re-checks because r8 re-pointed its
#          DEFAULT plan at the postings rendering (VERDICT r7 ask #3;
#          oracle unchanged), with the HOF variant's first row under
#          its new explicit name docs_phrase_search_hof; any operator
#          REGISTERED THIS ROUND sits inside the window (ends the
#          register-late/check-next-round lag the r6 and r7 verdicts
#          flagged); the rest recycles oldest evidence — the whole r3
#          cohort (28 queries) and the front of the r4 cohort. After
#          this window no oracle query's newest evidence is older
#          than r4.
#   r9 TODO: recycle the remaining r4 cohort (45 rows — cypher_*
#          extensions, the graph_* centrality/community family,
#          events_stream_* driven-parity, docs_incremental_dedup /
#          docs_neardup_clusters / docs_span_dedup /
#          docs_prefix_simjoin / emb_centroid_similarity /
#          customer_rfm_segments / customer_spend_gini displaced from
#          this window by the r8 registrations, store_upgrade_read,
#          ...), then start the r5 cohort by age. 14 queries were
#          REGISTERED in r8 INSIDE the window (no register-late lag
#          this round); if r9 adds operators, keep them in-window the
#          same way.
# bench.py and the local parity tests are order-independent.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- registered r7 after the window froze: first driver rows ------
    "docs_ngram_novelty",
    "docs_phrase_search_postings",
    "emb_semdedup",
    "ann_pq_fixed_top5",
    "docs_exact_substr_spans",
    "ann_ivf_pq_fixed_top5",
    # -- default-plan swap re-check + the HOF twin's first row ---------
    "docs_phrase_search",
    "docs_phrase_search_hof",
    # -- registered THIS round (r8): first driver rows, in-window ------
    "emb_semdedup_greedy",
    "rel_chain_explorer",
    "rel_single_assertion",
    "docs_tfidf_keywords",
    "docs_char_gini",
    "docs_gopher_rules",
    "docs_dup_rate_by_source",
    "docs_langid_agreement",
    "emb_norm_outliers",
    "docs_minhash_calibration",
    # -- oldest evidence: the full r3 cohort ---------------------------
    "ann_cosine_top5",
    "docs_chunk_windows",
    "docs_fingerprints",
    "docs_minhash_md5_candidates",
    "docs_simhash_md5",
    "docs_simhash_neardup_pairs",
    "docs_token_stats",
    "election_winner_per_nation",
    "events_asof_attribution",
    "events_column_profile",
    "events_errors_per_session",
    "events_funnel_signup_purchase",
    "events_gap_distribution",
    "events_hourly_rollup",
    "events_incremental_rollup",
    "events_per_user_cap",
    "events_props_json_rollup",
    "events_retention_cohorts",
    "events_session_windows",
    "events_sliding_rollup",
    "events_stream_hourly_append",
    "events_stream_hourly_rollup",
    "events_stream_sessions_append",
    "events_user_sessions",
    "events_value_histogram",
    "events_value_outliers",
    "orders_price_quartiles",
    "pricing_rollup_subtotals",
    # -- next-oldest: front of the r4 cohort ----------------------------
    "q12_delay_class_priority",
    "ann_ivf_fixed_top5",
    "ann_lsh_md5_top5",
    "docs_cdc_dedup",
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
