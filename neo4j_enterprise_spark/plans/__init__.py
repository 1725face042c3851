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
#   r8:    the six r7-registered queries led and went green; the 14
#          queries registered in r8 sat inside the window (no
#          register-late lag); the whole r3 cohort + front of r4
#          recycled — 50/50 green (CORRECTNESS_r08.json). After r8 no
#          oracle query's newest evidence is older than r4.
#   r9 registrations: docs_soft_dedup_weights / docs_ccnet_buckets /
#          docs_rrf_fusion / emb_sq8_error — all four sit in-window
#          right behind the gopher re-drive (the r8 no-lag rule).
#   r9 (this window): docs_gopher_rules FIRST — its r8 green row was
#          earned pre-fix; the n_alpha empty-boundary-token bug (the
#          r8 VERDICT red, engine said rule_alpha_words=true for
#          'hello\n' vs oracle false) is fixed at text.py (see the
#          r9 commit) and the hypothesis mirror passes, so the
#          re-drive certifies head. Then any operator REGISTERED THIS
#          ROUND (in-window, same rule as r8), then the ENTIRE
#          remaining r4 cohort (45 rows — cypher_* extensions with
#          cypher_with_having early since r9 re-plans its derived-rels
#          pruning, graph_* centrality/community, events_stream_*
#          driven-parity, the displaced docs/emb/customer rows,
#          store_upgrade_read), then start the r5 cohort (front of the
#          check_fixture family) as window filler. After this window
#          no oracle query's newest evidence is older than r5.
#   r9:    50/50 green (CORRECTNESS_r09.json) — the gopher re-drive,
#          the four r9 registrations, the full remaining r4 cohort;
#          the six check_fixture fillers sat past slot 50 (unchecked,
#          still r5-evidenced).
#   r10 (this window): the two queries REGISTERED THIS ROUND lead
#          (events_stream_pushk_parity / events_stream_catchup_tail —
#          the R3/R5 driven parity twins, first driver rows, in-window
#          per the r8 no-lag rule); then the two queries whose PLANS
#          CHANGED this round (docs_ccnet_buckets: decimal-exact sum_cf
#          both sides; docs_tfidf_keywords: tail anti-join dropped), so
#          their r9/r8 greens are re-earned on the new plans; then the
#          46 OLDEST-EVIDENCE queries, all with last check BEFORE r7
#          (VERDICT r9 ask #3: >=40 pre-r7 re-greens after the r9
#          compiler rewrites touched plan generation broadly) — the
#          r1/r2 rows-only five, the six r5 check_fixture rows, and the
#          front of the r5 cohort in name order. The ~56 remaining
#          r5/r6-evidenced queries rotate in r11.
# bench.py and the local parity tests are order-independent.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- registered THIS round (r10): first driver rows, in-window ----
    "events_stream_pushk_parity",
    "events_stream_catchup_tail",
    # -- plans changed this round: re-earn the green ------------------
    "docs_ccnet_buckets",
    "docs_tfidf_keywords",
    # -- oldest evidence: last checked r1/r2 (rows-only family) -------
    "ann_lsh_top5",
    "docs_embedding_near_dup_lsh",
    "graph_full_validation",
    "graph_validation_suite_100k",
    "txlog_replay_roundtrip",
    # -- oldest evidence: last checked r5 ------------------------------
    "check_fixture_dictionaries",
    "check_fixture_first_property",
    "check_fixture_nodes",
    "check_fixture_ownership",
    "check_fixture_properties",
    "check_fixture_relationships",
    "customer_fuzzy_match",
    "customer_scd2_batch",
    "docs_bigram_counts",
    "docs_bpe_token_stats",
    "docs_countmin_freq",
    "docs_filter_pipeline",
    "docs_heavy_hitter_terms",
    "docs_incremental_minhash",
    "docs_inverted_index",
    "docs_keyword_search",
    "docs_lang_id",
    "docs_leakage_safe_split",
    "docs_mixture_resample",
    "docs_normalized_dedup",
    "docs_pii_redaction",
    "docs_quality_scores",
    "docs_sequence_packing",
    "docs_term_lift_by_source",
    "docs_tokenizer_fertility",
    "docs_train_eval_contamination",
    "docs_unigram_commonness",
    "docs_vocabulary_top_terms",
    "emb_hard_negatives",
    "events_burst_hours",
    "events_conversion_latency",
    "events_cumulative_users",
    "events_equidepth_histogram",
    "events_hourly_autocorr",
    "events_hourly_gapfill",
    "events_path_trigrams",
    "events_stream_countmin",
    "events_stream_leaderboard",
    "graph_negative_samples",
    "graph_orc_roundtrip",
    "lineitem_skew_report",
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
