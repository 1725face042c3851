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
        # A duplicate name would silently shadow the earlier registration
        # (the r10 verdict found two such accidents); fail loudly instead.
        if name in REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                f"registered ({REGISTRY[name].spark.__module__})"
            )
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
#   r10:   50/50 hash-green (CORRECTNESS_r10.json): the two r10
#          registrations, the two in-round plan changes, the r1/r2
#          rows-only five, the six r5 check_fixture rows, the front of
#          the r5 cohort. NOTE (r10 VERDICT "what's wrong" #2): two
#          plans changed AFTER the r10 window froze —
#          q5_local_supplier_volume (join reorder) and
#          events_sliding_rollup (two-level slots) — so their r10-era
#          greens were stale; they lead THIS window.
#   r11 (this window): the two late-r10 stale greens FIRST
#          (q5_local_supplier_volume, events_sliding_rollup — the
#          latter also gained an explicit NULL-ts filter this round,
#          mirrored in its oracle); then the three queries whose
#          plans+oracles changed this round (the LSH oversized-bucket
#          cap, mirrored via QUALIFY: docs_minhash_md5_candidates,
#          docs_minhash_calibration, docs_simhash_neardup_pairs); then
#          the two r11 RENAMES (first rows under the new names:
#          graph_label_propagation_derived, docs_dup_rate_within_source
#          — the r10 duplicate-registration fix; register() now raises
#          on collision); then the oldest-evidence rotation: the full
#          r5 cohort (8) and the r6 cohort in name order. No no_oracle
#          re-drives this window (r10 VERDICT ask). These r6-evidenced
#          queries did not fit and rotate first in r12 (count grew to
#          16 when the four NULL-ts contract fixes took head slots):
#          node_point_lookup, orders_cube_pricing, pattern_2hop_paths,
#          priority_take_k, property_projection_default,
#          q10_returned_items, q1_pricing_summary,
#          record_counts_per_table, record_model_validation,
#          rel_counts_by_type, round_robin_assignment,
#          snapshot_branch_divergence, top_orders_per_customer,
#          traverse_dfs_preorder, traverse_pruned_2hop,
#          violations_summary.
#          STANDING RULE (r10 VERDICT ask #1): any plan/oracle that
#          changes AFTER this window's driver run leads the r12 window
#          automatically — late-round changes re-earn their green the
#          NEXT round, no exceptions.
# bench.py and the local parity tests are order-independent.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ================= r12 window =================
    # Stale-green detection is now MECHANIZED (VERDICT r11 ask #2):
    # plans/_query_hashes.json snapshots sha256(plan source + oracle)
    # per query — self hash (registered fn) and deep hash (transitive
    # package-function closure incl. in-body imports). Regenerate ONLY
    # at window rotation: `python tools/window_manifest.py --write`.
    # tests/test_window_staleness.py goes red if a changed/new query is
    # missing from this window (deep-only changes may instead be named
    # in _DEEP_CHANGE_ACK below with a reason).
    #
    # -- the r11 stale green leads (VERDICT r11 "what's wrong" #1): its
    #    NULL-ts plan+oracle change missed the r11 window and the old
    #    comment here wrongly claimed it sat in the rotation ------------
    "events_path_trigrams",
    # -- r12 NULL-contract sweeps (tests/test_null_contract_sweep.py:
    #    NULL/empty text, NULL user_id, NULL value; VERDICT r11 ask #4)
    #    found 10 real divergences — every fixed plan/oracle re-earns:
    "docs_bigram_counts",          # CRASH: sequence(1,0) is DESCENDING on 1-token docs
    "events_asof_attribution",     # asof_join: struct forward-fill (NULL payload row-mixing) + NULL keys never match
    "events_equidepth_histogram",  # NTILE NULL order differs across engines; NULLs excluded by contract
    "docs_bloom_contamination",    # DuckDB greatest() NULL-skip manufactured ''-shingles
    "docs_train_eval_contamination",
    "docs_chunk_windows",          # Spark greatest(NULL-1,0) emitted a garbage chunk per NULL doc
    "docs_incremental_dedup",      # NOT IN + one NULL md5 = 0-row oracle (3-valued logic)
    "docs_span_dedup",             # _spanify emitted an empty block per NULL doc
    "docs_bm25_search",            # corpus stats counted NULL docs (prior green was VACUOUS on fixture vocab)
    "docs_rrf_fusion",             # same idf drift through the shared bm25_rank
    "media_decode_pipeline",       # CRASH: bytes(None) in the Arrow worker; NULL payloads filtered JVM-side
    # -- LSH-cap consistency (ADVICE r11): lsh_ann_topk gained the same
    #    oversized-bucket guard as the rest of the family; the md5 twin's
    #    oracle mirrors it via QUALIFY (cap never fires on shipped data:
    #    <=2000 embeddings) ---------------------------------------------
    "ann_lsh_md5_top5",
    # -- r12 NULL-embedding / NULL-grouping-key sweeps (the sweep's
    #    second wave: 10%-NULL embedding+label with zero vectors, and
    #    NULL lang/source keys) found 12 more divergences, two of them
    #    crash classes: Arrow matmuls die on a None row
    #    (np.array inhomogeneous), and ANSI-mode cosine division
    #    throws DIVIDE_BY_ZERO on quantized-zero-norm vectors.
    #    Contract (similarity.drop_unsearchable): search/index-class
    #    embedding ops drop NULL + zero-norm vectors at entry, oracles
    #    mirror; aggregate-class ops (label_centroids, sq8) keep SQL
    #    NULL-skip semantics. NULL sampling keys: no quota match /
    #    no rotation slot (sampling.token_budget_sample,
    #    source_interleave) --------------------------------------------
    "ann_cosine_top5",
    "ann_ivf_fixed_top5",
    "ann_ivf_pq_fixed_top5",
    "ann_pq_fixed_top5",
    "docs_embedding_near_dup",
    "emb_hard_negatives",          # + NULL labels crash the int64 label array
    "emb_norm_outliers",           # NULL-only drop: norm 0 IS the outlier it screens
    "emb_semdedup",
    "emb_semdedup_greedy",
    "docs_source_interleave",      # NULL src_idx ordered FIRST on Spark, LAST on DuckDB
    "docs_token_budget_sample",    # NULL stratum matches no budget key; oracle kept the group
    # -- oracle now interpolates dedup.MAX_BUCKET_DEFAULT instead of a
    #    literal 1024 (ADVICE r11; SQL byte-identical, decorator changed)
    "docs_simhash_neardup_pairs",
    # -- deep-hash catch: _release_checkpoint_blocks gained a warn-once
    #    canary (ADVICE r11); behavior-equivalent, re-earned anyway -----
    "docs_bpe_merges",
    # -- the three _ensure_symlink-refactored streaming twins re-certify
    #    (VERDICT r11 ask #6) -------------------------------------------
    "events_stream_dedup_rollup",
    "events_stream_hourly_rollup",
    "events_stream_pushk_parity",
    # -- oldest evidence: last checked r6 (VERDICT r11 ask #3) ----------
    "node_point_lookup",
    "orders_cube_pricing",
    "pattern_2hop_paths",
    "priority_take_k",
    "property_projection_default",
    "q10_returned_items",
    "q1_pricing_summary",
    "record_counts_per_table",
    "record_model_validation",
    "rel_counts_by_type",
    "round_robin_assignment",
    "snapshot_branch_divergence",
    "top_orders_per_customer",
    "traverse_dfs_preorder",
    "traverse_pruned_2hop",
    "violations_summary",
    # -- r12 sweep wave 3 (non-finite / ragged / NULL-component
    #    vectors): a NaN or Inf component crashes the quantize cast on
    #    BOTH engines (ANSI CAST(NaN AS BIGINT) throws; DuckDB
    #    conversion error), so even the aggregate-class embedding ops
    #    need the finite guard (`drop_nonfinite_embeddings`; NULL and
    #    ragged rows still pass through there per the wave-2 contract) -
    "emb_label_centroids",
    "emb_centroid_similarity",
    "emb_sq8_error",
    # -- oldest evidence: last checked r7, name order (window filler;
    #    the remaining r7 cohort — incl. cypher_optional_match, displaced
    #    by the endpoints re-earn below — rotates in r13) ---------------
    "bfs_shortest_hops",
    # -- r12 OPTIMIZATION: endpoints_not_in_use (= entry()) restructured
    #    from two per-side anti-joins to ONE anti-join over the stacked
    #    (src, dst) endpoint set (validation.py; OPTIMIZATION_r12.md §3)
    #    — rows proven bit-identical (23 761 at sf0.1) but the flagship
    #    re-earns its green in-window on the new plan -------------------
    "endpoints_not_in_use",
)

# Deep-only changes (shared-helper edits) acknowledged OUT of the window,
# with the evidence that stands in for a driver slot — audited by
# tests/test_window_staleness.py (a reason string is REQUIRED).
_DEEP_CHANGE_ACK: dict[str, str] = {
    "ann_lsh_top5": (
        "rows-only query (no oracle); lsh_ann_topk gained the family "
        "bucket cap but the cap cannot fire on shipped data (<=2000 "
        "embeddings vs cap 4096) so output is bit-identical; the cap "
        "semantics are tested at tests/test_lsh_bucket_cap.py::"
        "test_ann_lsh_cap and the md5 oracle twin ann_lsh_md5_top5 "
        "re-earns in this window on the capped plan; additionally the "
        "r12 physical-plan optimization (single materialized signature "
        "pass, asNondeterministic matmul UDF, broadcast seed ids — "
        "OPTIMIZATION_r12.md §1) is proven output-identical by golden "
        "row-compare at sf0.1 and sf0.001 (tools/golden_r12.py)"
    ),
    "docs_embedding_near_dup_lsh": (
        "rows-only query (no oracle); same cap-cannot-fire argument "
        "(<=2000 embeddings vs cap 4096, unchanged output) and the "
        "capped path is tested at tests/test_lsh_bucket_cap.py::"
        "test_embedding_lsh_cap; local rows/schema evidence recorded "
        "in COVERAGE.md; the r12 single-signature-pass optimization "
        "(OPTIMIZATION_r12.md §1) is proven output-identical by golden "
        "row-compare at sf0.1 (853 rows) and sf0.001 (62 rows)"
    ),
    "ann_ivf_top5": (
        "rows-only production IVF (xxhash centroids, no SQL twin); the "
        "r12 drop_unsearchable entry guard (NULL / zero-norm / "
        "non-finite / ragged) is a provable no-op on shipped data (0 "
        "such vectors at every sf, DuckDB-verified) so output is "
        "bit-identical; the "
        "guard's semantics are driver-checked via the fixed twin "
        "ann_ivf_fixed_top5 in this window and the NULL sweep "
        "(tests/test_null_contract_sweep.py) covers the family"
    ),
    "ann_pq_top5": (
        "rows-only production PQ (Lloyd-trained float codebook); same "
        "no-op-guard argument as ann_ivf_top5 (0 invalid vectors on "
        "shipped data); fixed twin ann_pq_fixed_top5 "
        "re-earns in this window on the guarded plan"
    ),
    "ann_ivf_pq_top5": (
        "rows-only production IVF-PQ; same no-op-guard argument; fixed "
        "twin ann_ivf_pq_fixed_top5 re-earns in this window on the "
        "guarded plan"
    ),
    "media_feature_neighbors": (
        "rows-only query (no oracle); reaches the r12 multimodal "
        "NULL-payload contract through attach_media/extract_features — "
        "shipped testdata has no NULL text so output is bit-identical; "
        "the contract itself is driver-checked via media_decode_pipeline "
        "(in this window) and the NULL sweep covers the family; local "
        "rows/schema evidence recorded in COVERAGE.md"
    ),
}

# r12 OPTIMIZATION round: traversal.bfs_reachable/traverse now cut the
# frontier's lineage EVERY round instead of every third round
# (OPTIMIZATION_r12.md §2) — a checkpoint-cadence-only change;
# localCheckpoint is semantically transparent, so no query's output can
# move. Receipts: golden row-compare identical at sf0.1 AND sf0.001 for
# every query that executes the changed functions (bfs_2hop_reach 21
# rows, traverse_pruned_2hop 520/413, bfs_shortest_hops 1013/978,
# graph_harmonic_centrality 21, cypher_shortest_path 1000/10 —
# tools/golden_r12.py). The cypher_* names below never call the changed
# functions at all (only shortestPath compiles to bfs_reachable); they
# are flagged because the deep hash folds the pattern module's import
# graph three levels down.
_TRAVERSAL_CADENCE_ACK = (
    "r12 optimization: every-round lineage cut in traversal.bfs_reachable/"
    "traverse (checkpoint cadence only — semantically transparent); golden "
    "row-compare identical at sf0.1+sf0.001 for all executors of the "
    "changed code (OPTIMIZATION_r12.md §2); this query reaches traversal "
    "only through the pattern-module import graph or is itself "
    "golden-verified"
)
_DEEP_CHANGE_ACK.update(
    {
        name: _TRAVERSAL_CADENCE_ACK
        for name in (
            "bfs_2hop_reach",
            "graph_harmonic_centrality",
            "cypher_shortest_path",
            "cypher_case_classify",
            "cypher_collect_unwind",
            "cypher_exists_inactive",
            "cypher_rel_var_counts",
            "cypher_return_distinct",
            "cypher_set_tier",
            "cypher_skip_page",
            "cypher_string_predicates",
            "cypher_type_alternation",
            "cypher_union_dedup",
            "cypher_where_aggregate",
            "cypher_where_or",
            "cypher_with_collect",
            "cypher_with_having",
            "cypher_with_topk_expand",
            # displaced from the window by the endpoints re-earn; same
            # import-graph-only reach as the other cypher_* names
            "cypher_optional_match",
        )
    }
)

# r12 OPTIMIZATION note: a ktruss_peel wedge-join auto-broadcast was
# tried, golden-verified, measured at sf0.1 (apparent −0.4 s) — and
# REVERTED when the sf10 rung showed a stable +0.6 s regression (the
# extra count/broadcast jobs cost more than the SortMergeJoin they
# replaced; the isolated join was a wash to begin with). The shipped
# code is byte-identical to the pre-round state; receipt in
# OPTIMIZATION_r12.md §4.


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
