"""Plan-quality regression tests: the optimizations SCALE.md promises
must be visible in the physical plans (pushdown, broadcast, partial
aggregation, top-k without global sort)."""

from __future__ import annotations

import io
import sys

from neo4j_enterprise_spark.plans import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].spark(spark, sf_dir)
    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue()


def test_q6_filters_reach_the_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters" in plan
    # shipdate range + discount + quantity all pushed
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in plan
    # column pruning: returnflag is never read
    assert "l_returnflag" not in plan


def test_q3_broadcasts_the_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10 without global sort


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_dictionary_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "record_model_validation")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_point_lookup_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "node_point_lookup")
    # the id=42 predicate reaches the scan: either pushed to parquet or
    # served from the memoized in-memory derived-nodes table
    assert "PushedFilters" in plan or "InMemoryTableScan" in plan


def test_ivf_centroid_selection_has_no_global_sort(spark, sf_dir):
    """Centroid selection must be per-partition top-K
    (TakeOrderedAndProject), not a corpus-wide window/sort — the
    100 TB-path invariant for ivf_assign."""
    from pyspark.sql import functions as F

    from neo4j_enterprise_spark.catalog import load_table
    from neo4j_enterprise_spark.operators.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assignments = ivf_assign(emb, n_cells=8)
    import io
    import sys

    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        centroids.explain("formatted")
    finally:
        sys.stdout = stdout
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    # the only Window runs on the K selected rows (post-limit), never
    # before the TakeOrderedAndProject that bounds the input
    assert plan.index("TakeOrderedAndProject") > plan.index("Window")
