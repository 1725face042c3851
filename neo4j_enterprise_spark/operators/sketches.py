"""Sketch aggregations: approximate distinct counts and quantiles.

At 100 TB, exact COUNT(DISTINCT) shuffles every distinct value and
exact percentiles require a global sort; the sketch versions are
single-pass, mergeable, and bounded-memory:

- ``approx_count_distinct`` — HyperLogLog++ (JVM-side, relative error
  configurable; partial sketches merge map-side like any partial agg);
- ``percentile_approx`` — Greenwald-Khanna quantile summaries with the
  same mergeability.

Sketches are deterministic for fixed data + parameters but NOT
exchangeable across engines, so the declared query registers rows-only;
the error bound vs the exact answer is asserted in tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_event_stats(
    events: DataFrame, rsd: float = 0.02, accuracy: int = 10_000
) -> DataFrame:
    """Per event_type: approximate distinct users + value percentiles,
    with the exact row count alongside (exact and sketch aggregates
    share one partial-aggregation pass)."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], accuracy).alias("value_pcts"),
    )


def exact_event_stats(events: DataFrame) -> DataFrame:
    """The exact twin (for error-bound tests and small-data parity)."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias(
            "value_pcts"
        ),
    )


def distinct_sketch_state(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Materializable distinct-count STATE: one Datasketches-HLL binary
    per key (``F.hll_sketch_agg``). Unlike ``approx_count_distinct`` —
    which yields only a number — the sketch column persists (e.g. one
    row per day) and re-aggregates later, so 'distinct users over any
    date range' is a merge of daily states, never a rescan of history.
    """
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, lg_k).alias("distinct_sketch"))


def merge_distinct_sketches(
    state: DataFrame, keys: list[str], estimate_col: str = "approx_distinct"
) -> DataFrame:
    """Roll sketch states up to coarser keys: union the binaries, then
    estimate. The exchange carries fixed-size sketches (2^lg_k bytes),
    not distinct values."""
    return state.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("distinct_sketch")).alias(estimate_col)
    )
