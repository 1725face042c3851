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


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    k: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact top-k terms in ONE map-side-combinable shuffle: partial
    hash aggregation per task, vocabulary-sized exchange, then
    TakeOrderedAndProject. Preferred whenever the value domain
    (vocabulary) is shuffle-safe — natural-language token domains are
    Zipfian and far smaller than the corpus, so the exchange carries
    per-task distinct terms, not tokens, all JVM-side. Use
    ``heavy_hitters`` (Misra-Gries) when the domain itself is too large
    to shuffle (adversarial/unbounded key spaces): it bounds the
    exchange to k rows per task at the cost of an Arrow pass over every
    token and a second verify scan."""
    w = F.sum(weight_col) if weight_col else F.count("*")
    return (
        df.groupBy(F.col(col).cast("string").alias("value"))
        .agg(w.cast("long").alias("weight"))
        .orderBy(F.desc("weight"), "value")
        .limit(k)
    )


def heavy_hitters_exact_threshold(
    df: DataFrame,
    col: str,
    k: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact φ-heavy hitters — every value with (weighted) frequency
    strictly above N/k — in ONE scan of the input: partial
    hash-aggregated count per value (the exchange carries per-task
    DISTINCT values, not occurrences — all JVM-side), total N derived
    from the counted table (never a second input scan), broadcast
    threshold filter. Same one-shuffle shape as ``heavy_hitters_exact``
    but threshold semantics instead of top-k; the registered plan
    ``docs_heavy_hitter_terms`` is this operator verbatim, so operator
    and plan cannot drift. Use ``heavy_hitters`` (Misra-Gries) when the
    value domain itself is too large to shuffle."""
    w = F.sum(weight_col) if weight_col else F.count("*")
    counted = df.groupBy(F.col(col).cast("string").alias("value")).agg(
        w.cast("long").alias("exact_count")
    )
    total = counted.agg(F.sum("exact_count").alias("n"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("exact_count") * k > F.col("n"))
        .select("value", "exact_count")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """Misra-Gries heavy hitters: every value with (weighted) frequency
    > N/k, found in one pass with k counters per partition.

    Two-level plan (the classic distributed MG composition):
    1. per-partition MG summaries via ``mapInPandas`` — each task keeps
       at most ``k`` (value, weight) counters, decrementing all when a
       new value arrives at capacity (Arrow-batched, no Python per-row
       loop across batches beyond the counter dict);
    2. merge = groupBy-sum of the surviving counters + top-k.

    Guarantee (proved in tests, not oracle-checkable — candidate
    UNDER-counts depend on partitioning): every true heavy hitter
    survives — a value with true weight W keeps a merged counter
    ≥ W - N/k > 0 when W > N/k — and reported counts never exceed true
    counts. The exchange carries ≤ k rows per task regardless of data
    size; the candidate set is verified exactly with one semi-join
    re-scan (standard two-pass heavy-hitters at scale).
    """
    import pandas as pd

    out_schema = f"value string, weight long"

    def mg_partial(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            # vectorized pre-aggregation: MG over (value, total-weight)
            # pairs is weighted MG, whose superset invariant
            # (count[v] >= true[v] - N/k) holds for ANY arrival order —
            # and the final output is exact-verified anyway. Iterating
            # unique values instead of rows cuts the Python loop ~10x.
            if weight_col:
                agg = pd.Series(
                    pdf[weight_col].to_numpy(), index=pdf[col].astype(str)
                ).groupby(level=0).sum()
            else:
                agg = pdf[col].astype(str).value_counts()
            for v, w in agg.items():
                w = int(w)
                if v in counters:
                    counters[v] += w
                elif len(counters) < k:
                    counters[v] = w
                else:
                    # decrement-all by the min survivor weight (batch
                    # form of MG's decrement; preserves the invariant
                    # count[v] >= true[v] - N/k)
                    dec = min(w, min(counters.values()))
                    counters = {
                        c: n - dec for c, n in counters.items() if n - dec > 0
                    }
                    if w - dec > 0:
                        counters[v] = w - dec
        yield pd.DataFrame(
            {"value": list(counters), "weight": list(counters.values())}
        )

    cols = [col] + ([weight_col] if weight_col else [])
    partials = df.select(*cols).mapInPandas(mg_partial, out_schema)
    return (
        partials.groupBy("value")
        .agg(F.sum("weight").alias("min_weight"))
        .orderBy(F.desc("min_weight"), "value")
        .limit(k)
    )


def verify_heavy_hitters(df: DataFrame, col: str, candidates: DataFrame) -> DataFrame:
    """Second pass: exact counts for the candidate set only (broadcast
    semi-join — the candidate set is ≤ k rows, so this re-scan counts a
    handful of keys, never a full groupBy over all distinct values)."""
    return (
        df.select(F.col(col).cast("string").alias("value"))
        .join(F.broadcast(candidates.select("value")), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("exact_count"))
    )


def count_min_build(
    df: DataFrame, col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch build: a depth×width counter table over the
    values of ``col``. Returns (row INT, cell INT, cnt BIGINT).

    Row hashes are md5-derived (``md5(row|value)`` → 60-bit int mod
    width) so the whole sketch is DETERMINISTIC and portable — unlike
    HLL/GK above, a CM sketch built this way has an exact SQL twin, so
    the declared query is hash-checkable, not rows-only. The build is
    one explode (×depth) + one map-side-combinable groupBy whose
    exchange carries at most depth·width rows per task — and states
    are MERGEABLE: sketches of two corpora add cell-wise (groupBy-sum),
    the property that lets a 100 TB pipeline keep per-shard/per-day
    sketches and union them without rescanning history.

    Estimates (``count_min_estimate``) upper-bound true counts;
    expected overcount ≤ e·N/width per the standard CM analysis.
    """
    cells = [
        F.struct(
            F.lit(i).alias("row"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.lit(str(i)), F.col(col))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            )
            .cast("int")
            .alias("cell"),
        )
        for i in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*cells)).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: estimate(x) = min over rows of the
    hashed cell counter (missing cell → 0). ``probes`` carries the
    values to estimate in ``col`` (any other columns pass through).
    The probe side is tiny by construction → broadcast equi-join on
    (row, cell); never a scan of the sketched corpus."""
    cells = [
        F.struct(
            F.lit(i).alias("row"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.lit(str(i)), F.col(col))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            )
            .cast("int")
            .alias("cell"),
        )
        for i in range(depth)
    ]
    probe_cells = probes.select(
        *probes.columns, F.explode(F.array(*cells)).alias("rc")
    ).select(*probes.columns, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        probe_cells.join(sketch, ["row", "cell"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cm_est"))
    )
