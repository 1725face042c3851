"""Incremental aggregate maintenance: update rollups from deltas, never
rescan the base.

The reference maintains derived state incrementally from the tx log
(`BackupService.doIncrementalBackup:246-420` replays only txs past the
high-water mark; `IncrementalDiffCheck` checks only touched records).
The analytics analog: a 100 TB corpus's rollups must absorb a day's
inserts/deletes by merging partial aggregates, not by re-aggregating
history.

Mechanism: keep aggregates in *state* form — per group key, a row count
plus self-decomposable measures (SUM; COUNT rides along; AVG = sum/n at
read time; MIN/MAX are NOT decomposable under deletes and need a
re-scan of the affected groups — documented non-member). States merge by
union + re-sum, deletes are negated states, and empty groups vanish when
their count reaches zero. Merging shuffles only the state rows (group
cardinality), never the base data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COUNT_COL = "n_rows"


def sum_state(
    df: DataFrame, keys: list[str], measures: dict[str, Column]
) -> DataFrame:
    """Aggregate ``df`` into mergeable state: one row per key with a row
    count and exact SUMs. Measures must be exact types (integer /
    decimal) — float sums are order-dependent and would break the
    'merge order doesn't matter' contract."""
    aggs = [F.count("*").alias(COUNT_COL)] + [
        F.sum(c).alias(name) for name, c in measures.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def negate_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """The deletion form of a state: merging it subtracts the rows it
    summarizes."""
    return state.select(
        *keys, *[(-F.col(c)).alias(c) for c in state.columns if c not in keys]
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge partial states (associative + commutative): union → one
    re-sum keyed on the group, dropping groups whose row count hits
    zero. Cost is O(total state rows) — independent of base size."""
    if not states:
        raise ValueError("need at least one state")
    value_cols = [c for c in states[0].columns if c not in keys]
    unioned = reduce(DataFrame.unionByName, states)
    merged = unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )
    return merged.filter(F.col(COUNT_COL) != 0)


def join_delta(
    base_left: DataFrame,
    base_right: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental JOIN maintenance: the delta of ``L ⋈ R`` when L gains
    ``delta_left`` and R gains ``delta_right`` is::

        ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR

    (the classic counting/delta rule for inner equi-joins; insert-only
    here — deletions compose via the negated-state convention of
    ``merge_states`` when the join feeds an aggregate).

    Scale shape: each term joins a DELTA (a day's ingest) against a
    base — the bases never join each other again, so the daily cost is
    O(|Δ| · matched), not O(|L ⋈ R|). With both bases bucketed on the
    join key, the delta side alone shuffles; broadcast applies whenever
    a delta is small enough.
    """
    new_view = (
        delta_left.join(base_right, on)
        .unionByName(base_left.join(delta_right, on))
        .unionByName(delta_left.join(delta_right, on))
    )
    return new_view
