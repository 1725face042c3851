"""Ordering operators: argmax-with-tiebreak and top-k per group.

Reference surface (SURVEY.md §2.6):
- O2 election winner — max credentials: highest ``latestTxId``, ties broken
  by lowest ``serverId`` (`cluster/.../DefaultElectionCredentials.java:42-55`).
- O1 slave priority sort + take-k — replicate to the first
  ``tx_push_factor`` slaves in priority order
  (`MasterTxIdGenerator.java:158-230`, `SlavePriorities.java:105-125`).

Both are rank-over-window plans; Spark computes them with a single shuffle
on the group key and no driver-side iteration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def argmax(df: DataFrame, group_cols: Sequence[str], order: Sequence[Column]) -> DataFrame:
    """O2: one winning row per group under a total order (ties must be
    broken by the caller's ``order`` — pass enough columns)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1).drop("__rk")
    )


def top_k_per_group(
    df: DataFrame, group_cols: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """O1: first k rows per group in priority order, rank exposed as
    ``rk`` (the reference iterates past k only on failure — the take-k
    core is this plan)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
