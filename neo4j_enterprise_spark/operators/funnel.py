"""Funnel analysis: ordered multi-step conversion over an event stream.

The event-analytics twin of the traversal operators — "users who did A,
then B after A, then C after B" is a path query over time instead of
over graph edges. Each step is one equi-join on the entity key against
the previous step's first-reach time (shuffle on user_id only, partial
min aggregation map-side), so an N-step funnel costs N-1 co-keyed joins
regardless of event volume — no window over the full stream, no
per-user sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user first-reach times through an ordered funnel.

    Returns (user, ts_1 .. ts_N) where ``ts_k`` is the earliest time the
    user performed ``steps[k-1]`` strictly AFTER ``ts_{k-1}`` (NULL once
    a step is never reached; subsequent steps stay NULL by construction).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reach = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("ts_1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("__ts"))
            .join(reach.select("user", F.col(f"ts_{k - 1}").alias("__prev")), "user")
            .filter(F.col("__ts") > F.col("__prev"))
            .groupBy("user")
            .agg(F.min("__ts").alias(f"ts_{k}"))
        )
        reach = reach.join(nxt, "user", "left")
    return reach


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion counts per funnel step: (step, event_type, n_users).

    ``n_users`` at step k counts users whose ``ts_k`` is non-NULL —
    monotonically non-increasing down the funnel. The count rollup of a
    100 TB event log reduces to one row per step."""
    reach = funnel(events, steps, user_col, type_col, ts_col)
    counts = reach.agg(
        *[F.count(F.col(f"ts_{k}")).alias(f"ts_{k}") for k in range(1, len(steps) + 1)]
    )
    stack = ", ".join(f"{k}, '{s}', ts_{k}" for k, s in enumerate(steps, start=1))
    return counts.selectExpr(
        f"stack({len(steps)}, {stack}) as (step, event_type, n_users)"
    ).select(
        F.col("step").cast("long").alias("step"),
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
    )
