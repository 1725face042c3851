"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in
`session.py`) subdivides oversized SHUFFLE partitions at runtime and is
the first line of defense. Salting is the explicit fallback for the
cases AQE can't fix — a broadcast-ineligible right side joined on a key
where one value dominates (every row of the hot key otherwise lands in
one task regardless of how AQE splits, because splitting happens per
partition, not per key when the build side must stay whole).

``salted_join`` scatters the left side across ``n_salts`` sub-keys with
a deterministic per-row salt and replicates the right side once per
salt, so a hot key's rows spread over ``n_salts`` tasks. Cost: the
right side shuffles ``n_salts``× — use it on joins where the right side
is much smaller than the hot key's row count (else bucketing/broadcast
is the answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the join key
    salted ``n_salts`` ways. Semantically identical to
    ``left.join(right, on, how)`` for ``inner``/``left`` joins; the
    salt is derived from the whole left row (deterministic, no RNG in
    the plan — rerunning a failed task re-derives the same salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
        .cast("int")
        .alias("__salt")
    )
    l_salted = left.select("*", salt)
    r_salted = right.join(
        F.broadcast(
            left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    return l_salted.join(r_salted, [*keys, "__salt"], how).drop("__salt")
