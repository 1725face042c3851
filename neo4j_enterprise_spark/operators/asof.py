"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For every left ("probe") row, pick the single most recent right
("reference") row with the same key whose timestamp is ≤ the probe's
(optionally within a tolerance window). The industry operator behind
trade/quote matching, attribution, and slowly-changing-dimension reads.

Scale design — union + sort + forward-fill, NOT a range join:

1. tag right rows 0, left rows 1;
2. union and window-partition by key, ordered by (ts, tag);
3. forward-fill the right payload as ONE struct with
   ``last(struct, ignorenulls=True)`` over rows UNBOUNDED
   PRECEDING..CURRENT (struct-not-columns so a matched row's
   legitimately-NULL field is carried, never skipped for an older
   row's value);
4. keep the left rows.

NULL semantics match SQL ``ASOF JOIN ... ON l.k = r.k``: NULL keys
never match (NULL-key right rows are dropped before the union;
NULL-key left rows pass through unmatched).

One shuffle on the key, linear work per partition, no candidate-pair
explosion — a ``left.ts >= right.ts`` range join would be O(|L|·|R|)
per key and is exactly the plan this avoids. At equal timestamps the
right row sorts first (tag 0), so equality matches like ``ASOF JOIN``'s
``right.ts <= left.ts``. Skewed keys split like any windowed op: salt
the key, forward-fill per salt, then repair the first rows of each salt
range with a second pass over the (tiny) boundary set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: each left row gains the payload of the latest
    right row with matching ``on`` keys and ``right.ts <= left.ts``
    (NULLs when no such row, like a left outer join).

    ``right_cols`` limits the forward-filled payload (default: every
    non-key, non-ts right column); payload columns arrive suffixed.
    ``tolerance_seconds`` voids matches older than the window.
    """
    from pyspark.sql.types import StructField, StructType

    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = [f"{c}{suffix}" for c in right_cols]
    matched_ts = f"__asof_ts{suffix}"

    # SQL equality semantics (r12 NULL sweep): a NULL key never matches —
    # Spark windows would otherwise gather all NULL-key rows into ONE
    # partition and "match" them to each other, where DuckDB's
    # ASOF ... ON l.k = r.k leaves the left row unmatched. Dropping
    # NULL-key RIGHT rows reproduces that exactly: NULL-key left rows
    # still flow through (their partition simply has nothing to fill).
    null_key = None
    for k in keys:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    right = right.filter(~null_key)

    # The forward-filled unit is ONE struct, not per-column last():
    # last(col, ignorenulls=True) per column skips a matched row whose
    # field is legitimately NULL and steals an OLDER row's value — and
    # different payload columns could even come from DIFFERENT right
    # rows (r12 NULL sweep caught this on view_value). The struct is
    # NULL for left rows and non-NULL (fields may be NULL) for right
    # rows, so one last(ignorenulls) picks exactly the latest right ROW.
    fill = "__asof_fill"
    fill_type = StructType(
        [StructField(p, right.schema[c].dataType) for c, p in zip(right_cols, payload)]
        + [StructField(matched_ts, right.schema[right_ts].dataType)]
    )

    left_cols = list(left.columns)
    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_tag"),
        F.lit(None).cast(fill_type).alias(fill),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_tag"),
        F.struct(
            *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
            F.col(right_ts).alias(matched_ts),
        ).alias(fill),
    ).select(*l_tagged.columns)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", "__asof_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left_cols,
        "__asof_tag",
        F.last(fill, ignorenulls=True).over(w).alias(fill),
    )
    out = (
        filled.filter(F.col("__asof_tag") == 1)
        .select(
            *left_cols,
            *[F.col(f"{fill}.{p}").alias(p) for p in payload],
            F.col(f"{fill}.{matched_ts}").alias(matched_ts),
        )
    )
    if tolerance_seconds is not None:
        stale = (
            F.col(left_ts).cast("double") - F.col(matched_ts).cast("double")
        ) > tolerance_seconds
        out = out.select(
            *left_cols,
            *[F.when(stale, F.lit(None)).otherwise(F.col(p)).alias(p) for p in payload],
            F.when(stale, F.lit(None)).otherwise(F.col(matched_ts)).alias(matched_ts),
        )
    return out.withColumnRenamed(matched_ts, f"matched_ts{suffix}")
