"""Slowly-changing-dimension maintenance (SCD Type 2): absorb a CDC
batch into a versioned dimension without rewriting history.

The reference's analog is snapshot lineage (`sources/snapshot.py`,
`BranchedDataPolicy`): immutable versions, new facts append. SCD2 is
the row-level form a 100 TB pipeline uses for dimensions: each key
keeps a history of (valid_from, valid_to) intervals; the current row
has valid_to NULL.

Scale shape: one full-outer equi-join on the dimension key per batch —
the batch is the small side (broadcast when it fits); history rows of
untouched keys stream through unchanged (no rewrite amplification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN = None  # valid_to of the current row


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    batch_ts: int,
) -> DataFrame:
    """Apply one CDC batch to an SCD2 dimension.

    ``dim``: (key, *attrs, valid_from, valid_to) — history + current
    rows. ``updates``: (key, *attrs) — the batch's latest value per key.
    Per key: unchanged values pass through; changed values close the
    current row at ``batch_ts`` and append a new open row; brand-new
    keys append an open row.
    """
    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())
    upd = updates.select(key, *[F.col(a).alias(f"__u_{a}") for a in attrs])
    j = cur.join(upd, key, "full_outer")
    changed = F.col("valid_from").isNotNull() & F.col(f"__u_{attrs[0]}").isNotNull() & (
        ~F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
            F.struct(*[F.col(f"__u_{a}").alias(a) for a in attrs])
        )
    )
    is_new = F.col("valid_from").isNull()
    # current rows: closed if changed, untouched otherwise
    kept = j.filter(~is_new).select(
        key,
        *attrs,
        "valid_from",
        F.when(changed, F.lit(batch_ts)).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
    )
    # new open rows: changed keys (new value) + brand-new keys
    opened = j.filter(changed | is_new).select(
        key,
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.lit(batch_ts).alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    return hist.unionByName(kept).unionByName(opened)


def scd2_as_of(dim: DataFrame, ts: int) -> DataFrame:
    """Point-in-time read: the dimension exactly as it stood at ``ts``
    (rows whose validity interval covers ts — open rows count). With
    the dimension partitioned by key, this is a pure filter: no shuffle,
    full partition pruning on a valid_from-sorted layout."""
    return dim.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )
