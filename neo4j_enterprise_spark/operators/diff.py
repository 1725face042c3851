"""Snapshot diff: U2 — changed-records view between two versions.

Reference: ``DiffRecordStore``/``DiffStore`` expose old-vs-new record
versions and the incremental check walks only changes
(`consistency-check/.../store/DiffRecordStore.java`,
`checking/incremental/IncrementalDiffCheck.java:38-46`).

Plan: one full-outer join on the key, classified into added / removed /
changed. At scale both snapshots shuffle on the same key so the join is
co-partitioned; with bucketed snapshot layout it is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: Sequence[str]
) -> DataFrame:
    """Full-outer diff → (key, change STRING, <old_/new_ compare cols>)."""
    o = old.select(key, *compare_cols)
    n = new.select(key, *compare_cols)
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"old_{c}")
        n = n.withColumnRenamed(c, f"new_{c}")
    joined = o.join(n, key, "full_outer")
    old_present = F.col(f"old_{compare_cols[0]}").isNotNull()
    new_present = F.col(f"new_{compare_cols[0]}").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & (F.col(f"old_{c}") == F.col(f"new_{c}"))
    change = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return joined.withColumn("change", change).filter(F.col("change").isNotNull())


def snapshot_added(old: DataFrame, new: DataFrame) -> DataFrame:
    """EXCEPT-style: rows in ``new`` absent from ``old`` (same schema)."""
    return new.exceptAll(old)
