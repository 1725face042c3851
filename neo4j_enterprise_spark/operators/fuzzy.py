"""Entity resolution: blocked fuzzy joins.

The all-pairs edit-distance join is O(n·m) and dies at scale; the
standard shape is block → verify: a cheap deterministic blocking key
(prefix, stable substring, phonetic code) turns the cross product into
an equi-join, and the exact distance runs only inside blocks. Recall
is governed by the blocking scheme — pass several keys and union
(multi-blocking) when one key can be corrupted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    block: Callable[[Column], Column],
    max_dist: int = 2,
    left_id: str = "lid",
    right_id: str = "rid",
) -> DataFrame:
    """Blocked fuzzy equi-join: candidates share ``block(col)``, matches
    verify ``levenshtein <= max_dist``.

    ``left``/``right``: (id, col). Output (lid, rid, dist). One shuffle
    on the blocking key; the verify is JVM-side levenshtein on
    candidate pairs only — never the cross product.
    """
    lb = left.select(
        F.col(left_id), F.col(col).alias("__l"), block(F.col(col)).alias("__b")
    )
    rb = right.select(
        F.col(right_id), F.col(col).alias("__r"), block(F.col(col)).alias("__b")
    )
    return (
        lb.join(rb, "__b")
        .withColumn("dist", F.levenshtein(F.col("__l"), F.col("__r")).cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select(left_id, right_id, "dist")
    )
