"""Range (interval) join — points matched into [start, end] intervals.

Spark plans a plain ``p.ts BETWEEN i.start AND i.end`` join as
BroadcastNestedLoopJoin (or a cross product per key) — quadratic and
un-shuffleable. The scale pattern is BUCKETIZATION:

1. explode each interval to the fixed-width buckets it covers
   (``sequence(floor(start/w), floor(end/w))``);
2. map each point to its single bucket (``floor(ts/w)``);
3. equi-join on (key, bucket) — a normal shuffle hash join;
4. re-apply the exact BETWEEN predicate.

Each (point, interval) candidate appears exactly once (the point's
bucket is unique), so no dedup pass is needed. Candidate volume scales
with points + interval-span/width instead of |P|·|I| per key; pick
``bucket_width`` near the median interval length so most intervals
explode to O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Inner-join points into the intervals that contain them
    (``start <= ts <= end``, inclusive both ends like SQL BETWEEN).

    Timestamp/numeric columns are compared on their DOUBLE value; keys
    join as equi-columns. Returns point columns + interval columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / b),
                F.floor(F.col(end_col).cast("double") / b),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point_ts).cast("double") / b))
    return (
        pt.join(iv, [*keys, "__bucket"])
        .filter(
            F.col(point_ts).cast("double").between(
                F.col(start_col).cast("double"), F.col(end_col).cast("double")
            )
        )
        .drop("__bucket")
    )
