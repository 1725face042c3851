"""Bucketized range join semantics (boundary inclusivity, multi-bucket
intervals, key isolation, once-per-pair)."""

from __future__ import annotations

from neo4j_enterprise_spark.operators.ranges import range_join


def _out(spark, bucket_width):
    points = spark.createDataFrame(
        [(1, 5.0, "p0"), (1, 10.0, "p1"), (1, 20.0, "p2"), (1, 25.0, "p3"), (2, 12.0, "p4")],
        "k long, ts double, pid string",
    )
    intervals = spark.createDataFrame(
        [(1, 10.0, 20.0, "iA"), (1, 15.0, 99.0, "iB"), (2, 0.0, 11.0, "iC")],
        "k long, start double, end double, iid string",
    )
    return sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, on="k", point_ts="ts", bucket_width=bucket_width
        ).collect()
    )


def test_range_join_between_is_inclusive_and_key_scoped(spark):
    # p1 hits iA's start boundary, p2 its end boundary AND iB's interior;
    # p4 (key 2) is outside iC and must not leak into key-1 intervals.
    expected = [("p1", "iA"), ("p2", "iA"), ("p2", "iB"), ("p3", "iB")]
    assert _out(spark, bucket_width=8.0) == expected


def test_range_join_invariant_to_bucket_width(spark):
    # every pair appears exactly once whether intervals span 1 or many buckets
    for width in (2.0, 50.0, 1000.0):
        assert _out(spark, width) == _out(spark, 8.0)
