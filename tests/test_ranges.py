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


def test_funnel_orders_steps_strictly(spark):
    import datetime as dt

    from neo4j_enterprise_spark.operators.funnel import funnel, funnel_counts

    t = lambda m: dt.datetime(2026, 1, 1, 12, m)
    rows = [
        # u1 completes A→B→C in order
        (1, "A", t(0)), (1, "B", t(5)), (1, "C", t(9)),
        # u2 did B BEFORE A only → stalls at step 1
        (2, "B", t(0)), (2, "A", t(3)),
        # u3 out of order C,B,A but also B after A → reaches step 2
        (3, "C", t(0)), (3, "A", t(1)), (3, "B", t(2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    r = {x["user"]: x for x in funnel(ev, ["A", "B", "C"]).collect()}
    assert r[1]["ts_3"] == t(9)
    assert r[2]["ts_1"] == t(3) and r[2]["ts_2"] is None and r[2]["ts_3"] is None
    assert r[3]["ts_2"] == t(2) and r[3]["ts_3"] is None  # C was before B
    counts = {x["step"]: x["n_users"] for x in funnel_counts(ev, ["A", "B", "C"]).collect()}
    assert counts == {1: 3, 2: 2, 3: 1}
