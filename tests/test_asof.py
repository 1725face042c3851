"""As-of join operator semantics (equal-ts inclusion, tolerance, no-match)."""

from __future__ import annotations

from neo4j_enterprise_spark.operators.asof import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 100.0, 10), (1, 205.0, 11), (2, 50.0, 12), (3, 10.0, 13)],
        "k long, ts double, probe_id long",
    )
    right = spark.createDataFrame(
        [(1, 100.0, 900), (1, 200.0, 901), (2, 60.0, 902)],
        "k long, ts double, ref_id long",
    )
    return left, right


def test_asof_picks_latest_at_or_before(spark):
    left, right = _fixture(spark)
    out = {
        r["probe_id"]: r["ref_id_right"]
        for r in asof_join(left, right, on="k").collect()
    }
    # equal ts matches (like ASOF's right.ts <= left.ts); later refs don't
    assert out == {10: 900, 11: 901, 12: None, 13: None}


def test_asof_tolerance_voids_stale_matches(spark):
    left, right = _fixture(spark)
    out = {
        r["probe_id"]: (r["ref_id_right"], r["matched_ts_right"])
        for r in asof_join(left, right, on="k", tolerance_seconds=4.0).collect()
    }
    assert out[10] == (900, 100.0)  # age 0 ≤ 4
    assert out[11] == (None, None)  # age 5 > 4
    assert out[12] == (None, None)


def test_asof_keeps_every_left_row_exactly_once(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, on="k")
    assert out.count() == left.count()
    assert sorted(r["probe_id"] for r in out.collect()) == [10, 11, 12, 13]
