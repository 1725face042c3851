"""Sketch error bounds vs exact twins; salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.operators.sketches import approx_event_stats, exact_event_stats
from neo4j_enterprise_spark.operators.skew import salted_join


def test_approx_stats_error_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {r["event_type"]: r for r in approx_event_stats(ev).collect()}
    exact = {r["event_type"]: r for r in exact_event_stats(ev).collect()}
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert a["n_events"] == e["n_events"]  # exact agg rides along
        rel_err = abs(a["approx_users"] - e["exact_users"]) / max(e["exact_users"], 1)
        assert rel_err <= 0.06, f"{et}: HLL error {rel_err}"
    # GK guarantees RANK error ≤ 1/accuracy (it returns actual elements,
    # unlike interpolating exact percentiles) — assert each sketch value
    # falls inside the exact value bracket at rank ± 2%.
    brackets = {
        r["event_type"]: r["brackets"]
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile(
                "value",
                F.array(*[F.lit(x) for x in (0.48, 0.52, 0.93, 0.97, 0.97, 1.0)]),
            ).alias("brackets")
        )
        .collect()
    }
    for et, a in approx.items():
        b = brackets[et]
        for i, ap in enumerate(a["value_pcts"]):
            lo, hi = b[2 * i], b[2 * i + 1]
            assert lo <= ap <= hi, f"{et}: pct {ap} outside rank bracket [{lo}, {hi}]"


def _skewed(spark):
    # key 1 is hot (200 rows), keys 2..5 sparse; right has an unmatched key
    left = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(k, 900 + k) for k in range(2, 6)],
        "k long, payload long",
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (9, "never")], "k long, tag string"
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark)
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", n_salts=4).collect()))
    assert salted == plain


def test_salted_join_matches_plain_left(spark):
    left, right = _skewed(spark)
    plain = sorted(map(tuple, left.join(right, "k", "left").collect()))
    salted = sorted(
        map(tuple, salted_join(left, right, "k", n_salts=4, how="left").collect())
    )
    assert salted == plain


def test_distinct_sketch_states_merge_to_global_estimate(spark, sf_dir):
    from neo4j_enterprise_spark.operators.sketches import (
        distinct_sketch_state,
        merge_distinct_sketches,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    # state per (type, day) — the materialized form — then merged per type
    daily = distinct_sketch_state(ev, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_distinct_sketches(daily, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(exact)
    for et, est in merged.items():
        assert abs(est - exact[et]) / max(exact[et], 1) <= 0.05, (et, est, exact[et])


def test_profile_counts_nulls_and_ndv(spark):
    from neo4j_enterprise_spark.operators import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x long, y string"
    )
    out = {r["column"]: r for r in profile.profile(df, ["x", "y"]).collect()}
    assert out["x"]["n_rows"] == 4 and out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 3
    assert out["y"]["n_nulls"] == 1 and out["y"]["n_distinct"] == 2


def test_numeric_histogram_buckets_cover_range(spark):
    from neo4j_enterprise_spark.operators import profile

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    rows = sorted(profile.numeric_histogram(df, "v", 10).collect())
    assert sum(r["n"] for r in rows) == 100
    assert rows[0]["lo"] == 0.0 and rows[-1]["hi"] == 99.0
    # max value lands in the last bucket, not bucket 10
    assert rows[-1]["bucket"] == 9 and rows[-1]["n"] == 10


def test_heavy_hitters_superset_and_undercount(spark):
    from neo4j_enterprise_spark.operators.sketches import (
        heavy_hitters,
        verify_heavy_hitters,
    )

    # skewed stream: value "hot" = 40% of 2000 rows, "warm" = 20%,
    # the rest spread over 200 cold values
    rows = (
        [("hot",)] * 800 + [("warm",)] * 400 + [(f"c{i % 200}",) for i in range(800)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    hh = heavy_hitters(df, "v", k=10)
    got = {r["value"]: r["min_weight"] for r in hh.collect()}
    # every value with freq > N/k = 200 MUST survive
    assert "hot" in got and "warm" in got
    # MG counters never exceed the true counts
    assert got["hot"] <= 800 and got["warm"] <= 400
    # and undercount by at most N/k per partition-merge bound
    assert got["hot"] >= 800 - 2000 // 10
    exact = {
        r["value"]: r["exact_count"]
        for r in verify_heavy_hitters(df, "v", hh).collect()
    }
    assert exact["hot"] == 800 and exact["warm"] == 400


def test_heavy_hitters_exact_matches_mg_verified(spark):
    from neo4j_enterprise_spark.operators.sketches import (
        heavy_hitters,
        heavy_hitters_exact,
        verify_heavy_hitters,
    )

    rows = (
        [("hot",)] * 800 + [("warm",)] * 400 + [(f"c{i % 200}",) for i in range(800)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    exact = {
        r["value"]: r["weight"]
        for r in heavy_hitters_exact(df, "v", k=2).collect()
    }
    assert exact == {"hot": 800, "warm": 400}
    # single JVM-side shuffle: positive node assertions (HashAggregate
    # + TakeOrderedAndProject) plus the specific Python-eval node names
    # — not a blanket substring ban that any unrelated plan-node rename
    # could trip
    plan = heavy_hitters_exact(df, "v", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "BatchEvalPython" not in plan
    # and the exact path agrees with MG candidates + exact verify
    mg = verify_heavy_hitters(df, "v", heavy_hitters(df, "v", k=10))
    mg_top = {
        r["value"]: r["exact_count"]
        for r in mg.orderBy(F.desc("exact_count")).limit(2).collect()
    }
    assert mg_top == exact


def test_heavy_hitters_exact_threshold(spark):
    from neo4j_enterprise_spark.operators.sketches import (
        heavy_hitters_exact_threshold,
    )

    rows = (
        [("hot",)] * 800 + [("warm",)] * 400 + [(f"c{i % 200}",) for i in range(800)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    # N = 2000; threshold N/4 = 500 strictly: only "hot" (800) passes,
    # "warm" (400) does not
    got = {
        r["value"]: r["exact_count"]
        for r in heavy_hitters_exact_threshold(df, "v", k=4).collect()
    }
    assert got == {"hot": 800}
    # k=32 -> threshold 62.5: hot + warm, none of the 200 cold values (4 each)
    got32 = {
        r["value"]: r["exact_count"]
        for r in heavy_hitters_exact_threshold(df, "v", k=32).collect()
    }
    assert got32 == {"hot": 800, "warm": 400}
    # stays JVM-side like the top-k twin
    plan = (
        heavy_hitters_exact_threshold(df, "v", k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_count_min_overestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from neo4j_enterprise_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )

    vals = [f"t{i % 7}" for i in range(100)] + ["rare"]
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    sk = count_min_build(df, "tok", depth=4, width=16)
    truth = df.groupBy("tok").agg(F.count("*").alias("true_n"))
    est = count_min_estimate(sk, truth, "tok", depth=4, width=16)
    rows = est.collect()
    assert len(rows) == 8
    for r in rows:  # CM never under-counts
        assert r.cm_est >= r.true_n
    # mergeability: sketch(a ∪ b) == cellwise-sum(sketch(a), sketch(b))
    a = spark.createDataFrame([(v,) for v in vals[:40]], "tok string")
    b = spark.createDataFrame([(v,) for v in vals[40:]], "tok string")
    merged = (
        count_min_build(a, "tok", depth=4, width=16)
        .unionByName(count_min_build(b, "tok", depth=4, width=16))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_build(df, "tok", depth=4, width=16)
    assert merged.subtract(whole).count() == 0
    assert whole.subtract(merged).count() == 0
