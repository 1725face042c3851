"""Append-mode streaming rollup: watermark eviction + batch parity.

The production twin of the complete-mode parity harness
(`plans/relational.py:events_stream_hourly_append`): outputMode("append")
to a file sink, state dropped as the watermark closes windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_enterprise_spark.catalog import load_table
from neo4j_enterprise_spark.plans.relational import run_events_append_rollup


def test_append_rollup_matches_batch_and_evicts_state(spark, sf_dir):
    result, progress = run_events_append_rollup(spark, sf_dir, fresh=True)
    got = [
        (r["hour_epoch"], r["event_type"], r["n_events"], round(r["total_value"], 2))
        for r in result.collect()
    ]
    ev = load_table(spark, sf_dir, "events")
    want = [
        (r["hour_epoch"], r["event_type"], r["n_events"], round(r["total_value"], 2))
        for r in (
            ev.groupBy(
                F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_value"),
            )
            .orderBy("hour_epoch", "event_type")
        ).collect()
    ]
    assert got == want, "append-mode output must equal the batch rollup"
    assert len(got) > 0

    # State eviction: at termination only OPEN windows (the sentinel's
    # own window, within the 2h watermark delay of it) may remain in the
    # state store — closed real windows must have been dropped. Complete
    # mode by contrast would retain every (window, event_type) group.
    assert progress is not None, "fresh run must report state metrics"
    ops = progress.get("stateOperators") or []
    assert ops, f"no state operator metrics in progress: {progress}"
    rows_total = ops[0]["numRowsTotal"]
    n_types = ev.select("event_type").distinct().count()
    closed_groups = len(got)
    assert rows_total <= 3 * (n_types + 1), (
        f"state store holds {rows_total} rows at termination - "
        f"watermark eviction not happening (complete-mode-like retention "
        f"would be ~{closed_groups + rows_total})"
    )
    assert rows_total < closed_groups, (
        f"state rows ({rows_total}) not smaller than total closed "
        f"groups ({closed_groups})"
    )


def test_session_append_matches_batch_and_evicts_state(spark, sf_dir):
    from neo4j_enterprise_spark.plans.relational import run_events_sessions_append

    result, progress = run_events_sessions_append(spark, sf_dir, fresh=True)
    got = [
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in result.collect()
    ]
    assert got, "session output must be non-empty"
    # batch reference: gap sessions via lag/cumsum
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    s = ev.withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev_us").isNull()
            | (F.unix_micros("ts") - F.col("prev_us") > gap_us),
            1,
        ).otherwise(0),
    )
    g = s.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = [
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in (
            g.groupBy("user_id", "sid")
            .agg(
                F.min(F.unix_micros("ts")).alias("session_start_us"),
                (F.max(F.unix_micros("ts")) + gap_us).alias("session_end_us"),
                F.count("*").alias("n_events"),
            )
            .orderBy("user_id", "session_start_us")
        ).collect()
    ]
    assert got == want, "streaming session merge must equal batch gap sessions"
    # eviction: only the sentinel's open session may remain in state
    assert progress is not None
    rows_total = progress["stateOperators"][0]["numRowsTotal"]
    assert rows_total < len(got), (
        f"state rows ({rows_total}) not smaller than closed sessions ({len(got)})"
    )


def test_catchup_tail_keeps_null_ts_rows(spark, tmp_path):
    """The r10 catch-up twin's seam predicate: a NULL ts fails BOTH
    range filters, so without the explicit isNull() branch those rows
    vanish from the union while the batch oracle keeps them as a NULL
    hour group. Replay the seam logic on a frame with NULL ts rows."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 05:00:00", "click", 1.0),
            (2, "2024-01-02 05:00:00", "click", 2.0),
            (3, None, "click", 4.0),
        ],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    lo, hi = ev.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).first()
    cut = (lo + hi) // 2
    backfill = ev.filter((F.unix_micros("ts") < cut) | F.col("ts").isNull())
    tail = ev.filter(F.unix_micros("ts") >= cut)
    union = backfill.unionByName(tail)
    assert union.count() == ev.count()  # nothing lost at the seam
    assert backfill.filter(F.col("ts").isNull()).count() == 1
