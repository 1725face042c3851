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
