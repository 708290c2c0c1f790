"""Streaming invariants beyond the oracle gate: the foreachBatch upsert
sink must be idempotent (a replayed drain converges — the exact bug class
the reference's blind COPY + retries had), and watermarked dedup must
remove every duplicate of a doubled stream.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from data_pipeline_team5_spark.streaming.jobs import (
    dedup_within_watermark,
    drain_to_memory,
    read_events_stream,
    upsert_daily,
)
from tests.conftest import SF_SMALL

SINK = "/root/repo/.scratch/test_upsert_sink"


def _day_counts(df):
    return {
        (r.event_date, r.n): None
        for r in df.groupBy("event_date")
        .agg(F.count("*").alias("n"))
        .collect()
    }


def test_upsert_sink_is_idempotent(spark):
    shutil.rmtree(SINK, ignore_errors=True)
    first = _day_counts(
        upsert_daily(spark, read_events_stream(spark, SF_SMALL), SINK)
    )
    # replay the whole stream into the same sink (fresh checkpoint inside
    # upsert_daily) — dynamic partition overwrite must converge, not double
    second = _day_counts(
        upsert_daily(spark, read_events_stream(spark, SF_SMALL), SINK)
    )
    assert first == second
    shutil.rmtree(SINK, ignore_errors=True)


def test_dedup_removes_all_doubles(spark):
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    n = events.count()
    deduped = drain_to_memory(
        dedup_within_watermark(read_events_stream(spark, SF_SMALL)),
        output_mode="append",
    )
    assert deduped.count() == n
    assert deduped.select("event_id").distinct().count() == n
