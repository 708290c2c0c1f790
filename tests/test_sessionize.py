"""Batch sessionization must equal the streaming session_window result —
the engine's sessions are one semantics with two execution strategies."""

from __future__ import annotations

from data_pipeline_team5_spark.operators.sessionize import sessionize
from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.streaming.jobs import (
    drain_to_memory,
    read_events_stream,
    session_windows,
)
from tests.conftest import SF_SMALL


def test_batch_equals_streaming_sessions(spark):
    events = table(spark, SF_SMALL, "events")
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(events, gap_seconds=6 * 3600).collect()
    }
    stream = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in drain_to_memory(
            session_windows(read_events_stream(spark, SF_SMALL), "6 hours")
        ).collect()
    }
    assert batch == stream
