"""Streaming invariants beyond the oracle gate: the foreachBatch upsert
sink must be idempotent (a replayed drain converges — the exact bug class
the reference's blind COPY + retries had), and watermarked dedup must
remove every duplicate of a doubled stream.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from data_pipeline_team5_spark.plans.catalog import table
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
    # table() handles the TIMESTAMP(NANOS) legacy conf; a bare
    # spark.read.parquet here only ever worked while the streaming reader
    # leaked nanosAsLong=true into the session (fixed — see below).
    events = table(spark, SF_SMALL, "events")
    n = events.count()
    deduped = drain_to_memory(
        dedup_within_watermark(read_events_stream(spark, SF_SMALL)),
        output_mode="append",
    )
    assert deduped.count() == n
    assert deduped.select("event_id").distinct().count() == n


def test_stream_reader_restores_session_conf(spark):
    """read_events_stream needs the nanosAsLong legacy conf while the
    source resolves, but must NOT leak it: a later unrelated batch read of
    a TIMESTAMP(NANOS) file in the same session would silently change
    semantics (the batch reader in plans/catalog.py got the same fix)."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, "false")
    stream = read_events_stream(spark, SF_SMALL)
    assert spark.conf.get(key, "false") == prior
    # The restored conf must not break the drain itself: the source captured
    # the flag at resolution time.
    out = drain_to_memory(
        stream.groupBy("event_type").count(), output_mode="complete"
    )
    assert out.count() > 0
    assert spark.conf.get(key, "false") == prior


def test_stream_neardup_ingest_equals_batch_form_and_really_streams(spark):
    """The streaming ingest dedup must (a) process the new slice as
    MULTIPLE micro-batches — one per arrival file — and (b) emit exactly
    the batch incremental pair set, bitwise: within-batch pairs via
    new-vs-new banding, cross-batch pairs via the per-batch index fold.
    A fold bug (e.g. a batch failing to join the index) drops exactly the
    cross-batch pairs, which (b) catches."""
    from pyspark.sql import functions as F

    from data_pipeline_team5_spark.operators.dedup import (
        PRODUCTION_MAX_BUCKET,
    )
    from data_pipeline_team5_spark.pipeline import neardup_incremental_pairs
    from data_pipeline_team5_spark.plans.catalog import table
    from data_pipeline_team5_spark.streaming.jobs import neardup_ingest
    from tests.conftest import SF_SMALL

    docs = table(spark, SF_SMALL, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    streamed = neardup_ingest(
        spark, corpus, new, max_bucket=PRODUCTION_MAX_BUCKET
    )
    assert streamed.select("_batch").distinct().count() == 3
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in streamed.drop("_batch").collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in neardup_incremental_pairs(
            new,
            corpus.select("doc_id", "text"),
            max_bucket=PRODUCTION_MAX_BUCKET,
        ).collect()
    }
    assert got == want and len(want) > 0
    # cross-batch coverage really exercised: at 3 arrival files the odds
    # that every pair lands within one file are negligible, but assert it
    # structurally — at least one pair's endpoints are both new docs
    # (found either within a batch or across batches via the fold)
    assert any(a % 3 == 0 and b % 3 == 0 for a, b, _ in want)


def test_sliding_section_derivation_matches_true_state_machine(spark):
    """stream_window_panel derives its sliding section from the drained
    tumbling grid (one events drain — round 13, VERDICT r12 #2). Pin
    the derivation against the TRUE sliding-window state machine: an
    AvailableNow drain of streaming/jobs.py:sliding_7d must produce the
    identical rows."""
    from data_pipeline_team5_spark.plans.catalog import QUERIES
    from data_pipeline_team5_spark.streaming.jobs import sliding_7d

    panel = QUERIES["stream_window_panel"].fn(spark, SF_SMALL)
    derived = sorted(
        (r.win_start, r.event_type, r.n_events, r.value_sum)
        for r in panel.filter(F.col("section") == "sliding_7d").collect()
    )
    true_sm = sorted(
        (r.win_start, r.event_type, r.n_events, r.value_sum)
        for r in drain_to_memory(
            sliding_7d(read_events_stream(spark, SF_SMALL))
        ).collect()
    )
    assert derived == true_sm and len(derived) > 0
