"""Structured Streaming surface (SURVEY.md §2.9).

The reference is a daily-cron micro-batch system (daily_parquet_pipeline.py:174
schedules `0 0 * * *`; one new table per day is the "stream"). Here that maps
to real Structured Streaming: file-source ``readStream`` + event-time windows
+ watermarks, run with ``Trigger.AvailableNow`` so a scheduled invocation
drains everything outstanding and stops — the exact semantics of the
reference's nightly run, minus the clock coupling (dbt_dags.py:37 triggers by
wall clock 5 minutes after ingest and just hopes; here completion is the
trigger).
"""
