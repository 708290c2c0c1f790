"""Batch sessionization query (operators/sessionize.py): the same session
semantics as the streaming ``session_window`` job, derived with plain
window functions — proving the engine computes sessions identically in
batch and streaming (tests/test_sessionize.py compares the two directly).
The oracle is the identical gaps-and-islands SQL the streaming family uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_team5_spark.operators.sessionize import sessionize
from data_pipeline_team5_spark.plans._facts import SESSION_ORACLE_SQL
from data_pipeline_team5_spark.plans.catalog import register, table


@register(
    "sessionize_batch",
    oracle=SESSION_ORACLE_SQL,
    doc="Batch gaps-and-islands sessionization (6-hour gap) over events — "
    "identical semantics to stream_session_windows, one shuffle on "
    "user_id, two window passes (operators/sessionize.py:sessionize).",
    headline=True,
    tags=("session", "window"),
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    out = sessionize(events, "user_id", "ts", gap_seconds=6 * 3600)
    # session-grain output (~input size): no final global sort — the
    # driver compare is order-insensitive and the sort would re-shuffle
    # everything the user_id Exchange already co-located
    return out
