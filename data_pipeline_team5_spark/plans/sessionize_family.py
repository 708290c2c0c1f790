"""Batch sessionization query (operators/sessionize.py): the same session
semantics as the streaming ``session_window`` job, derived with plain
window functions — proving the engine computes sessions identically in
batch and streaming (tests/test_sessionize.py compares the two directly).
The oracle is the identical gaps-and-islands SQL the streaming family uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_team5_spark.operators.sessionize import sessionize
from data_pipeline_team5_spark.plans.catalog import register, table


@register(
    "sessionize_batch",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 6 HOUR AS session_end,
               COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    doc="Batch gaps-and-islands sessionization (6-hour gap) over events — "
    "identical semantics to stream_session_windows, one shuffle on "
    "user_id, two window passes (operators/sessionize.py:sessionize).",
    tags=("session", "window"),
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    out = sessionize(events, "user_id", "ts", gap_seconds=6 * 3600)
    return out.orderBy("user_id", "session_start")
