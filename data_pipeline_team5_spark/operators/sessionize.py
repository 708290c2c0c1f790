"""Batch sessionization: the gaps-and-islands analogue of
``F.session_window`` (streaming/jobs.py:session_windows).

Two window passes over one shuffle on the entity key: flag a new session
when the gap to the previous event is ≥ the threshold, prefix-sum the flags
into session ids, then aggregate. Semantics match Spark's session_window
exactly (half-open [ts, ts+gap) merge rule, end = last event + gap), which
tests/test_sessionize.py asserts by running both and comparing.

Scale: state per entity is its event timeline within one shuffle partition
— the same partitioning the streaming form uses; no skew beyond the
heaviest single user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 6 * 3600,
) -> DataFrame:
    """(key, ts, …) → one row per session: start, end (last + gap), count.

    Gap comparison and end arithmetic run on ``unix_micros`` so sub-second
    timestamps keep full precision (a seconds cast would mis-bucket
    sub-second gaps and truncate session ends).
    """
    gap_us = gap_seconds * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
            >= F.lit(gap_us)
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = df.withColumn("_new_s", new_s)
    sid = F.sum("_new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("_sid", sid)
    return (
        sessions.groupBy(key_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.timestamp_micros(
                F.unix_micros(F.max(F.col(ts_col))) + F.lit(gap_us)
            ).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(key_col, "session_start", "session_end", "n_events")
    )
