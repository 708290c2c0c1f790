"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 ⊕ / §2.10): a per-user running profile (event count, first
seen, running value sum) maintained in explicit group state across
micro-batches — the escape hatch for stateful semantics Spark's built-in
window/dedup operators can't express.

State is kept as integers (event count, floor-quantized value sum, first
timestamp in µs): exact, order-free, and byte-stable in the state store —
the same determinism policy the batch side uses, which is what makes the
operator's output DuckDB-oracle-checkable after an AvailableNow drain.

Scale notes:
- state is O(distinct users) rows of 3 longs — the state store scales with
  entity cardinality, not event volume;
- in 24×7 use, add a GroupStateTimeout to expire idle users instead of
  NoTimeout (here the drain is finite so state lifetime is one run);
- Arrow ships each user's batch rows into Python grouped — the shuffle is
  on user_id, identical to the batch groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, first_ts_us BIGINT, value_qsum BIGINT"
)
_STATE_SCHEMA = "n BIGINT, s BIGINT, first BIGINT"


def user_profile_stateful(events: DataFrame) -> DataFrame:
    """events stream → one running profile row per user per batch."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s, first = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            n += len(pdf)
            s += int(pdf["value_q"].sum())
            batch_first = int(pdf["ts_us"].min())
            first = batch_first if first is None else min(first, batch_first)
        state.update((n, s, first))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_ts_us": [first],
                "value_qsum": [s],
            }
        )

    prepped = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("value_q"),
    )
    profiled = prepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return profiled.select(
        "user_id",
        "n_events",
        F.timestamp_micros("first_ts_us").alias("first_ts"),
        (F.col("value_qsum").cast("double") / F.lit(1e6)).alias("value_sum"),
    )
