"""The fixture generator has shipped ``events.ts`` as TIMESTAMP(NANOS)
(rounds 1-4) and as timestamp[us] (round 5) — the readers sniff the parquet
footer and must produce identical µs TIMESTAMP output for either vintage
(plans/catalog.py:events_ts_unit). This pins both paths so the next
regeneration can't silently break one of them again.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from data_pipeline_team5_spark.plans.catalog import events_ts_unit, table
from data_pipeline_team5_spark.streaming.jobs import (
    drain_to_memory,
    read_events_stream,
)

# Sub-µs nanos exercise the truncation (not just scaling) semantics:
# 1500 ns must floor to 1 µs on both engines, never round to 2.
_TS_US = [1_700_000_000_000_000 + 1, 1_700_003_600_000_000 + 999]


def _write_events(dirpath, unit: str) -> str:
    ts = (
        pa.array([t * 1000 + 500 for t in _TS_US], pa.timestamp("ns"))
        if unit == "ns"
        else pa.array(_TS_US, pa.timestamp("us"))
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 10], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, f"{dirpath}/events.parquet")
    return str(dirpath)


def test_batch_reader_identical_across_vintages(spark, tmp_path):
    dirs = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        dirs[unit] = _write_events(d, unit)
    assert events_ts_unit(f"{dirs['ns']}/events.parquet") == "timestamp[ns]"
    assert events_ts_unit(f"{dirs['us']}/events.parquet") == "timestamp[us]"

    rows = {}
    for unit, d in dirs.items():
        df = table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        rows[unit] = sorted(tuple(r) for r in df.collect())
    assert rows["ns"] == rows["us"]
    # truncation, not rounding: the 500 ns tail must vanish
    assert rows["us"][0][1] == datetime.datetime.fromtimestamp(
        _TS_US[0] / 1e6, tz=datetime.timezone.utc
    ).replace(tzinfo=None)


def test_stream_reader_identical_across_vintages(spark, tmp_path):
    rows = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        _write_events(d, unit)
        out = drain_to_memory(
            read_events_stream(spark, str(d)), output_mode="append"
        )
        rows[unit] = sorted(tuple(r) for r in out.collect())
    assert rows["ns"] == rows["us"]
    assert len(rows["us"]) == 2
