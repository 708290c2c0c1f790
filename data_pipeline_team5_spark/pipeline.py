"""Batch pipeline runner — the engine's replacement for the three Airflow DAGs.

The reference chains 5 Celery tasks per day with JSON-string XCom hops and
couples ingest→transform by clock (dbt runs at 00:05 hoping ingest finished at
00:00 — SURVEY.md §3.2). Here each pipeline is ONE lazy Spark plan per stage
with real data dependencies (X1/X2 collapse), and retry is a job-level loop
(X3). The Jinja date-list templating (X4/X5) becomes an explicit
``dates: list[str]`` parameter.

daily_ingest      ≡ daily_csv_pipeline.py / daily_parquet_pipeline.py:183-228
transform_pivot   ≡ dbt box_office_data.sql via dbt_dags.py:42-62
transform_daily   ≡ dbt box_office_showrange.sql via dbt_dags.py:64-78
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import dsum
from data_pipeline_team5_spark.operators.pivoting import pivot_max_cells
from data_pipeline_team5_spark.sources.ingest import ingest_box_office_json
from data_pipeline_team5_spark.sources.writers import write_parquet_partitioned

log = logging.getLogger(__name__)


def run_with_retry(fn: Callable[[], None], retries: int = 1, delay_s: float = 1.0) -> None:
    """X3: the DAG-level ``retries: 1`` policy at job granularity (task-level
    retry is Spark's own scheduler)."""
    for attempt in range(retries + 1):
        try:
            fn()
            return
        except Exception:
            if attempt == retries:
                raise
            log.warning("pipeline attempt %d failed; retrying", attempt + 1)
            time.sleep(delay_s)


def last_n_days(end: date, n: int = 9) -> list[str]:
    """X4: dbt_dags.py:12-20 — yesterday-8 … yesterday as ISO strings."""
    return [(end - timedelta(days=i)).isoformat() for i in range(n - 1, -1, -1)]


def daily_ingest(
    spark: SparkSession, raw_json: str, warehouse_path: str
) -> None:
    """S1→S2→P1-P4→idempotent partitioned write, as one lazy plan."""
    df = ingest_box_office_json(spark, raw_json)
    write_parquet_partitioned(df, warehouse_path, partition_by="show_range")


def transform_daily(df: DataFrame, dates: list[str]) -> DataFrame:
    """box_office_showrange semantics on the long table: date-scope filter
    (P7 → partition pruning) + per-day multi-SUM (A1/A2)."""
    return (
        df.filter(F.col("show_range").isin([date.fromisoformat(d) for d in dates]))
        .groupBy("show_range")
        .agg(
            dsum("sales", "total_sales_sum"),
            dsum("total_sales", "acc_sales_sum"),
            dsum("audience_num", "total_audience_sum"),
            dsum("total_audience_num", "acc_audience_sum"),
            dsum("screen_num", "screen_num_sum"),
            dsum("screen_show", "screen_show_sum"),
        )
        .orderBy("show_range")
    )


def transform_pivot(df: DataFrame, dates: list[str]) -> DataFrame:
    """box_office_data semantics: per-movie row, one column per (date ×
    metric), MAX cell combiner, NULL where a movie is absent that day —
    the N-way full-outer alignment (J1) as a single hash aggregate."""
    day_strs = [d.replace("-", "") for d in dates]
    scoped = df.filter(
        F.col("show_range").isin([date.fromisoformat(d) for d in dates])
    ).withColumn("day_key", F.date_format("show_range", "yyyyMMdd"))
    wide = pivot_max_cells(
        scoped,
        group_key=["title", "code"],
        pivot_col="day_key",
        pivot_values=day_strs,
        cells=[
            ("max", "sales", "sales"),
            ("max", "total_sales", "total_sales"),
            ("max", "audience_num", "audience_num"),
            ("max", "total_audience_num", "total_audience_num"),
        ],
    )
    return wide.orderBy("title", "code")
