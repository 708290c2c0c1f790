"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_pipeline_team5_spark``; this module only
adapts the query catalog (plans/catalog.py) to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_team5_spark.plans.catalog import QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = daily_metrics_panel: the reference's box_office_showrange
    dbt model (per-day multi-SUM aggregation) plus its unpivot closure on
    the lineitem fixture (round-11 consolidation of the rounds-1-10
    flagship showrange_daily_agg with unpivot_daily_metrics).
    """
    return QUERIES["daily_metrics_panel"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; omitted → rows-only check."""
    return {
        name: q.oracle for name, q in QUERIES.items() if q.oracle is not None
    }
