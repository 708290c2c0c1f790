"""dbt-style SQL models executed natively on Spark.

The reference's transform layer is authored as Jinja-templated SQL models
run by dbt against Redshift (`box_office_data.sql`, `box_office_showrange.sql`
+ `dbt_project.yml` vars). A user switching engines keeps that authoring
model here: models are SQL text with a tiny var-substitution step (the X4
dynamic query builder), executed by ``spark.sql`` over registered views, and
optionally materialized (`+materialized: table` ≡ CTAS, S9).

Semantics are identical to the DataFrame-API pipeline
(`pipeline.transform_daily` / `transform_pivot`) — asserted by
tests/test_sql_models.py — so SQL-first and DataFrame-first users see the
same results from the same engine. Catalyst compiles both to the same
physical shape: one partial→final HashAggregate; the generated MAX(CASE)
cell list mirrors the reference's Jinja loop (box_office_data.sql:23-29)
with a bounded, plan-time-known column list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_team5_spark.functions.scalars import dsum_sql
from data_pipeline_team5_spark.sources.writers import (
    ctas,
    write_parquet_partitioned,
)

import datetime as _dt
import re as _re


def _validated_dates(dates: list[str]) -> list[str]:
    """ISO-validate every date before it reaches SQL text — the DataFrame
    surface validates via date.fromisoformat, and interpolating an
    unvalidated string into a DATE literal is an injection hole."""
    if not dates:
        raise ValueError("dates must be a non-empty list of ISO dates")
    for d in dates:
        _dt.date.fromisoformat(d)  # raises on anything malformed
    return dates


def _validated_ident(name: str) -> str:
    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"not a valid SQL identifier: {name!r}")
    return name

# box_office_showrange.sql:6-29 on the long table: the Jinja per-table
# UNION ALL + re-agg collapses to one GROUP BY over the date-scoped scan.
SHOWRANGE_MODEL = """
SELECT show_range,
       {sums}
FROM {source}
WHERE show_range IN ({date_list})
GROUP BY show_range
ORDER BY show_range
"""

_SHOWRANGE_SUMS = [
    ("sales", "total_sales_sum"),
    ("total_sales", "acc_sales_sum"),
    ("audience_num", "total_audience_sum"),
    ("total_audience_num", "acc_audience_sum"),
    ("screen_num", "screen_num_sum"),
    ("screen_show", "screen_show_sum"),
]

# box_office_data.sql:20-31: GROUP BY movie key, one MAX(CASE) cell per
# (date × metric); NULL where the movie did not chart that day.
DATA_MODEL = """
SELECT title, code,
       {cells}
FROM {source}
WHERE show_range IN ({date_list})
GROUP BY title, code
ORDER BY title, code
"""

_DATA_METRICS = ["sales", "total_sales", "audience_num", "total_audience_num"]

_CELL = (
    "CAST(CAST(MAX(CASE WHEN date_format(show_range, 'yyyyMMdd') = '{day}' "
    "THEN CAST({metric} AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) "
    "AS `{day}_{metric}`"
)


def render_showrange(dates: list[str], source: str = "box_office_daily") -> str:
    """Render the showrange model for an ISO date list (X4/X5 vars)."""
    sums = ",\n       ".join(
        dsum_sql(c, a) for c, a in _SHOWRANGE_SUMS
    )
    date_list = ", ".join(
        f"DATE '{d}'" for d in _validated_dates(dates)
    )
    return SHOWRANGE_MODEL.format(
        sums=sums, source=_validated_ident(source), date_list=date_list
    )


def render_data(dates: list[str], source: str = "box_office_daily") -> str:
    """Render the pivot model: the reference's Jinja loop emitting one
    MAX(CASE) per (day × metric) becomes this Python loop."""
    dates = _validated_dates(dates)
    cells = ",\n       ".join(
        _CELL.format(day=d.replace("-", ""), metric=m)
        for m in _DATA_METRICS
        for d in dates
    )
    date_list = ", ".join(f"DATE '{d}'" for d in dates)
    return DATA_MODEL.format(
        cells=cells, source=_validated_ident(source), date_list=date_list
    )


def run_model(
    spark: SparkSession,
    sql: str,
    source_df: DataFrame,
    source_name: str = "box_office_daily",
    materialize_as: str | None = None,
) -> DataFrame:
    """Execute one rendered model over ``source_df`` registered as a view;
    ``materialize_as`` gives dbt's `+materialized: table` (CTAS).

    The temp view occupies the session-global namespace under
    ``source_name`` (and stays registered — an un-materialized return is
    a lazy plan over it); sharing one SparkSession across threads with
    the same source_name is therefore a race, as in dbt itself where a
    model name is unique per run."""
    if materialize_as == source_name:
        # spark.table() would resolve the temp view (it shadows catalog
        # tables) and return the raw source instead of the model output
        raise ValueError(
            "materialize_as must differ from source_name "
            f"({source_name!r} would shadow the materialized table)"
        )
    source_df.createOrReplaceTempView(source_name)
    out = spark.sql(sql)
    if materialize_as:
        ctas(out, materialize_as)
        out = spark.table(materialize_as)
    return out


def run_model_incremental(
    spark: SparkSession,
    render,
    source_df: DataFrame,
    target_path: str,
    dates: list[str],
    partition_by: str = "show_range",
    source_name: str = "box_office_daily",
) -> list[str]:
    """dbt `+materialized: incremental`: process only dates absent from the
    target, append them as partitions; returns the dates actually run.

    dbt's incremental filter is `WHERE date > (SELECT max(date) FROM this)`;
    the partition-set difference used here is its gap-tolerant superset
    (a backfilled hole in the middle still gets processed). The write is
    the idempotent dynamic partition overwrite, so re-running a date
    converges instead of duplicating — at 100 TB each daily run touches
    one partition of the target, never rewrites history.
    """
    import os

    # Partition discovery by DIRECTORY LISTING, not a dataset scan: the
    # values live in the partition dir names, and scanning full history
    # every day defeats the point of incremental runs. (Object stores:
    # swap in the store's list API at the same O(partitions) cost.)
    if os.path.isdir(target_path):
        existing = {
            e.split("=", 1)[1]
            for e in os.listdir(target_path)
            if e.startswith(f"{partition_by}=")
        }
    elif os.path.exists(target_path):
        raise ValueError(
            f"incremental target {target_path!r} exists but is not a "
            "partitioned dataset directory"
        )
    else:  # first run: target does not exist yet
        existing = set()
    new_dates = [d for d in dates if d not in existing]
    if not new_dates:
        return []
    out = run_model(
        spark, render(new_dates), source_df, source_name=source_name
    )
    write_parquet_partitioned(out, target_path, partition_by=partition_by)
    # Report only dates that actually materialized a partition: a date
    # with no source rows writes nothing and must stay eligible, not be
    # declared done and then rediscovered as missing forever after.
    written = {
        str(r[0])
        for r in out.select(partition_by).distinct().collect()
    }
    return [d for d in new_dates if d in written]
