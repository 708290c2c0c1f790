"""Long→wide pivot with deterministic cell naming and MAX(CASE) semantics.

Mirrors /root/reference/dbt_project/dbt_project/models/transform/
box_office_data.sql:20-31 — GROUP BY key, one ``AGG(CASE WHEN pivot=v THEN
metric END)`` per (value × metric) cell. We emit the expression list directly
(rather than ``DataFrame.pivot``) because:

1. names are fully controlled → oracle hash-match (SURVEY.md §7 "hard parts");
2. it is exactly one hash-aggregate job — like ``pivot(col, values)`` with an
   explicit value list, never the extra distinct-collection job;
3. MAX-as-cell-combiner (the reference's accidental-duplicate collapse) is
   explicit, not an API default.

At 100 TB the plan is a single partial→shuffle→final HashAggregate on the
group key; cell count is bounded by the explicit value list so the row width
is known at plan time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import MONEY, dec_to_double

_AGGS = {"max": F.max, "min": F.min, "sum": F.sum, "avg": F.avg}


def pivot_max_cells(
    df: DataFrame,
    group_key: str | Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    cells: Sequence[tuple[str, str, str]],
    cell_type: str = MONEY,
) -> DataFrame:
    """GROUP BY ``group_key`` emitting ``{value}_{alias}`` columns.

    cells: (agg_name, metric_col, alias_suffix) — e.g. ("max",
    "l_extendedprice", "max_sales") with values ["A","N"] yields columns
    a_max_sales, n_max_sales. Metrics run through exact DECIMAL and emerge
    DOUBLE (functions/scalars.py policy).
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    exprs: list[Column] = []
    for agg_name, metric, suffix in cells:
        agg = _AGGS[agg_name]
        for v in pivot_values:
            cell = F.when(F.col(pivot_col) == v, F.col(metric).cast(cell_type))
            exprs.append(
                dec_to_double(agg(cell)).alias(f"{v.lower()}_{suffix}")
            )
    return df.groupBy(*keys).agg(*exprs)


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long inverse (property-testing support: unpivot∘pivot ≈ id).

    Uses the built-in ``unpivot`` (Spark ≥3.4) — a zero-shuffle generator.
    """
    return df.unpivot(
        ids=list(id_cols),
        values=list(value_cols),
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
