"""The named-query catalog: every SURVEY.md §2 operator as a (Spark fn,
DuckDB oracle SQL) pair, plus north-star extension operators."""

from data_pipeline_team5_spark.plans.catalog import (
    QUERIES,
    Query,
    register,
    table,
)

__all__ = ["QUERIES", "Query", "register", "table"]
