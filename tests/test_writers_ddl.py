"""S6 DDL semantics: create_if_not_exists creates once and is a no-op on
re-run (the reference ran CREATE TABLE IF NOT EXISTS before every load,
daily_csv_pipeline.py:118-154)."""

from __future__ import annotations

from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.sources.writers import create_if_not_exists
from tests.conftest import SF_SMALL


def test_create_if_not_exists_is_idempotent(spark):
    name = "t_s6_ddl"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    region = table(spark, SF_SMALL, "region")
    create_if_not_exists(region, name)
    n = spark.table(name).count()
    assert n == region.count() and n > 0
    # second call: table exists → ignore (no duplication, no error)
    create_if_not_exists(region, name)
    assert spark.table(name).count() == n
    spark.sql(f"DROP TABLE IF EXISTS {name}")
