"""SQL-model surface ≡ DataFrame-API pipeline: the rendered dbt-style models
(models/__init__.py) must produce exactly the rows of transform_daily /
transform_pivot over the same ingested data — the SQL-first and
DataFrame-first interfaces are the same engine."""

from __future__ import annotations

from data_pipeline_team5_spark.models import (
    render_data,
    render_showrange,
    run_model,
)
from data_pipeline_team5_spark.pipeline import transform_daily, transform_pivot
from data_pipeline_team5_spark.sources.ingest import ingest_box_office_json
from tests.test_ingest_pipeline import DOC_D1, DOC_D2

DATES = ["2025-01-22", "2025-01-23"]


def _long_table(spark):
    return ingest_box_office_json(spark, [DOC_D1, DOC_D2])


def test_showrange_model_matches_dataframe_api(spark):
    df = _long_table(spark)
    sql_out = run_model(spark, render_showrange(DATES), df)
    api_out = transform_daily(df, DATES)
    assert sql_out.columns == api_out.columns
    assert sorted(map(tuple, sql_out.collect())) == sorted(
        map(tuple, api_out.collect())
    )


def test_data_model_matches_dataframe_api(spark):
    df = _long_table(spark)
    sql_out = run_model(spark, render_data(DATES), df)
    api_out = transform_pivot(df, DATES)
    assert sql_out.columns == api_out.columns
    rows_sql = sorted(map(tuple, sql_out.collect()))
    rows_api = sorted(map(tuple, api_out.collect()))
    assert rows_sql == rows_api
    # the pivot's full-outer semantics: a movie absent on a day is NULL there
    assert any(None in r for r in rows_sql)


def test_model_ctas_materialization(spark):
    df = _long_table(spark)
    out = run_model(
        spark,
        render_showrange(DATES),
        df,
        materialize_as="t_model_showrange",
    )
    assert spark.table("t_model_showrange").count() == out.count() > 0
    spark.sql("DROP TABLE IF EXISTS t_model_showrange")


def test_incremental_model_processes_only_new_dates(spark, tmp_path):
    from data_pipeline_team5_spark.models import run_model_incremental

    df = _long_table(spark)
    target = str(tmp_path / "showrange_incr")

    ran = run_model_incremental(
        spark, render_showrange, df, target, ["2025-01-22"]
    )
    assert ran == ["2025-01-22"]
    assert spark.read.parquet(target).count() == 1

    # second run with both dates: only the new one processes
    ran = run_model_incremental(spark, render_showrange, df, target, DATES)
    assert ran == ["2025-01-23"]
    out = spark.read.parquet(target)
    assert out.count() == 2

    # third run: nothing new, nothing touched
    assert run_model_incremental(
        spark, render_showrange, df, target, DATES
    ) == []
    assert spark.read.parquet(target).count() == 2


def test_render_rejects_bad_input():
    import pytest

    with pytest.raises(ValueError):
        render_showrange([])  # empty → invalid SQL otherwise
    with pytest.raises(ValueError):
        render_showrange(["2025-01-22') OR 1=1 --"])  # injection attempt
    with pytest.raises(ValueError):
        render_showrange(DATES, source="bad-name; DROP TABLE x")


def test_run_model_rejects_shadowing_materialization(spark):
    import pytest

    df = _long_table(spark)
    with pytest.raises(ValueError, match="shadow"):
        run_model(
            spark,
            render_showrange(DATES),
            df,
            materialize_as="box_office_daily",
        )


def test_incremental_reports_only_materialized_dates(spark, tmp_path):
    from data_pipeline_team5_spark.models import run_model_incremental

    df = _long_table(spark)
    target = str(tmp_path / "incr2")
    # a date with no source rows must stay eligible, not be declared done
    ran = run_model_incremental(
        spark, render_showrange, df, target, ["2025-01-22", "2030-01-01"]
    )
    assert ran == ["2025-01-22"]
    ran2 = run_model_incremental(
        spark, render_showrange, df, target, ["2025-01-22", "2030-01-01"]
    )
    assert ran2 == []  # still no source rows for 2030 → nothing ran again
