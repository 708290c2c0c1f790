"""The subquery panel's decorrelation contract: Catalyst must rewrite
every subquery shape to a join — EXISTS/NOT EXISTS to LeftSemi/LeftAnti,
the uncorrelated IN to a semi join — with no per-row subquery execution
and no CartesianProduct (the global plan-invariant sweep also forbids the
latter; this pins the POSITIVE claim that the rewrite happened)."""

from __future__ import annotations

from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_SMALL


def test_subquery_panel_decorrelates_to_joins(spark):
    plan = (
        QUERIES["rel_subquery_panel"]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution()
        .toString()
    )
    assert "LeftSemi" in plan  # EXISTS and IN
    assert "LeftAnti" in plan  # NOT EXISTS
    assert "CartesianProduct" not in plan
