"""Engine-wide physical-plan invariants, every catalog query.

These are the 100 TB guardrails: a plan that violates one works fine at
test SF and dies at scale, so they are asserted here rather than reviewed
by hand. Allowed: BroadcastNestedLoopJoin (broadcast-bounded, e.g. the
5-row query side of knn_brute_force). Forbidden everywhere:

- CartesianProduct — an unbounded all-pairs shuffle join;
- BatchEvalPython — a row-at-a-time Python UDF in the plan (Arrow-batched
  ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas are the sanctioned
  Python surfaces).
"""

from __future__ import annotations

import pytest

from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_SMALL

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_killers(name, spark):
    df = QUERIES[name].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        assert op not in plan, f"{name}: {op} in physical plan"
