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


def test_rel_join_panel_has_all_three_join_types(spark):
    """rel_join_panel consolidates the left/semi/anti join surface into one
    query (VERDICT r4 #2); its physical plan must actually contain all
    three join operators — if Catalyst ever rewrites one away (e.g. a
    future optimization folds the semi join into an aggregate), the panel
    would silently stop evidencing that join type."""
    df = QUERIES["rel_join_panel"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for join_type in ("LeftOuter", "LeftSemi", "LeftAnti"):
        assert join_type in plan, f"{join_type} missing from rel_join_panel plan"


def test_source_dup_report_single_corpus_exchange(spark):
    """source_dup_report claims ONE corpus-sized shuffle (the fp
    repartition shared by the (fp, source) aggregation and the fp
    window). HashPartitioning(fp, source) would NOT satisfy the window's
    ClusteredDistribution(fp), so without the explicit repartition
    Catalyst plans a second corpus-grain exchange (ADVICE r8). Pin that
    exactly one hashpartitioning exchange mentions fp, and that no
    exchange partitions on (fp, source)."""
    import re

    df = QUERIES["source_dup_report"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    fp_exchanges = [e for e in exchanges if "fp#" in e]
    assert len(fp_exchanges) == 1, f"expected one fp exchange: {exchanges}"
    assert "source#" not in fp_exchanges[0], (
        f"fp exchange also clusters on source — the window cannot reuse "
        f"it: {fp_exchanges[0]}"
    )
