"""Dashboard-family checks beyond the oracle diff.

dash_approx_distinct is rows-only in the driver (HLL sketches differ across
engines by design) — this test pins down the property that matters: the
approximate distinct count tracks the exact one within HLL++'s default
relative-error budget.
"""

from __future__ import annotations

from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_SMALL


def test_approx_distinct_error_bound(spark):
    rows = QUERIES["dash_approx_distinct"].fn(spark, SF_SMALL).collect()
    assert rows, "no months in fixture"
    for r in rows:
        assert r.n_exact > 0
        rel_err = abs(r.n_approx - r.n_exact) / r.n_exact
        # Spark's default rsd is 5%; leave headroom for small-month noise.
        assert rel_err < 0.10, (
            f"month {r.month}: approx {r.n_approx} vs exact {r.n_exact} "
            f"(rel err {rel_err:.3f})"
        )


def test_hll_sketch_rollup_error_bound(spark):
    from data_pipeline_team5_spark.plans.catalog import QUERIES
    from tests.conftest import SF_MEDIUM

    rows = QUERIES["sketch_weekly_distinct"].fn(spark, SF_MEDIUM).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r.n_hll - r.n_exact) / r.n_exact < 0.02, r


def test_curation_funnel_empty_input_publishes_zeros(spark, tmp_path):
    from data_pipeline_team5_spark.plans.catalog import QUERIES, table
    from tests.conftest import SF_SMALL

    # real query over an empty documents fixture: stages must be 0, not NULL
    empty = table(spark, SF_SMALL, "documents").limit(0)
    empty.write.parquet(str(tmp_path / "documents.parquet"))
    rows = QUERIES["curation_funnel"].fn(spark, str(tmp_path)).collect()
    assert [(r.stage, r.n_docs) for r in rows] == [
        ("1_raw", 0), ("2_lang", 0), ("3_quality", 0), ("4_length", 0)
    ]
