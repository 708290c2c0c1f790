"""Relational-family checks beyond the oracle diff: the two as-of join
implementations (JVM window composition vs cogrouped pandas merge_asof) must
be row-identical — they are advertised as interchangeable."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_SMALL


def test_asof_implementations_agree(spark):
    # The pandas form is not catalog-registered (one driver slot per
    # operator family); this equality pin is its correctness evidence.
    from data_pipeline_team5_spark.plans.relational import (
        rel_asof_attribution_pandas,
    )

    a = QUERIES["rel_asof_attribution"].fn(spark, SF_SMALL).collect()
    b = rel_asof_attribution_pandas(spark, SF_SMALL).collect()
    assert len(a) == len(b) > 0
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_asof_unmatched_purchases_are_null(spark):
    rows = QUERIES["rel_asof_attribution"].fn(spark, SF_SMALL).collect()
    # A purchase before any click of the same user must yield NULL match,
    # and every matched click must be at-or-before the purchase.
    for r in rows:
        if r.matched_ts is not None:
            assert r.matched_ts <= r.ts


def test_range_join_ignores_inverted_intervals(spark):
    import datetime

    from data_pipeline_team5_spark.operators.joins import range_join_bucketed

    T = datetime.datetime
    pts = spark.createDataFrame(
        [(T(2024, 1, 5, 12),)], ["ts"]
    )
    ivs = spark.createDataFrame(
        [
            (1, T(2024, 1, 5), T(2024, 1, 6)),    # valid: matches
            (2, T(2024, 1, 6), T(2024, 1, 5)),    # inverted: must not
            (3, T(2024, 1, 5), T(2024, 1, 5)),    # empty: must not
        ],
        ["iv_id", "start_ts", "end_ts"],
    )
    out = range_join_bucketed(pts, "ts", ivs, "start_ts", "end_ts")
    assert [r.iv_id for r in out.collect()] == [1]


def test_asof_null_field_not_backfilled_from_older_row(spark):
    """A NULL field in the matched right row must stay NULL — filling each
    payload column independently would stitch a composite of two rows."""
    from data_pipeline_team5_spark.operators.joins import (
        asof_join,
        asof_join_pandas,
    )

    left = spark.createDataFrame([(1, 3)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 1, 10, 1.0), (1, 2, 20, None)],
        "k BIGINT, ts BIGINT, rid BIGINT, amount DOUBLE",
    )
    for impl in (asof_join, asof_join_pandas):
        out = impl(
            left, right, key="k", ts="ts", tiebreak="rid",
            right_cols=["rid", "amount"],
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["matched_rid"] == 20
        assert r["matched_amount"] is None, impl.__name__


def test_asof_null_tiebreak_loses_tie_in_both_impls(spark):
    from data_pipeline_team5_spark.operators.joins import (
        asof_join,
        asof_join_pandas,
    )

    left = spark.createDataFrame([(1, 3)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 2, None, 5.0), (1, 2, 7, 9.0)],
        "k BIGINT, ts BIGINT, rid BIGINT, amount DOUBLE",
    )
    for impl in (asof_join, asof_join_pandas):
        out = impl(
            left, right, key="k", ts="ts", tiebreak="rid",
            right_cols=["rid", "amount"],
        ).collect()
        assert out[0]["matched_amount"] == 9.0, impl.__name__


def test_davg_matches_oracle_formula(spark):
    """davg = decimal-exact sum cast to double, divided by count — pin the
    exported helper against the formula its docstring promises."""
    from data_pipeline_team5_spark.functions.scalars import davg
    from data_pipeline_team5_spark.plans.catalog import table
    from tests.conftest import SF_SMALL

    o = table(spark, SF_SMALL, "orders")
    got = o.agg(davg("o_totalprice", "m")).collect()[0]["m"]
    parts = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        F.count("o_totalprice").alias("n"),
    ).collect()[0]
    assert got == float(parts["s"]) / parts["n"]
