"""The dbt-equivalent data tests the reference promised (README.md:144-148,
SURVEY.md §5.3): not-null, composite uniqueness, accepted values — run
against the engine's own outputs (ingested box-office rows and the shared
brand_daily fact), plus negative cases proving the checks actually fire.
"""

from __future__ import annotations

import json

from data_pipeline_team5_spark.functions.checks import run_checks
from data_pipeline_team5_spark.plans._facts import brand_daily
from data_pipeline_team5_spark.sources.ingest import ingest_box_office_json
from tests.conftest import SF_SMALL


def _kofic_doc() -> str:
    rows = [
        {
            "rnum": str(i + 1),
            "rank": str(i + 1),
            "rankOldAndNew": "NEW" if i % 2 else "OLD",
            "movieCd": str(1000 + i),
            "movieNm": f"movie {i}",
            "openDt": "2025-01-01",
            "salesAmt": str(100 * (10 - i)),
        }
        for i in range(10)
    ]
    return json.dumps(
        {
            "boxOfficeResult": {
                "boxofficeType": "일별 박스오피스",
                "showRange": "20250102~20250102",
                "dailyBoxOfficeList": rows,
            }
        }
    )


def test_ingest_output_passes_schema_contract(spark):
    df = ingest_box_office_json(spark, _kofic_doc())
    results = run_checks(
        df,
        not_null=["title", "show_range", "rank_num"],
        unique=[["code", "show_range"]],
        accepted_values={"new_entry": ["NEW", "OLD"]},
    )
    assert all(v == 0 for v in results.values()), results


def test_brand_daily_fact_is_unique_per_day_brand(spark):
    bd = brand_daily(spark, SF_SMALL)
    results = run_checks(
        bd,
        not_null=["show_range", "p_brand", "sales", "audience"],
        unique=[["show_range", "p_brand"]],
    )
    assert all(v == 0 for v in results.values()), results


def test_checks_fire_on_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", "NEW"), (1, "a", "WAT"), (None, "b", "OLD")],
        "code INT, day STRING, new_entry STRING",
    )
    results = run_checks(
        df,
        not_null=["code"],
        unique=[["code", "day"]],
        accepted_values={"new_entry": ["NEW", "OLD"]},
    )
    assert results["not_null:code"] == 1
    assert results["unique:code,day"] == 1
    assert results["accepted_values:new_entry"] == 1


def test_relationships_check_counts_orphans(spark):
    from data_pipeline_team5_spark.functions.checks import run_checks
    from data_pipeline_team5_spark.plans.catalog import table
    from tests.conftest import SF_SMALL

    orders = table(spark, SF_SMALL, "orders")
    customer = table(spark, SF_SMALL, "customer")
    ok = run_checks(
        orders, relationships=[("o_custkey", customer, "c_custkey")]
    )
    assert ok == {"relationships:o_custkey->c_custkey": 0}
    # remove some parents → orphans surface
    broken = customer.filter("c_custkey % 5 != 0")
    bad = run_checks(
        orders, relationships=[("o_custkey", broken, "c_custkey")]
    )
    assert bad["relationships:o_custkey->c_custkey"] > 0


def test_freshness_check(spark):
    from data_pipeline_team5_spark.functions.checks import check_freshness
    from data_pipeline_team5_spark.plans.catalog import table
    from tests.conftest import SF_SMALL

    orders = table(spark, SF_SMALL, "orders")
    # sf0.001 fixture orders end 2001-08-01
    assert check_freshness(orders, "o_orderdate", 2, "2001-08-02") == 0
    assert check_freshness(orders, "o_orderdate", 2, "2001-08-09") == 6
    empty = orders.filter("1=0")
    assert check_freshness(empty, "o_orderdate", 2, "2001-08-02") > 0


def test_freshness_handles_string_dates(spark):
    from data_pipeline_team5_spark.functions.checks import check_freshness

    df = spark.createDataFrame(
        [("2026-08-10",), ("2026-08-12",)], ["ingest_date"]
    )
    assert check_freshness(df, "ingest_date", 2, "2026-08-13") == 0
    assert check_freshness(df, "ingest_date", 2, "2026-08-20") == 6
