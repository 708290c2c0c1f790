"""Windows family (SURVEY.md §2.5 W1-W6, §2.6 O4): derive the reference API's
precomputed chart fields from raw facts.

Reference parity targets: daily_csv_pipeline.py:71-87 stores ``rank``,
``rankInten``, ``rankOldAndNew``, ``salesInten``/``salesChange``,
``salesAcc``/``audiAcc`` straight from the API; README.md:193-196 asks for a
7-day trendline; daily_csv_pipeline.py:28-38 shows every raw table is a
pre-limited top-10 (O4) that the engine re-derives as rank ≤ 10.

All queries run over the shared (day × brand) fact (plans/_facts.py) — at
scale: one broadcast dim join + one hash agg, then exactly one extra shuffle
per window partitioning key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.windows import (
    cumulative,
    day_over_day,
    moving_frame,
    new_old_flag,
    rank_change,
    rank_in_day,
)
from data_pipeline_team5_spark.plans._facts import BRAND_DAILY_SQL, brand_daily
from data_pipeline_team5_spark.plans.catalog import register

_BD = f"WITH brand_daily AS ({BRAND_DAILY_SQL})"


@register(
    "w1_rank_in_day",
    oracle=f"""
        {_BD}
        SELECT show_range, p_brand, sales,
               CAST(RANK() OVER (PARTITION BY show_range ORDER BY sales DESC) AS INT) AS rank_num
        FROM brand_daily
        ORDER BY show_range, rank_num, p_brand
    """,
    doc="W1 (daily_csv_pipeline.py:72 'rank'): chart position per day by "
    "sales. Shuffles once on show_range; per-day state ≤ #brands, never "
    "skewed at scale.",
    headline=True,
    tags=("window", "rank"),
)
def w1_rank_in_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = brand_daily(spark, sf_dir).select("show_range", "p_brand", "sales")
    return (
        rank_in_day(bd, "show_range", "sales")
        .withColumn("rank_num", F.col("rank_num").cast("int"))
        .orderBy("show_range", "rank_num", "p_brand")
    )


@register(
    "w2_rank_change",
    oracle=f"""
        {_BD},
        ranked AS (
            SELECT show_range, p_brand,
                   CAST(RANK() OVER (PARTITION BY show_range ORDER BY sales DESC) AS INT) AS rank_num
            FROM brand_daily
        )
        SELECT show_range, p_brand, rank_num,
               CAST(rank_num - LAG(rank_num) OVER (PARTITION BY p_brand ORDER BY show_range) AS INT) AS rank_inten
        FROM ranked
        ORDER BY p_brand, show_range
    """,
    doc="W2 (daily_csv_pipeline.py:72 'rankInten'): rank delta vs the brand's "
    "previous charted day — lag over the entity timeline. NULL on first "
    "appearance (honest derivation; the API fills 0).",
    tags=("window", "lag"),
)
def w2_rank_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = brand_daily(spark, sf_dir).select("show_range", "p_brand", "sales")
    ranked = rank_in_day(bd, "show_range", "sales").withColumn(
        "rank_num", F.col("rank_num").cast("int")
    )
    return (
        rank_change(ranked, "p_brand", "show_range")
        .withColumn("rank_inten", F.col("rank_inten").cast("int"))
        .select("show_range", "p_brand", "rank_num", "rank_inten")
        .orderBy("p_brand", "show_range")
    )


@register(
    "w3_new_old_flag",
    oracle=f"""
        {_BD}
        SELECT show_range, p_brand,
               CASE WHEN LAG(show_range) OVER (PARTITION BY p_brand ORDER BY show_range) IS NULL
                    THEN 'NEW' ELSE 'OLD' END AS rank_old_and_new
        FROM brand_daily
        ORDER BY p_brand, show_range
    """,
    doc="W3 (daily_csv_pipeline.py:72 'rankOldAndNew'): NEW on a brand's "
    "first chart appearance, OLD after — first-appearance detection via lag "
    "IS NULL over the entity timeline.",
    tags=("window", "lag"),
)
def w3_new_old_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = brand_daily(spark, sf_dir).select("show_range", "p_brand")
    return (
        new_old_flag(bd, "p_brand", "show_range")
        .orderBy("p_brand", "show_range")
    )


@register(
    "w4_day_over_day",
    oracle=f"""
        {_BD}
        SELECT show_range, p_brand, sales,
               sales - LAG(sales) OVER (PARTITION BY p_brand ORDER BY show_range) AS sales_inten,
               100.0 * (sales - LAG(sales) OVER (PARTITION BY p_brand ORDER BY show_range))
                     / LAG(sales) OVER (PARTITION BY p_brand ORDER BY show_range) AS sales_change
        FROM brand_daily
        ORDER BY p_brand, show_range
    """,
    doc="W4 (daily_csv_pipeline.py:73-74 'salesInten'/'salesChange'): "
    "day-over-day delta and percent. Inputs are exact decimal-sourced "
    "doubles, so the subtraction/division match the oracle bitwise.",
    tags=("window", "lag"),
)
def w4_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = brand_daily(spark, sf_dir).select("show_range", "p_brand", "sales")
    return (
        day_over_day(bd, "p_brand", "show_range", "sales")
        .orderBy("p_brand", "show_range")
    )


@register(
    "w5_cumulative",
    oracle=f"""
        {_BD}
        SELECT show_range, p_brand,
               CAST(SUM(CAST(sales AS DECIMAL(18,2))) OVER (
                    PARTITION BY p_brand ORDER BY show_range
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS sales_acc,
               CAST(SUM(CAST(audience AS DECIMAL(18,2))) OVER (
                    PARTITION BY p_brand ORDER BY show_range
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS audi_acc
        FROM brand_daily
        ORDER BY p_brand, show_range
    """,
    doc="W5 (daily_csv_pipeline.py:73-74 'salesAcc'/'audiAcc'): running "
    "cumulative totals per brand. Accumulated in DECIMAL (exact, "
    "order-independent) and cast to DOUBLE once at the end.",
    tags=("window", "frame"),
)
def w5_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = brand_daily(spark, sf_dir)
    out = cumulative(bd, "p_brand", "show_range", "sales", out="sales_acc")
    out = cumulative(out, "p_brand", "show_range", "audience", out="audi_acc")
    return out.select(
        "show_range", "p_brand", "sales_acc", "audi_acc"
    ).orderBy("p_brand", "show_range")


@register(
    "w6_moving_7d",
    oracle=f"""
        {_BD}
        SELECT show_range, p_brand,
               CAST(SUM(CAST(sales AS DECIMAL(18,2))) OVER (
                    PARTITION BY p_brand ORDER BY show_range
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sales_7d
        FROM brand_daily
        ORDER BY p_brand, show_range
    """,
    doc="W6 (README.md:193-196 trendline): moving total over the last 7 "
    "charted days per brand — rowsBetween(-6, 0) frame agg, exact decimal.",
    tags=("window", "frame"),
)
def w6_moving_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = brand_daily(spark, sf_dir).select("show_range", "p_brand", "sales")
    return (
        moving_frame(bd, "p_brand", "show_range", "sales", n_rows=7)
        .select("show_range", "p_brand", "sales_7d")
        .orderBy("p_brand", "show_range")
    )


@register(
    "o4_daily_top10",
    oracle=f"""
        {_BD}
        SELECT * FROM (
            SELECT show_range, p_brand, sales,
                   CAST(RANK() OVER (PARTITION BY show_range ORDER BY sales DESC) AS INT) AS rank_num
            FROM brand_daily
        ) WHERE rank_num <= 10
        ORDER BY show_range, rank_num, p_brand
    """,
    doc="O4 (daily_csv_pipeline.py:28-38): the KOFIC API's per-day top-10 "
    "chart, re-derived as rank ≤ 10 instead of inherited — W1 + filter. At "
    "scale Spark keeps only 10 rows per day past the window (rank filter is "
    "applied streaming within each partition).",
    tags=("window", "topk"),
)
def o4_daily_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = brand_daily(spark, sf_dir).select("show_range", "p_brand", "sales")
    return (
        rank_in_day(bd, "show_range", "sales")
        .withColumn("rank_num", F.col("rank_num").cast("int"))
        .filter(F.col("rank_num") <= 10)
        .orderBy("show_range", "rank_num", "p_brand")
    )


@register(
    "w7_rank_statistics",
    oracle=f"""
        {_BD}
        SELECT show_range, p_brand,
               CAST(DENSE_RANK() OVER w AS INT) AS drank,
               PERCENT_RANK() OVER w AS prank,
               CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM brand_daily
        WINDOW w AS (PARTITION BY show_range ORDER BY sales DESC, p_brand)
        ORDER BY show_range, drank, p_brand
    """,
    doc="W1 companions: dense_rank (no gaps after ties), percent_rank "
    "(both engines compute (rank-1)/(n-1) in double — bitwise identical), "
    "and sales quartiles via ntile(4). Same single window shuffle as "
    "w1_rank_in_day; the deterministic p_brand tiebreak makes ntile's "
    "row-number-based buckets engine-independent.",
    tags=("window", "rank"),
)
def w7_rank_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    bd = brand_daily(spark, sf_dir).select("show_range", "p_brand", "sales")
    w = Window.partitionBy("show_range").orderBy(
        F.desc("sales"), F.asc("p_brand")
    )
    return bd.select(
        "show_range",
        "p_brand",
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    ).orderBy("show_range", "drank", "p_brand")
