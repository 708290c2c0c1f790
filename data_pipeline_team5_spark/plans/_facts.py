"""Shared derived fact tables used by the windows/dashboards families.

The reference's unit of analysis is (day × movie) box-office rows
(daily_csv_pipeline.py:71-87). FIXTURES.md-style mapping onto the TPC-H-ish
fixtures: day → l_shipdate, movie key → p_brand (25 stable values, like the
~25 movies in a 9-day chart window), sales → l_extendedprice, audience →
l_quantity. ``brand_daily`` is the long-format fact every window/dashboard
query derives from — at 100 TB this is a single partial→final hash aggregate
over day-partitioned parquet with the small ``part`` dim broadcast.

Both sides of the oracle contract are kept adjacent: the Spark builder and the
equivalent DuckDB CTE text, so the decimal-exact policy stays in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import dsum, to_day
from data_pipeline_team5_spark.plans.catalog import table


def brand_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(show_range, p_brand) → exact-decimal sales/audience sums.

    The join side is a 2-column projection of ``part`` (column pruning reaches
    the parquet scan) and is explicitly broadcast: at any scale the brand dim
    is tiny while lineitem is the 100 TB fact.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    )
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(to_day("l_shipdate").alias("show_range"), "p_brand")
        .agg(
            dsum("l_extendedprice", "sales"),
            dsum("l_quantity", "audience"),
        )
    )


# DuckDB mirror of brand_daily (values bitwise identical to the Spark side:
# exact DECIMAL sums, one final cast to DOUBLE).
BRAND_DAILY_SQL = """
    SELECT CAST(l.l_shipdate AS DATE) AS show_range,
           p.p_brand AS p_brand,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS sales,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS audience
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
"""


# Gaps-and-islands session oracle (6-hour gap) — the ONE definition both
# sessionize_batch and stream_session_windows pin against, so the
# batch ≡ streaming session contract cannot silently fork.
SESSION_ORACLE_SQL = """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 6 HOUR AS session_end,
               COUNT(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """
