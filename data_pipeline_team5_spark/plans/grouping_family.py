"""Grouping-sets + set-operation family (SURVEY.md §2.4/§2.6 footnotes).

The reference has no DISTINCT aggregate, grouping sets, cube, rollup,
INTERSECT or EXCEPT anywhere (verified in SURVEY §2.4/§2.6); Spark provides
all of them natively, and an analytics engine replacing the reference's
dashboard layer needs subtotal rows (ROLLUP), full margin tables (CUBE) and
cohort membership algebra (INTERSECT/EXCEPT). These queries expose that
surface with bitwise DuckDB oracles.

Oracle parity notes: both engines implement the same GROUPING() bitmask
convention (leftmost grouped column = most significant bit), and grouped
NULL cells are COALESCE'd to 'ALL' on both sides so the sort and the value
hash never see engine-specific NULL ordering.

Scale posture: ROLLUP/CUBE expand each input row into (levels) grouping
combinations *after* the map-side partial agg on the finest grouping —
Catalyst plans one Expand over the partials, so the shuffle carries
group-count rows, not input-count rows. INTERSECT/EXCEPT hash-shuffle both
sides on the full row; at 100 TB pre-project to the key columns first (as
here: single join-key column) so the shuffled payload is minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import dsum, dsum_sql
from data_pipeline_team5_spark.operators.skew import salted_distinct
from data_pipeline_team5_spark.plans.catalog import register, table


@register(
    "rollup_region_nation",
    oracle=f"""
        SELECT COALESCE(r.r_name, 'ALL') AS region,
               COALESCE(n.n_name, 'ALL') AS nation,
               CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS lvl,
               CAST(COUNT(*) AS BIGINT) AS n_custs,
               {dsum_sql('c.c_acctbal', 'total_acctbal')}
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)
        ORDER BY lvl, region, nation
    """,
    doc="ROLLUP(region, nation): per-nation rows, per-region subtotals, and "
    "the grand total in one pass — the dashboard 'with subtotals' table the "
    "reference would need a UNION of three queries for. grouping_id() "
    "disambiguates a real NULL key from a subtotal row; dims broadcast, "
    "the Expand runs over ~125 partial groups, not input rows.",
    headline=True,
    tags=("agg", "rollup", "grouping"),
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal", "total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "lvl",
            "n_custs",
            "total_acctbal",
        )
        .orderBy("lvl", "region", "nation")
    )


@register(
    "cube_status_priority",
    oracle=f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
                   AS lvl,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {dsum_sql('o_totalprice', 'total_sales')}
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY lvl, status, priority
    """,
    doc="CUBE(status, priority): all four grouping combinations (full "
    "cross-margin table) in one aggregation — 3 statuses × 5 priorities "
    "plus both margins and the grand total. Same Expand-over-partials "
    "shape as rollup_region_nation; the shuffle carries ≤ 4×15 group rows "
    "regardless of input size.",
    tags=("agg", "cube", "grouping"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_sales"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "lvl",
            "n_orders",
            "total_sales",
        )
        .orderBy("lvl", "status", "priority")
    )


@register(
    "setops_repeat_customers",
    oracle="""
        WITH y97 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE CAST(o_orderdate AS DATE) BETWEEN
                  DATE '1997-01-01' AND DATE '1997-12-31'
        ),
        y98 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
        )
        SELECT 'both' AS cohort, o_custkey
        FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
        UNION ALL
        SELECT 'churned' AS cohort, o_custkey
        FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98)
        ORDER BY cohort, o_custkey
    """,
    doc="INTERSECT / EXCEPT cohort algebra: customers active in both 1997 "
    "and 1998 ('both') vs active in 1997 only ('churned'). Both sides are "
    "pre-projected to the single key column before the set op, so the "
    "hash shuffle carries 8-byte keys — the 100 TB-safe way to run set "
    "algebra (never on wide rows).",
    tags=("setop", "intersect", "except"),
)
def setops_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    y97 = o.filter(
        day.between(F.lit("1997-01-01"), F.lit("1997-12-31"))
    ).select("o_custkey")
    y98 = o.filter(day >= F.lit("1998-01-01")).select("o_custkey")
    both = y97.intersect(y98).select(
        F.lit("both").alias("cohort"), "o_custkey"
    )
    churned = y97.subtract(y98).select(
        F.lit("churned").alias("cohort"), "o_custkey"
    )
    return both.unionByName(churned).orderBy("cohort", "o_custkey")


@register(
    "salted_distinct_per_priority",
    oracle="""
        SELECT o_orderpriority AS priority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY priority
    """,
    doc="Exact per-key COUNT(DISTINCT) under aggregation-state skew: 5 hot "
    "priority keys, each holding a huge distinct-customer set at scale. "
    "The distinct domain is hash-sharded 16 ways so no single reducer "
    "materializes a hot key's whole value set; shard counts add exactly "
    "because the shards partition the domain (operators/skew.py:"
    "salted_distinct). Oracle = the plain COUNT(DISTINCT) — salting is "
    "semantics-preserving. AQE skew-join splitting can't fix this case; "
    "this is the pattern that does at 100 TB.",
    tags=("agg", "distinct", "skew"),
)
def salted_distinct_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    out = salted_distinct(
        o, ["o_orderpriority"], "o_custkey", "n_custs", n=16
    )
    return out.select(
        F.col("o_orderpriority").alias("priority"), "n_custs"
    ).orderBy("priority")


@register(
    "sketch_weekly_distinct",
    oracle=None,  # DataSketches binary HLL not expressible in DuckDB SQL
    doc="Mergeable-sketch rollup — THE 100 TB distinct-count architecture: "
    "each day aggregates once into a tiny HLL sketch (DataSketches, "
    "hll_sketch_agg); any date-range distinct is then a UNION of stored "
    "sketches (hll_union_agg), never a rescan of raw events. Here: daily "
    "user sketches merged to weeks, exact recount alongside for "
    "validation (affordable at test SF only; pytest pins relative error "
    "< 2%). Unlike approx_count_distinct's one-shot estimate, these "
    "sketches are storable and re-mergeable across jobs and days.",
    tags=("sketch", "hll", "distinct"),
)
def sketch_weekly_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("ts", "user_id")
    day = F.to_date("ts").alias("day")
    daily = ev.groupBy(day).agg(F.hll_sketch_agg("user_id").alias("sk"))
    week = F.date_trunc("week", "day").cast("date").alias("week")
    merged = daily.groupBy(week).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_hll")
    )
    exact = ev.groupBy(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week")
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        merged.join(exact, "week")
        .select("week", "n_exact", "n_hll")
        .orderBy("week")
    )
