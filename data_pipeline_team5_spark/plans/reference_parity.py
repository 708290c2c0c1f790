"""Reference-parity queries: the semantics of the two dbt models and the
ingest normalizations, re-expressed Spark-first on the TPC-H-ish fixtures
(FIXTURES.md maps box-office concepts → fixture tables: fact rows/day →
lineitem/orders, movie key → part/customer).

Citations point into /root/reference so parity is checkable:
- box_office_showrange.sql:1-29  → showrange_daily_agg (A1+A2)
- box_office_data.sql:1-32       → box_office_pivot (A3/A4/A5, J1 full-outer
  alignment as MAX(CASE) pivot), union + source-tag projection (O3/P6), global
  sort (O1)
- README.md:88,101,133 staging dedup claim → staging_dedup
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import (
    dec_to_double,
    dec_to_double_sql,
    dsum,
    dsum_sql,
    revenue_expr,
    to_day,
)
from data_pipeline_team5_spark.operators.pivoting import pivot_max_cells, unpivot
from data_pipeline_team5_spark.plans.catalog import register, table


_DAILY_METRICS = [
    "sum_qty",
    "sum_sales",
    "sum_revenue",
    "sum_disc",
    "n_rows",
    "n_orders",
]
_RECENT_METRICS = ["sum_qty", "sum_sales", "sum_disc"]
_RECENT_FROM = "1998-11-01"


def _daily_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's box_office_showrange daily aggregate (A1+A2): one
    groupBy — Catalyst's HashAggregate already does partial (map-side) +
    final across the shuffle, collapsing the reference's manual two-phase.
    COUNT(DISTINCT) runs as its own aggregation joined back on the
    2.5k-row day key — mixed into the SUM agg it would force the Expand
    path (every input row duplicated through both aggregation groups;
    measured ~2x on this query at sf0.1)."""
    li = table(spark, sf_dir, "lineitem")
    day = to_day("l_shipdate").alias("show_range")
    sums = li.groupBy(day).agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_sales"),
        dec_to_double(F.sum(revenue_expr())).alias("sum_revenue"),
        dsum("l_discount", "sum_disc", "decimal(8,4)"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    distincts = li.groupBy(day).agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    return sums.join(distincts, "show_range")


def _daily_wide_sql() -> str:
    return f"""
        SELECT CAST(l_shipdate AS DATE) AS show_range,
               {dsum_sql('l_quantity', 'sum_qty')},
               {dsum_sql('l_extendedprice', 'sum_sales')},
               {dec_to_double_sql("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,4))))")} AS sum_revenue,
               {dsum_sql('l_discount', 'sum_disc', 'DECIMAL(8,4)')},
               CAST(COUNT(*) AS DOUBLE) AS n_rows,
               CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
        FROM lineitem
        GROUP BY CAST(l_shipdate AS DATE)
    """


def _stack_sql(metrics: list[str], where: str = "") -> str:
    return " UNION ALL ".join(
        f"SELECT show_range, '{m}' AS metric, {m} AS value "
        f"FROM wide {where}"
        for m in metrics
    )


@register(
    "daily_metrics_panel",
    oracle=f"""
        WITH wide AS ({_daily_wide_sql()})
        SELECT * FROM (
            SELECT 'all_days' AS section, show_range, metric, value
            FROM ({_stack_sql(_DAILY_METRICS)})
            UNION ALL
            SELECT 'recent' AS section, show_range, metric, value
            FROM ({_stack_sql(_RECENT_METRICS,
                              f"WHERE show_range >= DATE '{_RECENT_FROM}'")})
        )
        ORDER BY section, show_range, metric
    """,
    doc="A1+A2 per-day multi-SUM hash agg (box_office_showrange.sql:6-29) "
    "and its long→wide→long closure (the unpivot inverse of the "
    "box_office_data pivot), as one section-tagged panel — round-11 "
    "same-scan consolidation of the rounds-1-10 driver-green "
    "showrange_daily_agg + unpivot_daily_metrics pair (the "
    "d5_d6_time_panel mechanism; frees one driver slot for "
    "exact_quantile_panel). The 2.5k-row wide daily aggregate is "
    "computed ONCE (see _daily_wide for the partial→final and "
    "COUNT(DISTINCT) plan rationale) and checkpoint-pinned; section "
    "'all_days' unpivots ALL six metrics of every day — every cell of "
    "the former wide result is still driver-hashed, now in long layout "
    "— and section 'recent' replays the former unpivot query's grain "
    "(3 metrics, days ≥ 1998-11-01) from the SAME materialized frame, "
    "so the panel scans lineitem exactly as often as showrange_daily_agg "
    "alone did. The shared frame is day-grain — bounded by calendar "
    "length (~2.5k rows) at ANY corpus size — so it round-trips through "
    "the driver as a literal local frame instead of a localCheckpoint "
    "pin (doubles/dates are bit-exact through collect; no executor "
    "storage is retained after the query, unlike a pin — the release "
    "discipline operators/ranks.py applies to its corpus-sized pins). "
    "Spark's built-in unpivot is a zero-shuffle row generator; counts "
    "emit as exact-in-double so the stack is uniformly DOUBLE under the "
    "decimal-exact sum policy.",
    headline=True,
    tags=("agg", "pivot", "unpivot", "reference"),
)
def daily_metrics_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.functions.localframe import local_frame

    computed = _daily_wide(spark, sf_dir)
    # local_frame (round 17, guide §4): the old createDataFrame(list) here
    # was a pickled Python RDD in 64 slices — each of the two unpivot
    # sections paid 64 zero-input Python-worker tasks (~15 task-s/section
    # profiled at sf0.1). The Arrow LocalTableScan form evaluates JVM-side.
    wide = local_frame(spark, computed.collect(), computed.schema)
    all_days = unpivot(
        wide,
        ["show_range"],
        _DAILY_METRICS,
        var_name="metric",
        value_name="value",
    ).select(F.lit("all_days").alias("section"), "*")
    recent = unpivot(
        wide.filter(F.col("show_range") >= F.lit(_RECENT_FROM)),
        ["show_range"],
        _RECENT_METRICS,
        var_name="metric",
        value_name="value",
    ).select(F.lit("recent").alias("section"), "*")
    return all_days.unionByName(recent).orderBy(
        "section", "show_range", "metric"
    )


_FLAGS = ["A", "N", "R"]


@register(
    "box_office_pivot",
    oracle="""
        SELECT p.p_brand AS p_brand,
               CAST(CAST(MAX(CASE WHEN l.l_returnflag = 'A' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS a_max_sales,
               CAST(CAST(MAX(CASE WHEN l.l_returnflag = 'N' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS n_max_sales,
               CAST(CAST(MAX(CASE WHEN l.l_returnflag = 'R' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS r_max_sales,
               CAST(CAST(SUM(CASE WHEN l.l_returnflag = 'A' THEN CAST(l.l_quantity AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS a_sum_qty,
               CAST(CAST(SUM(CASE WHEN l.l_returnflag = 'N' THEN CAST(l.l_quantity AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS n_sum_qty,
               CAST(CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN CAST(l.l_quantity AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS r_sum_qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
        ORDER BY p_brand
    """,
    doc="A3/A4/A5 + J1 (box_office_data.sql:20-31): long→wide pivot with "
    "MAX(CASE WHEN …) cells — the reference's N-way full-outer alignment of "
    "per-day tables on the movie key, here brand × returnflag. Explicit value "
    "list keeps it a single job (no distinct-collection pass); the dim join is "
    "broadcast.",
    headline=True,
    tags=("pivot", "reference"),
)
def box_office_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    return pivot_max_cells(
        joined,
        group_key="p_brand",
        pivot_col="l_returnflag",
        pivot_values=_FLAGS,
        cells=[
            ("max", "l_extendedprice", "max_sales"),
            ("sum", "l_quantity", "sum_qty"),
        ],
    ).orderBy("p_brand")


@register(
    "union_source_panel",
    oracle=f"""
        WITH tagged AS (
            SELECT 'orders_open' AS source_table,
                   CAST(o_orderdate AS DATE) AS order_day,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS partial_sales,
                   COUNT(*) AS n_orders
            FROM orders WHERE o_orderstatus = 'O'
            GROUP BY 2
            UNION ALL
            SELECT 'orders_final', CAST(o_orderdate AS DATE),
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE), COUNT(*)
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY 2
            UNION ALL
            SELECT 'orders_pending', CAST(o_orderdate AS DATE),
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE), COUNT(*)
            FROM orders WHERE o_orderstatus = 'P'
            GROUP BY 2
        )
        SELECT CASE WHEN source_table IS NULL THEN 'day' ELSE 'source' END AS grain,
               source_table, order_day,
               {dsum_sql('partial_sales', 'total_sales')},
               CAST(SUM(n_orders) AS BIGINT) AS n_orders
        FROM tagged
        GROUP BY GROUPING SETS ((order_day), (source_table))
        ORDER BY grain, source_table, order_day
    """,
    doc="O3+A2+P5/P6 in one panel (round-5 consolidation of "
    "union_partial_reagg + source_tag_union, semantics of both preserved): "
    "an N-way UNION ALL of per-branch partial aggregates — the reference's "
    "Jinja-looped per-table SUMs (box_office_showrange.sql:2-29) — each "
    "branch carrying a literal provenance column ('{{ table_name }}' AS "
    "source_table, box_office_data.sql:6-15), re-aggregated via GROUPING "
    "SETS to both grains: 'day' rows merge partials across sources (the "
    "A2 partial→final law), 'source' rows total each tagged branch. One "
    "union and one Expand-aggregate replace two scans of the fact; at "
    "scale the provenance literal is input_file_name()/the partition "
    "column, as before.",
    tags=("union", "agg", "projection", "reference"),
)
def union_source_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def branch(status: str, tag: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy(to_day("o_orderdate").alias("order_day"))
            .agg(
                dsum("o_totalprice", "partial_sales"),
                F.count(F.lit(1)).alias("n_orders"),
            )
            .select(F.lit(tag).alias("source_table"), "*")
        )

    base = reduce(
        DataFrame.unionByName,
        [
            branch("O", "orders_open"),
            branch("F", "orders_final"),
            branch("P", "orders_pending"),
        ],
    )
    panel = base.groupingSets(
        [[F.col("order_day")], [F.col("source_table")]],
        F.col("order_day"),
        F.col("source_table"),
    ).agg(
        dsum("partial_sales", "total_sales"),
        F.sum("n_orders").alias("n_orders"),
    )
    grain = (
        F.when(F.col("source_table").isNull(), "day")
        .otherwise("source")
        .alias("grain")
    )
    return panel.select(
        grain, "source_table", "order_day", "total_sales", "n_orders"
    ).orderBy("grain", "source_table", "order_day")


@register(
    "partition_pruned_window_agg",
    oracle=f"""
        SELECT CAST(o_orderdate AS DATE) AS order_day,
               {dsum_sql('o_totalprice', 'total_sales')},
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1998-01-01' AND DATE '1998-01-09'
        GROUP BY CAST(o_orderdate AS DATE)
        ORDER BY order_day
    """,
    doc="P7 (dbt_dags.py:12-20): the reference's 9-day table-name enumeration "
    "becomes a date-range filter. NOTE: the fixture stores o_orderdate as an "
    "unpartitioned TIMESTAMP, so this query's day-cast filter relies on "
    "row-group skipping only; the real P7 idiom — filtering a DATE partition "
    "column directly so the range reaches PartitionFilters — is exercised "
    "against genuinely partitioned output in tests/test_partition_pruning.py.",
    tags=("filter", "reference"),
)
def partition_pruned_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    day = to_day("o_orderdate")
    return (
        orders.filter(day.between("1998-01-01", "1998-01-09"))
        .groupBy(day.alias("order_day"))
        .agg(
            dsum("o_totalprice", "total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("order_day")
    )


@register(
    "staging_dedup",
    oracle="""
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS order_day,
               CAST(COUNT(*) AS BIGINT) AS n_dups,
               CAST(MIN(o_orderkey) AS BIGINT) AS keep_orderkey
        FROM orders
        GROUP BY o_custkey, CAST(o_orderdate AS DATE)
        HAVING COUNT(*) > 1
        ORDER BY o_custkey, order_day
    """,
    doc="README.md:88,101,133 claims staging-layer dedup (중복 제거) but ships no "
    "code. Engine semantics: exact dedup on the natural key with a "
    "deterministic survivor (MIN orderkey) — dropDuplicates() keeps an "
    "arbitrary row, so the keyed-groupBy form is what a reproducible pipeline "
    "needs. This query surfaces the duplicate groups.",
    tags=("dedup", "reference"),
)
def staging_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_custkey", to_day("o_orderdate").alias("order_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("o_orderkey").alias("keep_orderkey"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("o_custkey", "order_day")
    )


@register(
    "scd2_snapshot",
    oracle="""
        WITH cur AS (
            SELECT c_custkey AS k, c_mktsegment AS seg FROM customer
        ),
        changed AS (
            SELECT k FROM cur WHERE k % 7 = 0 AND seg <> 'MACHINERY'
        )
        SELECT k, seg,
               DATE '1995-01-01' AS valid_from,
               CAST(NULL AS DATE) AS valid_to
        FROM cur WHERE k NOT IN (SELECT k FROM changed)
        UNION ALL
        SELECT c.k, c.seg, DATE '1995-01-01', DATE '1996-01-01'
        FROM cur c JOIN changed ch ON c.k = ch.k
        UNION ALL
        SELECT ch.k, 'MACHINERY', DATE '1996-01-01', CAST(NULL AS DATE)
        FROM changed ch
        ORDER BY k, valid_from
    """,
    doc="dbt snapshot ≡ SCD2 merge — the feature the reference scaffolds "
    "but never builds (dbt_project/snapshots/ holds only .gitkeep). "
    "Customers load as the 1995 open dimension; a deterministic update "
    "batch (every 7th key moves to MACHINERY) closes changed rows at the "
    "as-of date and inserts new open versions; unchanged keys pass "
    "through untouched (operators/scd2.py:scd2_apply — joins/unions on "
    "the business key only, facts never rewrite). Idempotence is pinned "
    "by tests/test_scd2.py.",
    tags=("scd2", "dbt", "reference"),
)
def scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.scd2 import scd2_apply

    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg")
    )
    dim = c.select(
        "k",
        "seg",
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = c.select(
        "k",
        F.when(F.col("k") % 7 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("seg"))
        .alias("seg"),
    )
    out = scd2_apply(dim, upd, "k", ["seg"], "1996-01-01")
    return out.orderBy("k", "valid_from")
