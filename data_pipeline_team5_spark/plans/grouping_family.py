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
    "grouping_margins_panel",
    oracle=f"""
        SELECT 'cube_status_priority' AS section,
               COALESCE(o_orderstatus, 'ALL') AS k1,
               COALESCE(o_orderpriority, 'ALL') AS k2,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
                   AS lvl,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {dsum_sql('o_totalprice', 'total')}
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        UNION ALL
        SELECT 'rollup_region_nation' AS section,
               COALESCE(r.r_name, 'ALL') AS k1,
               COALESCE(n.n_name, 'ALL') AS k2,
               CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS lvl,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {dsum_sql('c.c_acctbal', 'total')}
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)
        ORDER BY section, lvl, k1, k2
    """,
    doc="Grouping-sets margin panel — round-9 same-family consolidation "
    "of the former rollup_region_nation + cube_status_priority queries "
    "into one driver-window slot (the union_source_panel trade: both "
    "operator shapes stay in ONE plan, freeing a window slot for the "
    "scrub family). Section 'rollup_region_nation': ROLLUP(region, "
    "nation) — per-nation rows, per-region subtotals, grand total in one "
    "pass; dims broadcast, the Expand runs over ~125 partial groups, not "
    "input rows. Section 'cube_status_priority': CUBE(status, priority) "
    "— all four grouping combinations (full cross-margin table); the "
    "shuffle carries ≤ 4×15 group rows regardless of input size. "
    "grouping_id() disambiguates a real NULL key from a subtotal row on "
    "both sides of the oracle pair.",
    headline=True,
    tags=("agg", "rollup", "cube", "grouping"),
)
def grouping_margins_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    rollup_side = (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("c_acctbal", "total"),
        )
        .select(
            F.lit("rollup_region_nation").alias("section"),
            F.coalesce("r_name", F.lit("ALL")).alias("k1"),
            F.coalesce("n_name", F.lit("ALL")).alias("k2"),
            "lvl",
            "n_rows",
            "total",
        )
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    cube_side = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice", "total"),
        )
        .select(
            F.lit("cube_status_priority").alias("section"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("k1"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("k2"),
            "lvl",
            "n_rows",
            "total",
        )
    )
    return rollup_side.unionByName(cube_side).orderBy(
        "section", "lvl", "k1", "k2"
    )


@register(
    "setops_salted_panel",
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
        SELECT 'setops_repeat_customers' AS section, 'both' AS k,
               CAST(o_custkey AS BIGINT) AS v
        FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
        UNION ALL
        SELECT 'setops_repeat_customers' AS section, 'churned' AS k,
               CAST(o_custkey AS BIGINT) AS v
        FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98)
        UNION ALL
        SELECT 'salted_distinct_per_priority' AS section,
               o_orderpriority AS k,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS v
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY section, k, v
    """,
    doc="Set-operation + skew-salting panel — round-9 same-family "
    "consolidation of the former setops_repeat_customers + "
    "salted_distinct_per_priority queries into one driver-window slot. "
    "Section 'setops_repeat_customers': INTERSECT / EXCEPT cohort "
    "algebra (customers active in both 1997 and 1998 vs 1997-only), "
    "full per-customer membership emitted so the value hash covers the "
    "whole cohort set; both sides pre-projected to the single key column "
    "so the hash shuffle carries 8-byte keys — the 100 TB-safe way to "
    "run set algebra. Section 'salted_distinct_per_priority': exact "
    "per-key COUNT(DISTINCT) under aggregation-state skew, the distinct "
    "domain hash-sharded 16 ways so no single reducer materializes a hot "
    "key's whole value set (operators/skew.py:salted_distinct — shard "
    "counts add exactly because the shards partition the domain; AQE "
    "skew-join splitting can't fix this case, this pattern does).",
    tags=("setop", "intersect", "except", "distinct", "skew"),
)
def setops_salted_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    y97 = o.filter(
        day.between(F.lit("1997-01-01"), F.lit("1997-12-31"))
    ).select("o_custkey")
    y98 = o.filter(day >= F.lit("1998-01-01")).select("o_custkey")
    sec_setops = F.lit("setops_repeat_customers").alias("section")
    both = y97.intersect(y98).select(
        sec_setops, F.lit("both").alias("k"), F.col("o_custkey").alias("v")
    )
    churned = y97.subtract(y98).select(
        sec_setops,
        F.lit("churned").alias("k"),
        F.col("o_custkey").alias("v"),
    )
    salted = (
        salted_distinct(
            o.select("o_orderpriority", "o_custkey"),
            ["o_orderpriority"],
            "o_custkey",
            "n_custs",
            n=16,
        ).select(
            F.lit("salted_distinct_per_priority").alias("section"),
            F.col("o_orderpriority").alias("k"),
            F.col("n_custs").alias("v"),
        )
    )
    return (
        both.unionByName(churned)
        .unionByName(salted)
        .orderBy("section", "k", "v")
    )


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


# ---------------------------------------------------------------------------
# Skew diagnosis (round 9 continued): the report you run BEFORE picking a
# salting/AQE strategy — per-key row shares at two grains of the events
# fact (the coarse event_type dimension and the top-10 heaviest user_id
# hot keys), each with the salt factor operators/skew.py:salted_join /
# salted_distinct would need: ceil(share × shuffle_partitions) splits a
# hot key's single reducer into average-sized pieces.

SKEW_PARTITIONS = 32  # the salt formula's P (matches session default)
SKEW_TOP_USERS = 10


@register(
    "skew_key_report",
    oracle=f"""
        WITH g AS (
            SELECT event_type, CAST(user_id AS VARCHAR) AS uid,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   GROUPING(event_type) AS g_et
            FROM events
            GROUP BY GROUPING SETS ((event_type), (CAST(user_id AS VARCHAR)))
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events),
        et AS (
            SELECT 'event_type' AS grain, event_type AS key, n
            FROM g WHERE g_et = 0
        ),
        hu AS (
            SELECT 'user_id' AS grain, uid AS key, n
            FROM g WHERE g_et = 1
            ORDER BY n DESC, key LIMIT {SKEW_TOP_USERS}
        ),
        u AS (SELECT * FROM et UNION ALL SELECT * FROM hu)
        SELECT grain, key, n AS n_rows,
               CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
               CAST(CEIL(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                         * CAST({SKEW_PARTITIONS} AS DOUBLE)) AS INT)
                   AS salt_factor
        FROM u, tot
        ORDER BY grain, n_rows DESC, key
    """,
    doc="⊕ join/agg-key skew diagnosis: per-key row shares of the events "
    "fact at two grains from ONE scan — every event_type (the coarse "
    "dimension a groupBy would key on) and the top-10 heaviest user_id "
    "hot keys (TakeOrderedAndProject over the per-user counts; the "
    "billion-user tail never sorts globally) — each with the salt factor "
    "the skew operators would apply: ceil(share × 32 partitions) is how "
    "many ways a hot key must split for its reducer to shrink to the "
    "average partition's load. GROUPING SETS computes both grains in one "
    "Expand(×2) over a single scan instead of two corpus passes; "
    "GROUPING() selects the set (null-value-proof, unlike IS NULL "
    "markers). This is the measurement step feeding operators/skew.py's "
    "salted_join/salted_distinct and the AQE-vs-explicit-salting call "
    "documented there. share and the salt product are single double "
    "operations — bitwise cross-engine.",
    tags=("agg", "skew", "diagnosis", "grouping"),
)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    # one corpus scan, two grains: Expand ×2 via grouping sets; the
    # grouped frame is (|event_types| + |users|) rows — checkpointed so
    # the sections and the TakeOrdered top-10 don't re-derive the scan
    g = (
        ev.groupingSets([["event_type"], ["uid"]], "event_type", "uid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("event_type").alias("g_et"),
        )
        .localCheckpoint()
    )
    # total from the checkpointed grid, not a second events scan: the
    # event_type grain partitions every row exactly once, so its n-sum IS
    # the fact count
    total = (
        g.filter(F.col("g_et") == 0)
        .agg(F.sum("n").cast("long").alias("total"))
    )
    et = g.filter(F.col("g_et") == 0).select(
        F.lit("event_type").alias("grain"),
        F.col("event_type").alias("key"),
        "n",
    )
    hu = (
        g.filter(F.col("g_et") == 1)
        .select(F.lit("user_id").alias("grain"), F.col("uid").alias("key"), "n")
        .orderBy(F.desc("n"), "key")
        .limit(SKEW_TOP_USERS)
    )
    share = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        et.unionByName(hu)
        .crossJoin(F.broadcast(total))
        .select(
            "grain",
            "key",
            F.col("n").alias("n_rows"),
            share.alias("share"),
            F.ceil(share * F.lit(float(SKEW_PARTITIONS)))
            .cast("int")
            .alias("salt_factor"),
        )
        .orderBy("grain", F.desc("n_rows"), "key")
    )


QUANTILE_PS = [0.5, 0.9, 0.99]
QUANTILE_ACC = 10_000  # percentile_approx accuracy (error ≤ 1/acc of rank)


@register(
    "sketch_length_quantiles",
    oracle=None,  # percentile_approx is Spark's Greenwald-Khanna variant —
    # engine-specific sketch state, no DuckDB twin; the rank-error bound
    # vs exact percentiles is pinned in tests/test_sketches.py
    doc="Quantile-sketch rollup — the companion to sketch_weekly_distinct "
    "for the OTHER sketch every 100 TB pipeline stores: per-language "
    "p50/p90/p99 document lengths via percentile_approx "
    "(Greenwald-Khanna, bounded state, mergeable across partitions — "
    "one pass, map-side partial sketches, no sort), with the exact "
    "percentiles computed alongside for validation (affordable at test "
    "SF only; the pytest pins the ≤1/accuracy rank-error contract at "
    "three SFs). The exact form needs a per-language sort — this sketch "
    "is what replaces it when a language is most of the corpus.",
    tags=("sketch", "quantile", "text"),
)
def sketch_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("lang", "n_chars")
    ps = F.array(*[F.lit(p) for p in QUANTILE_PS])
    approx = docs.groupBy("lang").agg(
        F.percentile_approx("n_chars", ps, F.lit(QUANTILE_ACC)).alias("q_approx")
    )
    exact = docs.groupBy("lang").agg(
        F.expr(
            f"percentile(n_chars, array({','.join(map(str, QUANTILE_PS))}))"
        ).alias("q_exact")
    )
    return (
        approx.join(exact, "lang")
        .select("lang", "q_approx", "q_exact")
        .orderBy("lang")
    )


# Exact corpus-wide order statistics — the third point of the quantile
# triangle: percentile() is exact but single-reducer (SortAggregate
# collects every value into one task's memory), percentile_approx/GK are
# distributed but approximate; rows_at_global_ranks (operators/ranks.py,
# the round-10 RFM machinery) is BOTH — a range exchange + per-partition
# counts select the exact k-th elements with no single-task stage and no
# approximation boundary. Selection does no arithmetic on the values, so
# the result is bitwise cross-engine by construction.

QUANTILE_PCTS = (25, 50, 75, 90, 99)

_VALUE_Q_SQL = f"""
        WITH ordered AS (
            SELECT l_extendedprice AS v,
                   ROW_NUMBER() OVER (
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS rn,
                   COUNT(*) OVER () AS n
            FROM lineitem
        ), pcts(pct) AS (VALUES {", ".join(f"({p})" for p in QUANTILE_PCTS)})
        SELECT CAST(pct AS INT) AS pct,
               CAST(v AS DOUBLE) AS value,
               CAST(rn AS BIGINT) AS at_rank,
               CAST(n AS BIGINT) AS n_rows
        FROM ordered JOIN pcts ON rn = (n * pct + 99) // 100
"""


@register(
    "exact_value_quantiles",
    oracle=_VALUE_Q_SQL + " ORDER BY pct",
    doc="⊕ exact distributed quantiles of the price column (p25/50/75/"
    "90/99): each percentile is the TRUE order statistic at rank "
    "ceil(n·p) — integer-exact rank math ((n·p + 99) div 100), a total "
    "order with (l_orderkey, l_linenumber) tie-break, and the element "
    "fetched by operators/ranks.py:rows_at_global_ranks: one NARROW "
    "range exchange, a |partitions|-row count collect, and a window "
    "over ONLY the ≤5 partitions holding requested ranks (each bounded "
    "by n/P rows) — no single-task sort, no sketch error. Selection "
    "performs zero arithmetic on the values, so Spark and DuckDB agree "
    "bitwise by construction. This is the production form of the exact "
    "side of sketch_length_quantiles (whose percentile() aggregate is "
    "single-reducer) — the quality-cutoff / SLA-threshold query a "
    "curation pipeline runs on corpus-sized numeric columns. NOT a "
    "bench headliner (round 13, VERDICT r12 #3): exact_quantile_panel "
    "times this same select-k machinery — a third timing of one "
    "mechanism inflates the headline total without new information; "
    "the tail oracle + mini-driver bitwise check stay.",
    tags=("grouping", "quantile", "ranks"),
)
def exact_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    return _value_quantile_rows(spark, li)


def _value_quantile_rows(spark: SparkSession, li: DataFrame) -> DataFrame:
    """Shared body of exact_value_quantiles (also the global section of
    exact_quantile_panel): ONE pass — n comes from the selection pass's
    own per-partition counts (``ranks_for`` form, VERDICT r10 #2), so no
    standalone ``count()`` scan precedes the exchange."""
    from data_pipeline_team5_spark.operators.ranks import (
        global_rank_select,
    )

    n, by_rank = global_rank_select(
        li,
        ["v", "l_orderkey", "l_linenumber"],
        lambda m: [(m * p + 99) // 100 for p in QUANTILE_PCTS],
    )
    out = [
        (int(p), float(by_rank[(n * p + 99) // 100]["v"]),
         int((n * p + 99) // 100), int(n))
        for p in QUANTILE_PCTS
    ]
    # local_frame (round 17, guide §4): LocalTableScan instead of a
    # 32-slice pickled RDD — the panel evaluated each section frame
    # twice, at 32 Python-worker tasks per evaluation (profiled: 4 × ~7
    # task-s of zero-input Python time in exact_quantile_panel alone).
    from data_pipeline_team5_spark.functions.localframe import local_frame

    return local_frame(
        spark, out, "pct INT, value DOUBLE, at_rank BIGINT, n_rows BIGINT"
    ).orderBy("pct")


_GROUPED_Q_SQL = """
        WITH ordered AS (
            SELECT lang, n_chars AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM documents
        ), pcts(pct) AS (VALUES (50), (90), (99))
        SELECT lang,
               CAST(pct AS INT) AS pct,
               CAST(v AS BIGINT) AS value,
               CAST(rn AS BIGINT) AS at_rank,
               CAST(n AS BIGINT) AS n_rows
        FROM ordered JOIN pcts ON rn = (n * pct + 99) // 100
"""


@register(
    "exact_grouped_quantiles",
    oracle=_GROUPED_Q_SQL + " ORDER BY lang, pct",
    doc="⊕ exact PER-GROUP quantiles (p50/90/99 of document length per "
    "language): the grouped companion of exact_value_quantiles, and the "
    "exact form sketch_length_quantiles' doc names as needing a "
    "per-language sort — now WITHOUT one. Window.partitionBy(lang) is "
    "fine when groups are many and small; with FEW HUGE groups (three "
    "languages over a trillion-token corpus) each window partition IS "
    "the corpus-sized group in one task. operators/ranks.py:"
    "grouped_rows_at_group_ranks instead: one (lang, n_chars, doc_id) "
    "range exchange whose partitions are each bounded by n/P rows, a "
    "(partition × lang) count collect (driver state tiny exactly when "
    "groups are few), per-group integer-exact quantile ranks, and one "
    "(partition, lang)-windowed fetch over only the partitions holding "
    "requested ranks. Selection does no value arithmetic — bitwise "
    "cross-engine by construction, verified at three SFs. NOT a bench "
    "headliner (round 13, VERDICT r12 #3): exact_quantile_panel times "
    "this same machinery; the tail oracle + bitwise check stay.",
    tags=("grouping", "quantile", "ranks", "text"),
)
def exact_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "lang", "n_chars", "doc_id"
    )
    return _grouped_quantile_rows(spark, docs)


def _grouped_quantile_rows(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Shared body of exact_grouped_quantiles (also the per-lang section
    of exact_quantile_panel)."""
    from data_pipeline_team5_spark.operators.ranks import (
        grouped_rows_at_group_ranks,
    )

    pcts = (50, 90, 99)

    def ranks_for(n_g: int) -> list[int]:
        return [(n_g * p + 99) // 100 for p in pcts]

    got = grouped_rows_at_group_ranks(
        docs, ["lang"], ["n_chars", "doc_id"], ranks_for
    )
    by_group_rank = {
        (key, rank): (n_g, row) for key, n_g, rank, row in got
    }
    # one output row per (group, pct) — a rank shared by two pcts (tiny
    # groups where ceil(n·p) collides) must emit BOTH rows
    out = []
    for key, n_g, _, _ in got:
        for p in pcts:
            rank = (n_g * p + 99) // 100
            _, row = by_group_rank[(key, rank)]
            out.append(
                (key[0], int(p), int(row["n_chars"]), int(rank), int(n_g))
            )
    # Dedup (a rank shared by two pcts emits once per pct above), with a
    # None-safe deterministic input order for reproducible plan dumps —
    # the .orderBy below decides the OUTPUT order either way (ADVICE
    # r10: a NULL lang must not crash the sort).
    out = sorted(set(out), key=repr)
    from data_pipeline_team5_spark.functions.localframe import local_frame

    return local_frame(
        spark,
        out,
        "lang STRING, pct INT, value BIGINT, at_rank BIGINT, n_rows BIGINT",
    ).orderBy("lang", "pct")


@register(
    "exact_quantile_panel",
    oracle=f"""
        SELECT * FROM (
            SELECT 'global_price' AS section,
                   CAST(NULL AS VARCHAR) AS lang,
                   pct, value, at_rank, n_rows
            FROM ({_VALUE_Q_SQL})
            UNION ALL
            SELECT 'per_lang_chars' AS section,
                   lang, pct, CAST(value AS DOUBLE) AS value,
                   at_rank, n_rows
            FROM ({_GROUPED_Q_SQL})
        )
        ORDER BY section, lang NULLS FIRST, pct
    """,
    doc="⊕ the round-10 exact-order-statistics operator as one DRIVER-"
    "GRADED panel (VERDICT r10 #3 — the select-k machinery's only "
    "in-window exposure was indirect via rfm_segments): section "
    "'global_price' = exact_value_quantiles (p25/50/75/90/99 of the "
    "price column via operators/ranks.py:global_rank_select — single "
    "pass, n from the exchange's own partition counts, partition width "
    "derived P = max(conf, ceil(n/4M))), section 'per_lang_chars' = "
    "exact_grouped_quantiles (per-language p50/90/99 document length, "
    "few-huge-groups regime, no per-language sort). Both standalone "
    "queries keep their own oracles in the tail (mini-driver bitwise); "
    "this panel puts a driver hash on the order statistics themselves. "
    "Values are exact order statistics — selection does no value "
    "arithmetic, so DOUBLE emission (chars are small-int-exact in "
    "double) is bitwise cross-engine by construction.",
    headline=True,
    tags=("grouping", "quantile", "ranks", "text"),
)
def exact_quantile_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    docs = table(spark, sf_dir, "documents").select(
        "lang", "n_chars", "doc_id"
    )
    # Overlap the two independent sections from driver threads (round
    # 17, guide §2.6): the global-price select-k (over lineitem) and the
    # per-lang grouped select-k (over documents) share nothing — run
    # concurrently, the grouped section's jobs back-fill the tail of the
    # global section's exchange instead of waiting for it. Results are
    # unchanged (both sections end in driver-side literal frames).
    with ThreadPoolExecutor(max_workers=2) as pool:
        g_f = pool.submit(_value_quantile_rows, spark, li)
        p_f = pool.submit(_grouped_quantile_rows, spark, docs)
    global_q = g_f.result().select(
        F.lit("global_price").alias("section"),
        F.lit(None).cast("string").alias("lang"),
        "pct",
        "value",
        "at_rank",
        "n_rows",
    )
    per_lang = p_f.result().select(
        F.lit("per_lang_chars").alias("section"),
        "lang",
        "pct",
        F.col("value").cast("double").alias("value"),
        "at_rank",
        "n_rows",
    )
    return global_q.unionByName(per_lang).orderBy(
        "section", F.col("lang").asc_nulls_first(), "pct"
    )
