"""User-behavior analytics over the events stream: cohort retention and
ordered funnel conversion — the two classic product-analytics queries a
warehouse serving the reference's dashboard layer (README.md:160-220 lists
the analytics surface; `dags/dbt_dags.py` materializes daily marts for it)
would grow into next. Both are expressed as single declarative plans whose
DuckDB oracles use an INDEPENDENT algorithm (chained first-match mins vs
the Spark side's sorted-array greedy fold), so agreement checks the
semantics, not a shared implementation.

Scale notes (100 TB): both queries key every shuffle on ``user_id`` (or a
(user_id, date) superset of it), the natural high-cardinality key — no
skew beyond a power user's own event count, no global sort until the final
small (cohort×offset / 4-row) result. The funnel's per-user sorted fold
materializes one user's funnel-relevant events as an array; that is
bounded by per-user activity, not corpus size, and the event-type filter
is pushed into the scan before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.ranks import exact_ntile_bucket
from data_pipeline_team5_spark.plans.catalog import register, table

# Funnel stage order: acquisition → engagement → intent → conversion.
FUNNEL_STAGES = ("signup", "view", "click", "purchase")


@register(
    "cohort_retention",
    oracle="""
        WITH daily AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        coh AS (
            SELECT user_id, d,
                   MIN(d) OVER (PARTITION BY user_id) AS cohort_day
            FROM daily
        ),
        ret AS (
            SELECT cohort_day,
                   CAST(datediff('day', cohort_day, d) AS INT) AS day_offset,
                   COUNT(*) AS active_users
            FROM coh GROUP BY 1, 2
        )
        SELECT cohort_day, day_offset, active_users,
               MAX(CASE WHEN day_offset = 0 THEN active_users END)
                   OVER (PARTITION BY cohort_day) AS cohort_size,
               CAST(active_users AS DOUBLE)
                   / MAX(CASE WHEN day_offset = 0 THEN active_users END)
                         OVER (PARTITION BY cohort_day) AS retention
        FROM ret
        ORDER BY cohort_day, day_offset
    """,
    doc="⊕ daily-cohort retention triangle: users cohorted by first-active "
    "date, distinct-active counts per (cohort, day offset), retention as "
    "a share of the cohort's day-0 actives. Three shuffles, each keyed on "
    "user_id or a superset — (user_id, date) distinct with map-side "
    "partial agg, a per-user MIN window, then the tiny (cohort, offset) "
    "agg; cohort_size rides a window over the already-small result "
    "instead of a self-join. Retention is one long/long IEEE division, "
    "bitwise equal to the oracle.",
    headline=True,
    tags=("behavior", "window", "events"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    daily = ev.distinct()
    coh = daily.withColumn(
        "cohort_day", F.min("d").over(Window.partitionBy("user_id"))
    )
    ret = coh.groupBy(
        "cohort_day",
        F.datediff(F.col("d"), F.col("cohort_day"))
        .cast("int")
        .alias("day_offset"),
    ).agg(F.count("*").alias("active_users"))
    wc = Window.partitionBy("cohort_day")
    day0 = F.max(
        F.when(F.col("day_offset") == 0, F.col("active_users"))
    ).over(wc)
    return ret.select(
        "cohort_day",
        "day_offset",
        "active_users",
        day0.alias("cohort_size"),
        (F.col("active_users").cast("double") / day0).alias("retention"),
    ).orderBy("cohort_day", "day_offset")


def _funnel_oracle() -> str:
    """Chained first-match mins: stage k's entry key is the MIN (ts,
    event_id) of a stage-k event strictly after stage k-1's entry key.
    Struct comparison is lexicographic in both engines, and event_id
    breaks ts ties deterministically, so this is exactly the greedy walk
    the Spark fold performs — derived independently."""
    keys = []
    prev = None
    for i, st in enumerate(FUNNEL_STAGES):
        name = f"s{i + 1}"
        if prev is None:
            keys.append(
                f"{name} AS (SELECT user_id, "
                f"MIN(struct_pack(ts := ts, id := event_id)) AS k "
                f"FROM events WHERE event_type = '{st}' GROUP BY user_id)"
            )
        else:
            keys.append(
                f"{name} AS (SELECT e.user_id, "
                f"MIN(struct_pack(ts := e.ts, id := e.event_id)) AS k "
                f"FROM events e JOIN {prev} ON e.user_id = {prev}.user_id "
                f"WHERE e.event_type = '{st}' "
                f"AND struct_pack(ts := e.ts, id := e.event_id) > {prev}.k "
                f"GROUP BY e.user_id)"
            )
        prev = name
    counts = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{st}' AS stage_name, "
        f"(SELECT COUNT(*) FROM s{i + 1}) AS users"
        for i, st in enumerate(FUNNEL_STAGES)
    )
    return f"""
        WITH {", ".join(keys)},
        c AS ({counts})
        SELECT CAST(stage AS INT) AS stage, stage_name, users,
               CAST(users AS DOUBLE)
                   / (SELECT users FROM c WHERE stage = 1) AS pct_of_first,
               CASE WHEN stage = 1 THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(users AS DOUBLE)
                         / (SELECT users FROM c c2
                            WHERE c2.stage = c.stage - 1)
               END AS pct_of_prev
        FROM c ORDER BY stage
    """


@register(
    "event_funnel",
    oracle=_funnel_oracle(),
    doc="⊕ ordered funnel (signup → view → click → purchase): a user "
    "reaches stage k iff a stage-k event exists strictly after their "
    "stage-(k-1) entry event, ties on ts broken by event_id. ONE shuffle: "
    "the stage filter is pushed into the scan, each user's surviving "
    "events are collected and array_sort'ed (bounded by per-user "
    "activity, not corpus size), and a sequential F.aggregate fold walks "
    "the sorted array advancing the stage counter — the per-user funnel "
    "in a single codegen'd projection, no joins, no window. The 4-row "
    "result and its conversion ratios are exact long counts and IEEE "
    "divisions; the oracle recomputes the same semantics with an "
    "independent chained-min algorithm.",
    headline=True,
    tags=("behavior", "funnel", "events"),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("event_type").isin(*FUNNEL_STAGES))
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )

    def step(acc, e):
        out = acc
        # Walk stages in reverse so each WHEN sees the pre-update value.
        for i in range(len(FUNNEL_STAGES) - 1, -1, -1):
            out = F.when(
                (acc == i) & (e.event_type == FUNNEL_STAGES[i]),
                F.lit(i + 1),
            ).otherwise(out)
        return out

    staged = per_user.select(
        F.aggregate("evs", F.lit(0), step).alias("stage_reached")
    )
    one = staged.agg(
        *[
            F.sum(
                (F.col("stage_reached") >= i + 1).cast("long")
            ).alias(f"u{i + 1}")
            for i in range(len(FUNNEL_STAGES))
        ]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{st}', u{i + 1}" for i, st in enumerate(FUNNEL_STAGES)
    )
    rows = one.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {stack_args}) "
        "AS (stage, stage_name, users)",
        "u1",
        *[f"u{i + 1} AS prev{i + 2}" for i in range(len(FUNNEL_STAGES) - 1)],
    )
    pct_prev = F.when(F.col("stage") == 1, F.lit(1.0))
    for i in range(2, len(FUNNEL_STAGES) + 1):
        pct_prev = pct_prev.when(
            F.col("stage") == i,
            F.col("users").cast("double") / F.col(f"prev{i}"),
        )
    return rows.select(
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        "users",
        (F.col("users").cast("double") / F.col("u1")).alias("pct_of_first"),
        pct_prev.alias("pct_of_prev"),
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# RFM segmentation (round 9 continued): the third classic product-analytics
# query — per-user Recency / Frequency / Monetary quartiles and the segment
# grid marketing actually acts on. Monetary is quantized to exact integer
# cents BEFORE summing (floor(value·100) — a raw double SUM is
# shuffle-order-dependent and can never hash-match an oracle).


@register(
    "rfm_segments",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CAST(ts AS DATE)) AS last_day,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY user_id
        ),
        scored AS (
            SELECT user_id, last_day, freq, cents,
                   CAST(NTILE(4) OVER (ORDER BY last_day, user_id)
                        AS INT) AS r_q,
                   CAST(NTILE(4) OVER (ORDER BY freq, user_id)
                        AS INT) AS f_q,
                   CAST(NTILE(4) OVER (ORDER BY cents, user_id)
                        AS INT) AS m_q
            FROM per_user
        )
        SELECT r_q, f_q, m_q,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(freq) AS BIGINT) AS sum_events,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM scored
        GROUP BY r_q, f_q, m_q
        ORDER BY r_q, f_q, m_q
    """,
    doc="⊕ RFM segmentation: per-user recency (last active day), "
    "frequency (events) and monetary value, each quartiled over a "
    "deterministic (metric, user_id) total order, rolled up to the 4×4×4 "
    "segment grid with user/event/cents counts — the classic marketing "
    "segmentation the cohort/funnel pair completes. Monetary sums EXACT "
    "INTEGER CENTS (floor(value·100) per event): a raw double SUM is "
    "shuffle-order-dependent, so it could never hash-match; the "
    "quantized sum is associative and bitwise on both engines. Plan "
    "shape (round 10, replacing the three single-partition NTILE "
    "windows): one events scan → per-user agg (the natural "
    "high-cardinality shuffle key, checkpoint-pinned — this one pin is "
    "RETAINED because the returned lazy grid still reads it; the three "
    "per-metric select-k pins inside operators/ranks.py release "
    "themselves after their fetch pass, ADVICE r10), then per metric a "
    "NARROW (metric, user_id) range exchange + per-partition counts "
    "resolve the three exact NTILE cut-rank elements "
    "(operators/ranks.py), which fold back as literal struct "
    "comparisons — bucket assignment is a map-side projection, every "
    "exchange is range- or hash-partitioned across the cluster, and NO "
    "window moves the user grain to one task, so the plan survives 1e9+ "
    "users. Buckets are BITWISE the NTILE result (ranks are exact; the "
    "SQL-standard uneven rule — first N mod 4 buckets get the extra row "
    "— is encoded in the cut ranks), so the oracle keeps the canonical "
    "NTILE form and tests/test_behavior_family.py pins parity against "
    "the retained NTILE twin (_rfm_ntile_form).",
    headline=True,
    tags=("behavior", "rfm", "segmentation", "window"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    per_user = _rfm_per_user(spark, sf_dir).localCheckpoint()
    n = per_user.count()
    # Overlap the three independent select-k passes from driver threads
    # (round 17, guide §2.6): each exact_ntile_bucket is its own
    # range-exchange + count + fetch job chain over the SAME pinned
    # frame, with no data dependency between the three — submitted
    # sequentially they serialize ~18 small jobs; concurrent, the next
    # pass's tasks back-fill the tail of the previous one. Results are
    # unchanged: each pass embeds its own literal thresholds.
    with ThreadPoolExecutor(max_workers=3) as pool:
        r_f = pool.submit(
            exact_ntile_bucket, per_user, ["last_day", "user_id"], 4, n=n
        )
        f_f = pool.submit(
            exact_ntile_bucket, per_user, ["freq", "user_id"], 4, n=n
        )
        m_f = pool.submit(
            exact_ntile_bucket, per_user, ["cents", "user_id"], 4, n=n
        )
    scored = per_user.select(
        "freq",
        "cents",
        r_f.result().alias("r_q"),
        f_f.result().alias("f_q"),
        m_f.result().alias("m_q"),
    )
    return _rfm_grid(scored)


def _rfm_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    cents = F.floor(F.col("value") * 100).cast("long")
    return ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(cents).cast("long").alias("cents"),
    )


def _rfm_grid(scored: DataFrame) -> DataFrame:
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("freq").cast("long").alias("sum_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


def _rfm_ntile_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical NTILE twin (the catalog query's shape in rounds ≤9,
    and still the oracle's SQL): correct and bitwise-equal, but its three
    unpartitioned windows each move the whole user grain to ONE task —
    retained unregistered as the parity reference the scale-safe plan is
    tested against (the hard_negative_mining two-form convention)."""
    per_user = _rfm_per_user(spark, sf_dir)
    scored = per_user.select(
        "freq",
        "cents",
        F.ntile(4)
        .over(Window.orderBy("last_day", "user_id"))
        .cast("int")
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy("freq", "user_id"))
        .cast("int")
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy("cents", "user_id"))
        .cast("int")
        .alias("m_q"),
    )
    return _rfm_grid(scored)


# ---------------------------------------------------------------------------
# Volume-anomaly monitor (round 9 continued): the pipeline-operations
# query — flag days whose event volume deviates > 3σ from the trailing
# week. The z-test is algebraically rearranged to PURE INTEGER arithmetic
# ((x·w − s)² > 9·w·(q·w − s²) ⟺ (x − s/w)² > 9·((q·w − s²)/w²) · w ...
# with variance-of-mean scaling folded in), so the flag is bitwise
# cross-engine by construction — no sqrt, no division, no doubles.

ANOM_TRAIL = 7  # trailing window (days), current day excluded
ANOM_MIN_N = 3  # minimum trailing days before flagging
ANOM_Z2 = 9  # z² threshold (3σ)


def rate_trail(daily: DataFrame) -> DataFrame:
    """Trailing-week window state over a (day, n_events) frame — shared
    by events_rate_anomaly and stream_rate_monitor so the overflow test
    drives the REAL construction: the sum of squares promotes to DECIMAL
    BEFORE the multiply (an int64 product throws under ANSI once daily
    counts pass ~3.04e9, and silently wraps without ANSI)."""
    w = Window.orderBy("day").rowsBetween(-ANOM_TRAIL, -1)
    return daily.select(
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).alias("w_n"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).alias("s"),
        F.coalesce(
            F.sum(
                F.col("n_events").cast("decimal(38,0)")
                * F.col("n_events")
            ).over(w),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("q"),
    )


def anomaly_flag(n, w_n, s, q, z2: int = ANOM_Z2, min_n: int = ANOM_MIN_N):
    """The shared integer-exact 3σ flag: (x·w − s)² > z²·w·(q·w − s²),
    computed in DECIMAL(38,0) — int64 wraps silently once daily counts
    pass ~1e9 (dev² ~ 1e19+), and DuckDB's 128-bit path would NOT wrap,
    a latent cross-engine divergence the fixture can't see. Shared by
    events_rate_anomaly and stream_rate_monitor; the overflow regime is
    pinned directly in tests/test_behavior_family.py."""
    # promote BEFORE any multiply: under ANSI mode an int64 overflow in
    # s*s or dev*dev throws (and without ANSI it would wrap) — every
    # operand enters the arithmetic as DECIMAL(38,0)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731 - local shorthand
    dev = d(n) * d(w_n) - d(s)
    var_term = d(q) * d(w_n) - d(s) * d(s)
    return F.when(
        w_n >= min_n,
        dev * dev > d(F.lit(z2)) * d(w_n) * var_term,
    ).otherwise(F.lit(False))



@register(
    "events_rate_anomaly",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
        ),
        trail AS (
            SELECT day, n_events,
                   CAST(COUNT(*) OVER w AS BIGINT) AS w_n,
                   CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS s,
                   CAST(COALESCE(SUM(CAST(n_events AS DECIMAL(38,0))
                                      * n_events) OVER w, 0)
                        AS DECIMAL(38,0)) AS q
            FROM daily
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN {ANOM_TRAIL} PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT day, n_events, w_n AS trail_days, s AS trail_sum,
               CASE WHEN w_n >= {ANOM_MIN_N}
                    THEN (CAST(n_events AS DECIMAL(38,0)) * w_n - s)
                         * (CAST(n_events AS DECIMAL(38,0)) * w_n - s)
                         > CAST({ANOM_Z2} * w_n AS DECIMAL(38,0))
                           * (q * w_n
                              - CAST(s AS DECIMAL(38,0)) * s)
                    ELSE FALSE END AS is_anomaly
        FROM trail
        ORDER BY day
    """,
    doc="⊕ event-volume anomaly monitor: each day's count tested against "
    "its trailing-week mean at 3σ — the pipeline-operations query that "
    "catches a broken ingest (volume collapse) or a duplicate-replay "
    "(volume spike) the morning it happens. The z-test is rearranged to "
    "pure BIGINT arithmetic — (x·w − s)² > 9·w·(q·w − s²), i.e. "
    "(x − μ)² > 9σ²·w with both sides multiplied through by w² — so the "
    "flag involves no sqrt, no division, no doubles, and is bitwise "
    "cross-engine by construction (the corr-matrix/decimal policy taken "
    "to its logical end: don't round-trip the float, eliminate it). "
    "Plan: one events scan → day-grain agg (map-side combine; the "
    "exchange carries |days| rows) → a |days|-row window — the monitor "
    "costs one scan regardless of corpus size, and in production the "
    "daily counts come from the stored ingest manifest instead, making "
    "it corpus-free.",
    tags=("behavior", "anomaly", "monitoring", "window"),
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(F.to_date("ts").alias("day"))
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n_events"))
    trail = rate_trail(daily)
    return trail.select(
        "day",
        "n_events",
        F.col("w_n").alias("trail_days"),
        F.col("s").alias("trail_sum"),
        anomaly_flag(
            F.col("n_events"), F.col("w_n"), F.col("s"), F.col("q")
        ).alias("is_anomaly"),
    ).orderBy("day")


from data_pipeline_team5_spark.plans.catalog import QUERIES as _Q


@register(
    "behavior_panel",
    oracle=f"""
        WITH coh AS (SELECT * FROM ({_Q["cohort_retention"].oracle})),
             fun AS (SELECT * FROM ({_Q["event_funnel"].oracle})),
             rfm AS (SELECT * FROM ({_Q["rfm_segments"].oracle}))
        SELECT * FROM (
            SELECT 'cohort' AS section,
                   CAST(cohort_day AS VARCHAR) AS k1,
                   CAST(day_offset AS INT) AS k2,
                   CAST(active_users AS BIGINT) AS n,
                   CAST(cohort_size AS BIGINT) AS v,
                   CAST(NULL AS BIGINT) AS v2,
                   retention AS ratio1,
                   CAST(NULL AS DOUBLE) AS ratio2
            FROM coh
            UNION ALL
            SELECT 'funnel', stage_name, CAST(stage AS INT),
                   CAST(users AS BIGINT), CAST(NULL AS BIGINT),
                   CAST(NULL AS BIGINT), pct_of_first, pct_of_prev
            FROM fun
            UNION ALL
            SELECT 'rfm', r_q || '-' || f_q || '-' || m_q,
                   CAST(NULL AS INT),
                   n_users, sum_events, sum_cents,
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
            FROM rfm
        ) ORDER BY section, k1, k2
    """,
    doc="⊕ the three behavior-analytics classics section-tagged in ONE "
    "driver slot (round 14, VERDICT r13 #8 — the decontamination_panel "
    "recipe again, into the slot scrub_panel's consolidation freed): "
    "every cell of cohort_retention (retention triangle), event_funnel "
    "(ordered 4-stage conversion) and rfm_segments (4×4×4 exact-NTILE "
    "segment grid) in one long layout, so the driver hash certifies "
    "all three bit-for-bit. Standalone forms keep their tail oracles "
    "and headline timings; the panel is deliberately NOT timed (it "
    "would re-measure their sum). Plan cost = the three plans "
    "verbatim plus a union — each keyed on user_id or a bounded "
    "grain, per their own docstrings.",
    tags=("behavior", "panel", "events"),
)
def behavior_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    coh = cohort_retention(spark, sf_dir).select(
        F.lit("cohort").alias("section"),
        F.col("cohort_day").cast("string").alias("k1"),
        F.col("day_offset").cast("int").alias("k2"),
        F.col("active_users").cast("bigint").alias("n"),
        F.col("cohort_size").cast("bigint").alias("v"),
        F.lit(None).cast("bigint").alias("v2"),
        F.col("retention").alias("ratio1"),
        F.lit(None).cast("double").alias("ratio2"),
    )
    fun = event_funnel(spark, sf_dir).select(
        F.lit("funnel").alias("section"),
        F.col("stage_name").alias("k1"),
        F.col("stage").cast("int").alias("k2"),
        F.col("users").cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("v"),
        F.lit(None).cast("bigint").alias("v2"),
        F.col("pct_of_first").alias("ratio1"),
        F.col("pct_of_prev").alias("ratio2"),
    )
    rfm = rfm_segments(spark, sf_dir).select(
        F.lit("rfm").alias("section"),
        F.concat_ws("-", "r_q", "f_q", "m_q").alias("k1"),
        F.lit(None).cast("int").alias("k2"),
        F.col("n_users").cast("bigint").alias("n"),
        F.col("sum_events").cast("bigint").alias("v"),
        F.col("sum_cents").cast("bigint").alias("v2"),
        F.lit(None).cast("double").alias("ratio1"),
        F.lit(None).cast("double").alias("ratio2"),
    )
    return (
        coh.unionByName(fun)
        .unionByName(rfm)
        .orderBy("section", "k1", "k2")
    )
