"""Skew-handling operators: explicit salting for the cases AQE can't fix.

AQE's skew-join splitting (on in session.py) repairs *shuffle-partition*
skew at runtime, but two hot-key shapes still serialize onto one task:

1. **Aggregation-state skew** — map-side partial aggregation compresses
   algebraic aggs (SUM/COUNT) fine, but holistic state (exact DISTINCT,
   collect_set) concentrates a hot key's entire value set in one reducer.
   ``salted_distinct`` shards the *distinct domain* by hash into ``n``
   disjoint buckets, counts distinct per (key, bucket), and sums — the
   per-key counts add exactly because the buckets partition the domain.
2. **Hot-key join skew** where the build side is too big to broadcast —
   ``salted_join`` replicates each build-side row ``n`` times and spreads
   the probe side across the replicas with a deterministic hash salt, so
   one hot key occupies ``n`` tasks instead of one.

Both transformations are semantics-preserving (tests/test_skew.py asserts
equality against the unsalted plans; the catalog query's DuckDB oracle is
the plain GROUP BY / COUNT(DISTINCT) SQL). Salts are deterministic hashes,
never random — results and retries stay stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    alias: str,
    n: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per ``keys``, sharded ``n`` ways.

    Phase 1 groups by (keys, hash(distinct_col) % n) so each reducer holds
    only its shard of a hot key's value set; phase 2 sums the shard counts.
    Exactness: the hash shards partition the value domain, so per-shard
    distinct sets are disjoint and their counts add. NULLs are excluded by
    COUNT(DISTINCT) semantics on both phases.
    """
    bucket = F.pmod(F.hash(distinct_col), F.lit(n)).alias("_salt")
    per_shard = df.groupBy(*keys, bucket).agg(
        F.countDistinct(distinct_col).alias("_nd")
    )
    return per_shard.groupBy(*keys).agg(F.sum("_nd").alias(alias))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n: int = 8,
    how: str = "inner",
    spread_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the build side replicated ``n``× to defeat hot keys.

    The probe side gets a deterministic salt in [0, n) hashed from
    ``spread_cols`` (default: all its columns), the build side is exploded
    across all n salt values, and the join runs on (key, salt) — a hot
    probe key now lands on n tasks. Build-side cost is n× its (small but
    not broadcastable) size; keep ``n`` modest.

    Only probe-preserving join types are valid: under right/full outer an
    unmatched build row would surface once per replica (n duplicates), so
    those are rejected — swap the sides instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: join type '{how}' would duplicate unmatched "
            f"build rows across salt replicas; use one of {sorted(allowed)}"
            " (or swap probe/build)"
        )
    cols = spread_cols or [c for c in probe.columns if c != key]
    salt_expr: Column = (
        F.pmod(F.hash(*cols), F.lit(n)) if cols else F.lit(0)
    )
    p = probe.withColumn("_salt", salt_expr)
    b = build.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))),
    )
    out = p.join(b, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def _narrow_leaf(df: DataFrame) -> tuple[str, int] | None:
    """Classify ``df`` when its optimized logical plan is a narrow
    Project/Filter chain over ONE leaf; ``None`` for anything else
    (joins, aggregates, unions, local frames).

    Returns ``("bytes", n)`` for a file relation (n = relation file
    bytes, from the already-resolved file index) or ``("parts", n)`` for
    a checkpointed RDD (n = its realized partition count, read off the
    LogicalRDD node — the layer ranks._pin's release handle uses).

    Round 18 (ADVICE r17): the round-17 width probe was
    ``df.rdd.getNumPartitions()``, which under AQE materializes every
    upstream shuffle stage as real jobs at plan-build time — for a
    join-derived input the join subtree executed TWICE per call. Walking
    the optimized logical plan costs only analysis (no jobs).
    """
    try:
        node = df._jdf.queryExecution().optimizedPlan()
        while True:
            name = node.getClass().getSimpleName()
            if name in ("Project", "Filter"):
                children = node.children()
                if children.size() != 1:
                    return None
                node = children.apply(0)
                continue
            if name == "LogicalRelation":
                return ("bytes", int(str(node.stats().sizeInBytes())))
            if name == "LogicalRDD":
                return ("parts", int(node.rdd().getNumPartitions()))
            return None
    except Exception:
        return None


def spread_small_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guarantee at least core-count partitions under a COMPUTE-dense
    operator whose input is bytes-tiny (round 17, guide §2.5/§1.2).

    File-source parallelism is sized by bytes (``maxPartitionBytes``), so
    a scan small enough to fit one split runs any downstream map-side
    work — a broadcast nested-loop cosine sweep, a literal-centroid
    argmin — in ONE task regardless of core count (profiled: a serial
    1.9 s stage inside hard_negative_mining at sf0.1 where per-row work
    is |queries| × dim flops).

    Applies ONLY to raw file scans and checkpoint pins (``_narrow_leaf``);
    other derived frames pass through untouched — a join/agg output
    already sits at shuffle-partition width, and probing its width would
    execute its subtree (ADVICE r17). For file relations the width gate
    mirrors Spark's own ``FilePartition`` split math instead of running
    it: splits are floored at ``spark.sql.files.openCostInBytes`` per
    core, so a scan of S bytes realizes ≥ ``min_parts`` tasks exactly
    when S ≥ min_parts × openCost. For pinned frames (``localCheckpoint``
    → LogicalRDD — e.g. the exact-dedup survivor layer the curation
    jaccard pass shingles) the realized partition count is read straight
    off the plan node. At production input sizes both are wide and this
    is a NO-OP — no extra shuffle at scale; only the
    byte-tiny-but-compute-heavy regime pays one round-robin rebalance of
    its already-tiny input. Results are partitioning-independent by
    contract of every caller (algebraic aggregates / per-row projections
    only).
    """
    spark = df.sparkSession
    want = min_parts or spark.sparkContext.defaultParallelism
    leaf = _narrow_leaf(df)
    if leaf is None:
        return df
    kind, n = leaf
    if kind == "parts":
        return df if n >= want else df.repartition(want)
    open_cost = int(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    )
    if n >= want * open_cost:
        return df
    return df.repartition(want)
