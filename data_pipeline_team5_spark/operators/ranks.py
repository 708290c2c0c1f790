"""Distributed exact order statistics — the scale-safe substitute for
``NTILE(k) OVER (ORDER BY ...)``.

An unpartitioned ranking window moves EVERY row to one task ("WindowExec:
No Partition Defined" — the single-partition scale-killer class), so exact
quantile bucketing of a billion-user frame cannot ride ``F.ntile``. But
NTILE bucket membership is a pure function of a row's GLOBAL RANK in the
total order, and exact global ranks are computable with only distributed
primitives:

1. ``repartitionByRange`` on the order key — Spark's range exchange places
   partition *i* strictly before partition *i+1* in key order and is the
   same machinery behind every distributed ``orderBy``;
2. one tiny per-partition count (``|partitions|`` rows to the driver)
   turns local ranks into global ranks via cumulative offsets;
3. the handful of rows sitting at the requested ranks are fetched with a
   ``partitionBy(pid)`` window over ONLY the partitions that contain them
   (each bounded by ``n / num_partitions`` rows — a tunable, never the
   whole frame).

The fetched cut-rank elements are then broadcast back as literal
comparisons, so bucket assignment is a map-side projection: zero joins,
zero extra shuffles on the data frame, and the result is BITWISE equal to
the NTILE form (the order is total, so ranks are exact — no approximation
boundary to document, unlike a ``percentile_approx`` cutoff scheme).

Reference anchor: the reference's dashboards segment users in Redshift SQL
(README.md:160-220); NTILE itself is the classic form — this module exists
because Spark physically single-tasks the unpartitioned window that form
implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ntile_cut_ranks(n: int, buckets: int) -> list[int]:
    """The 1-based global ranks of the last element of buckets
    ``1..buckets-1`` under SQL-standard NTILE: with ``n = base*buckets +
    rem``, the first ``rem`` buckets hold ``base+1`` rows.  Duplicate cut
    ranks (empty trailing buckets when ``n < buckets``) are returned
    as-is — the strict-comparison bucket formula counts a duplicated
    threshold twice, which is exactly "skip the empty bucket"."""
    base, rem = divmod(n, buckets)
    return [b * base + min(b, rem) for b in range(1, buckets)]


def rows_at_global_ranks(
    df: DataFrame,
    order_cols: list[str],
    ranks: list[int],
    num_partitions: int | None = None,
) -> list:
    """Fetch the rows at the given 1-based global ranks of the total order
    ``order_cols`` (which MUST be a total order — include a unique
    tie-breaker column). Returns ``Row`` objects in rank order.

    Cost: one range exchange over ``df`` (narrow — project only the order
    columns before calling), one ``|partitions|``-row count collect, and
    one window over only the partitions holding requested ranks. The
    frame is ``localCheckpoint``-pinned so the count pass and the fetch
    pass see the identical partition layout (range-sampling is
    deterministic in lineage, but pinning removes the assumption).
    """
    if not ranks:
        return []
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    s = (
        df.select(*order_cols)
        .repartitionByRange(p, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in s.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    n = running
    bad = [k for k in ranks if not 1 <= k <= n]
    if bad:
        raise ValueError(f"ranks {bad} outside [1, {n}]")
    # (pid, local_rank) address of each requested global rank.
    targets: list[tuple[int, int]] = []
    for k in sorted(set(ranks)):
        pid = max(q for q in offsets if offsets[q] < k and counts[q] > 0)
        targets.append((pid, k - offsets[pid]))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    hit = F.lit(False)
    for pid, local in targets:
        hit = hit | ((F.col("_pid") == pid) & (F.col("_rn") == local))
    fetched = (
        s.filter(F.col("_pid").isin([pid for pid, _ in targets]))
        .withColumn("_rn", F.row_number().over(w))
        .filter(hit)
        .collect()
    )
    by_key = {
        (r["_pid"], r["_rn"]): r for r in fetched
    }
    by_rank = {
        k: by_key[t] for k, t in zip(sorted(set(ranks)), targets)
    }
    return [by_rank[k] for k in ranks]


def exact_ntile_bucket(
    df: DataFrame,
    order_cols: list[str],
    buckets: int,
    num_partitions: int | None = None,
    n: int | None = None,
) -> Column:
    """A column expression assigning each row of ``df`` its exact
    ``NTILE(buckets) OVER (ORDER BY order_cols)`` bucket — computed
    WITHOUT an unpartitioned window. ``order_cols`` must be a total order
    (unique tie-breaker last). On an empty frame returns ``lit(1)`` (no
    rows exist to carry it).

    Bucket = 1 + |{cut thresholds strictly below this row}| where the
    thresholds are the rows at the NTILE cut ranks, fetched exactly via
    :func:`rows_at_global_ranks` and embedded as literal struct
    comparisons — a broadcast-free map-side projection.

    Pass ``n`` (the row count) when the caller already knows it —
    assigning several metrics' buckets over one frame then costs one
    count total, not one per metric.
    """
    if n is None:
        n = df.count()
    if n == 0:
        return F.lit(1).cast("int")
    cut_rows = rows_at_global_ranks(
        df, order_cols, ntile_cut_ranks(n, buckets), num_partitions
    )
    x = F.struct(*[F.col(c) for c in order_cols])
    types = {f.name: f.dataType for f in df.select(*order_cols).schema}
    bucket: Column = F.lit(1)
    for row in cut_rows:
        t = F.struct(
            *[
                F.lit(row[c]).cast(types[c]).alias(c)
                for c in order_cols
            ]
        )
        bucket = bucket + (x > t).cast("int")
    return bucket.cast("int")


def grouped_rows_at_group_ranks(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    ranks_for: "callable",
    num_partitions: int | None = None,
) -> list[tuple]:
    """Exact per-group order statistics without per-group global sorts —
    the grouped companion of :func:`rows_at_global_ranks`.

    ``Window.partitionBy(group)`` is already scale-safe when groups are
    MANY and SMALL (each window partition bounded by group size); the
    regime it dies in is FEW HUGE groups — one task per language over a
    trillion-token corpus. This operator targets exactly that regime:

    1. ONE range exchange on ``(group, order)`` — rows of a group span a
       contiguous run of partitions, each bounded by ``n/P`` rows;
    2. one ``(partition, group)`` count collect — driver state is
       ``O(P × |groups|)``, trivially small precisely when groups are
       few (the regime this exists for; with millions of groups use the
       plain window instead);
    3. ``ranks_for(n_g)`` names each group's wanted 1-based ranks
       (e.g. ``ceil(n·p)`` quantile ranks); the rows at those ranks are
       fetched with ONE window over only the partitions that hold them,
       partitioned by ``(pid, group)`` — never a whole group in a task.

    Returns ``[(group_key_tuple, group_row_count, rank, Row), ...]``
    sorted by (group, rank). Selection does no arithmetic on the values — results are
    engine-exact. ``order_cols`` must total-order rows WITHIN a group
    (unique tie-breaker last).
    """
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    s = (
        df.select(*group_cols, *order_cols)
        .repartitionByRange(p, *group_cols, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    cnt_rows = (
        s.groupBy("_pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    # per group: pid → count, in pid (= range) order
    per_group: dict[tuple, dict[int, int]] = {}
    for r in cnt_rows:
        key = tuple(r[c] for c in group_cols)
        per_group.setdefault(key, {})[r["_pid"]] = r["cnt"]
    # address every wanted (group, rank) as (pid, local-rank-in-pid)
    targets: dict[tuple[int, tuple, int], int] = {}  # (pid,key,local)->rank
    group_n: dict[tuple, int] = {}
    for key, counts in per_group.items():
        n_g = sum(counts.values())
        group_n[key] = n_g
        ranks = sorted(set(ranks_for(n_g)))
        bad = [k for k in ranks if not 1 <= k <= n_g]
        if bad:
            raise ValueError(f"group {key}: ranks {bad} outside [1, {n_g}]")
        offsets: dict[int, int] = {}
        running = 0
        for pid in sorted(counts):
            offsets[pid] = running
            running += counts[pid]
        for k in ranks:
            pid = max(
                q for q in offsets if offsets[q] < k and counts[q] > 0
            )
            targets[(pid, key, k - offsets[pid])] = k
    need_pids = sorted({pid for pid, _, _ in targets})
    w = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    ranked = (
        s.filter(F.col("_pid").isin(need_pids))
        .withColumn("_rn", F.row_number().over(w))
    )
    hit = F.lit(False)
    for (pid, key, local) in targets:
        cond = (F.col("_pid") == pid) & (F.col("_rn") == local)
        for c, v in zip(group_cols, key):
            cond = cond & (
                F.col(c).isNull() if v is None else (F.col(c) == v)
            )
        hit = hit | cond
    fetched = ranked.filter(hit).collect()
    by_addr = {
        (r["_pid"], tuple(r[c] for c in group_cols), r["_rn"]): r
        for r in fetched
    }
    out = []
    for (pid, key, local), rank in targets.items():
        out.append((key, group_n[key], rank, by_addr[(pid, key, local)]))
    out.sort(key=lambda t: (tuple(map(str, t[0])), t[2]))
    return out
