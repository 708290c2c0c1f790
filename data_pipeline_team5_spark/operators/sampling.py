"""Reproducible sampling for training-data pipelines.

``df.sample``/``sampleBy`` draw from a partition-seeded RNG: results change
whenever partitioning changes (a repartition, a different file split, a
cluster resize), which silently breaks the holy rule of dataset curation —
the same document must land in the same split on every run. These operators
derive the decision from a HASH OF THE ROW KEY instead: fully deterministic
across partitionings, engines and reruns, pure per-row JVM expressions
(md5 → first 8 hex chars → integer bucket in [0, 10000)), and exactly
mirrored in SQL for the DuckDB oracles.

Scale: shuffle-free row-parallel map work; the split column costs one
projection and prunes into the scan's filters when selecting one split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000  # basis-point resolution for fractions


def frac_to_buckets(fraction: float) -> int:
    """Bucket threshold for a fraction — round, don't truncate: float
    products like 0.043*10000 == 429.999... would otherwise land one
    bucket short and systematically under-draw by a basis point."""
    return int(round(fraction * BUCKETS))


def hash_bucket(key: Column | str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from the row key: first 8 hex
    chars of md5 — engine-independent (md5 text is canonical)."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % BUCKETS
    )


def hash_bucket_sql(expr: str) -> str:
    """DuckDB mirror of :func:`hash_bucket`."""
    return (
        f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::UBIGINT"
        f" % {BUCKETS})"
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float
) -> DataFrame:
    """Keep rows whose key-bucket falls under ``fraction`` — the same rows
    on every run, every partitioning, every engine."""
    return df.filter(hash_bucket(key) < frac_to_buckets(fraction))


def split_assign(
    df: DataFrame,
    key: str,
    val_frac: float = 0.01,
    test_frac: float = 0.01,
    col_name: str = "split",
) -> DataFrame:
    """Append a train/val/test assignment column from the key hash.

    Buckets [0, val) → val, [val, val+test) → test, rest → train. Adding
    documents to the corpus never moves an existing document between
    splits (its bucket depends only on its own key) — the property that
    keeps eval sets stable as a 100 TB corpus grows.
    """
    b = hash_bucket(key)
    v = frac_to_buckets(val_frac)
    t = v + frac_to_buckets(test_frac)
    return df.withColumn(
        col_name,
        F.when(b < v, "val").when(b < t, "test").otherwise("train"),
    )


def mixture_rates(
    df: DataFrame, weights: dict[str, float], group_col: str = "lang"
) -> DataFrame:
    """Per-group keep rates for the LARGEST subsample matching a target
    mixture (waterline: ``cap = min n_avail/weight``; the bottleneck group
    keeps 100%, every other group down-samples to ``weight × cap`` docs).
    Returns ``(group, n_avail, keep_rate)`` — a ~|groups|-row frame meant
    to be broadcast back onto the corpus scan. Groups absent from
    ``weights`` are excluded (rate row absent → inner join drops them).
    """
    w = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn("w", w[F.col(group_col)])
        .filter(F.col("w").isNotNull())
    )
    cap = counts.select(
        (F.col("n_avail").cast("double") / F.col("w")).alias("per_cap")
    ).agg(F.min("per_cap").alias("cap"))
    return counts.crossJoin(F.broadcast(cap)).select(
        group_col,
        "n_avail",
        (
            F.col("cap") * F.col("w") / F.col("n_avail").cast("double")
        ).alias("keep_rate"),
    )


def mixture_filter(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Keep the deterministic (md5-bucket) subsample whose ``group_col``
    shares match ``weights`` — :func:`mixture_rates` broadcast onto the
    corpus; the big side never shuffles for the sampling decision. Rows
    whose group is absent from ``weights`` are dropped."""
    rates = mixture_rates(df, weights, group_col=group_col)
    kept = hash_bucket(key) < F.col("keep_rate") * F.lit(BUCKETS)
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(kept)
        .drop("n_avail", "keep_rate")
    )


PACK_SHARD_DOCS = 128  # order-key range per shard; >1 shard even at sf0.001
# Production shard size (ADVICE r4): shard_docs must SCALE WITH THE CORPUS.
# The level-2 pass funnels #shards ≈ n_docs/shard_docs rows per partition
# value through one task's window sort, and the offsets table is joined back
# to every row — with shard_docs=128 a 1e9-doc corpus would mean ~8M offset
# rows (fine as a join side, fatal as a forced broadcast; the join below is
# left to AQE for exactly that reason). At 2^20 docs/shard a 1e9-doc corpus
# has ~1000 shards/language: both window passes stay bounded. If #shards
# itself outgrows one task (~1e12 docs/partition value), the same scheme
# nests to three levels — shard the shards.
PACK_SHARD_DOCS_PRODUCTION = 1 << 20


def pack_bins(
    df: DataFrame,
    order_key: str,
    size_col: str,
    budget: int,
    partition_cols: tuple[str, ...] = ("lang",),
    shard_docs: int = PACK_SHARD_DOCS,
) -> DataFrame:
    """Assign each row to its linear-packing bin: ``bin_id = floor(prefix
    sum of sizes before this row / budget)`` within each partition, rows
    ordered by ``order_key``.

    Precondition: ``order_key`` must be a UNIQUE, non-negative integral
    column per partition value (``doc_id`` satisfies this). Integral because
    the shard key is ``order_key div shard_docs`` (the name is interpolated
    into the expression verbatim); unique because a duplicated key makes the
    exclusive-prefix cumsum order — and hence ``bin_id`` — nondeterministic
    across runs, defeating reproducible packing. Callers with non-unique
    keys must pre-compose a unique one (e.g. ``order_key * K + dup_rank``).

    Two-level prefix sum, NOT one window per partition value: a single
    ``Window.partitionBy(lang)`` serializes an entire language (possibly
    most of a 100 TB corpus) through one task's sort (VERDICT r2 #4). Here
    the cumsum runs per (partition, shard) — shard = ``order_key div
    shard_docs``, monotonic in the order key, so shard order IS key order —
    then a per-shard total table (one row per shard) is prefix-summed and
    joined back as each shard's starting offset. Both window passes are
    bounded (≤ shard_docs rows; ≈ n_docs/shard_docs rows), every stage is
    fully parallel across shards, and the result is bit-identical to the
    single-window form (pinned in tests/test_properties.py).

    Sizing (ADVICE r4): the default ``shard_docs`` suits tests/fixtures;
    production passes ``PACK_SHARD_DOCS_PRODUCTION`` (or ~sqrt(n_docs)) so
    the offsets table stays small relative to the corpus. The offsets join
    is deliberately NOT hint-broadcast — at production shard sizes it is
    broadcast-sized and AQE picks that plan; at degenerate shard sizes a
    forced broadcast would blow the driver.

    Bin arithmetic stays in BIGINT (``div``) end to end — a double-typed
    division would silently round once corpus token counts pass 2^53.
    """
    parts = list(partition_cols)
    shard = F.expr(f"{order_key} div {int(shard_docs)}")
    sized = df.withColumn("_shard", shard)
    w_local = (
        Window.partitionBy(*parts, "_shard")
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = sized.withColumn(
        "_local_before",
        F.coalesce(F.sum(size_col).over(w_local), F.lit(0)).cast("long"),
    )
    totals = sized.groupBy(*parts, "_shard").agg(
        F.sum(size_col).cast("long").alias("_shard_tot")
    )
    w_shard = (
        Window.partitionBy(*parts)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *parts,
        "_shard",
        F.coalesce(F.sum("_shard_tot").over(w_shard), F.lit(0))
        .cast("long")
        .alias("_shard_off"),
    )
    return (
        local.join(offsets, [*parts, "_shard"])
        .withColumn(
            "bin_id",
            F.expr(f"(_shard_off + _local_before) div {int(budget)}"),
        )
        .drop("_shard", "_local_before", "_shard_off")
    )


def flattened_weights(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-flattened mixture weights from observed group counts:
    ``w_g ∝ share_g**alpha``, normalized — the standard multilingual
    sampling smoother (share^α with α<1 boosts low-resource groups;
    α=1 reproduces the observed mixture exactly, α=0 is uniform).

    Driver-side math over a ~|groups|-row dict (collect the counts with
    one tiny agg); feed the result to :func:`mixture_rates` /
    :func:`mixture_filter` — with α=1 every keep_rate is 1.0 (the
    waterline cap equals every group's own size), a pinned invariant in
    tests/test_curation_extras.py.
    """
    if not counts:
        return {}
    total = float(sum(counts.values()))
    raw = {g: (n / total) ** alpha for g, n in counts.items()}
    z = sum(raw.values())
    return {g: v / z for g, v in raw.items()}


def shard_assign(
    df: DataFrame, key: str, n_shards: int
) -> DataFrame:
    """Append the training-output shard id and the deterministic
    intra-shard shuffle key derived from one md5 of the row key:
    hex chars 17-24 → ``shard_id`` in [0, n_shards), hex chars 9-16 →
    ``sort_key`` (fixed-width lowercase hex, so string order == numeric
    order), suffixed with the FULL key string so the order is total even
    under a 32-bit digest-prefix collision (no padding: lpad TRUNCATES
    keys longer than its width, which would break totality for 19-digit
    bigint ids — among collisions the tiebreak order is lexicographic,
    i.e. arbitrary-but-deterministic, which is all totality needs). Chars 1-8 are deliberately NOT
    used: they are :func:`hash_bucket`'s bits, and because 16 divides
    10000, ``% n_shards`` of those bits would be a pure function of the
    split bucket — val docs would deal into a split-correlated shard
    pattern instead of independently.

    Independent bits of the same digest make shard and order uncorrelated
    with each other and with ingestion order, and — unlike
    ``df.orderBy(rand())`` — reproducible across runs, partitionings and
    engines. Map-side projection only; the physical write is
    sources/writers.py:write_training_shards (one shuffle).
    """
    d = F.md5(F.col(key).cast("string"))
    return df.withColumn(
        "shard_id",
        F.conv(F.substring(d, 17, 8), 16, 10).cast("long")
        % int(n_shards),
    ).withColumn(
        "sort_key",
        F.concat(
            F.substring(d, 9, 8),
            F.lit(":"),
            F.col(key).cast("string"),
        ),
    )


INSPECT_SALT = "inspect:"  # decorrelates the review draw from split/shard
# digests (md5(key) prefix bits ARE hash_bucket's split bits — an unsalted
# smallest-md5-per-group draw would sample mostly val-split docs at scale)


def inspect_key(key: Column | str) -> Column:
    """The review-sample rank key: md5 of the SALTED row key (full 32-hex
    string — fixed-width lowercase hex, so string order is digest order),
    deterministic and uncorrelated with split/shard/ingestion order."""
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(INSPECT_SALT), c.cast("string")))


def inspect_key_sql(expr: str) -> str:
    return f"md5('{INSPECT_SALT}' || CAST({expr} AS VARCHAR))"


def inspection_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    k: int,
    safety: int = 50,
) -> DataFrame:
    """The K smallest-salted-digest rows per group — a deterministic
    human-review sample (same docs every run/partitioning/engine), ranked
    ``pick_rank`` 1..K within each group.

    Semantics are EXACTLY ``row_number() over (partition by group order by
    inspect_key, key) <= k`` — but the naive single window funnels the
    whole corpus through |groups| window sorts, the classic 100 TB
    scale-killer when groups are few and large. Two phases instead:

    1. PREFILTER on a prefix of the rank key itself: keep rows whose
       digest sorts below a threshold sized from the smallest group
       (expected ``safety × k`` candidates per group — a tiny count agg,
       driver-side scalar, no corpus shuffle). Because the filter is a
       prefix of the ORDER key, every true top-k row whose group has ≥ k
       candidates under the threshold is provably retained.
    2. WINDOW over the surviving sliver only, then VERIFY per group:
       a group that produced fewer picks than ``min(k, its row count)``
       under-filtered (digest fluke) — those groups, and only those,
       fall back to an exact window over their full rows. The fallback
       is a per-group correctness net, not a performance path; with
       ``safety=50`` its probability per group is astronomically small
       (Chernoff: P[Binomial(n, 50k/n) < k] at n ≥ 50k).

    At fixture scale the threshold saturates (frac ≥ 1 ⇒ no pruning) and
    phase 1 is a no-op — the pattern exists for the 100 TB shape, where
    the window input shrinks from the corpus to ~safety·k·|groups| rows.
    Both phases are bitwise-reproducible, so the DuckDB oracle is the
    naive single-window form.

    OBSERVABILITY: each fallback activation logs a WARNING with the
    short-group count ("inspection_sample fallback: N of M groups…").
    The fallback window re-sorts those groups' FULL rows, so it is the
    exact cost the prefilter exists to avoid — one activation is a
    digest fluke; recurring activations mean ``safety`` is mis-tuned
    for the group-size distribution (raise it, or check for a group far
    smaller than the rest, which drags the shared threshold down).
    """
    import math

    d = inspect_key(key).alias("_ik")
    keyed = df.select("*", d)

    counts = keyed.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    rows = counts.collect()  # |groups| rows — driver-side model state
    if not rows:
        empty = keyed.withColumn("pick_rank", F.lit(1).cast("int"))
        return empty.filter(F.lit(False)).drop("_ik")
    min_n = min(r["_n"] for r in rows)
    frac = min(1.0, (safety * k) / max(min_n, 1))
    w = Window.partitionBy(group_col).orderBy("_ik", key)
    if frac >= 1.0:
        cand = keyed  # threshold saturated: no pruning (fixture-scale path)
    else:
        # threshold on the first 8 hex chars (2^32 space), as a hex
        # literal so the comparison stays a pure string < — same trick at
        # any digest width. Capped at 2^32-1 (the 8-hex maximum); the
        # 1/2^32 under-inclusion risk at the cap lands in the fallback.
        t = min(int(math.ceil(frac * (1 << 32))), (1 << 32) - 1)
        cand = keyed.filter(F.substring("_ik", 1, 8) < F.lit(format(t, "08x")))
    ranked = (
        cand.withColumn("pick_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("pick_rank") <= k)
    )

    if frac >= 1.0:
        return ranked.drop("_ik")  # no pruning happened: already exact

    # verify: groups whose pick count fell short of min(k, group size)
    got = ranked.groupBy(group_col).agg(F.count(F.lit(1)).alias("_got"))
    short = (
        counts.join(got, group_col, "left")
        .filter(
            F.coalesce(F.col("_got"), F.lit(0))
            < F.least(F.lit(k), F.col("_n"))
        )
        .select(group_col)
    )
    short_groups = [r[0] for r in short.collect()]
    if not short_groups:
        return ranked.drop("_ik")
    import logging

    logging.getLogger(__name__).warning(
        "inspection_sample fallback: %d of %d groups under-filtered at "
        "safety=%d (exact re-window over their full rows); recurring "
        "activations mean safety is mis-tuned for the group-size "
        "distribution",
        len(short_groups), len(rows), safety,
    )
    # membership must be NULL-SAFE: a NULL group value makes isin()
    # three-valued (NULL), which would silently drop the NULL group from
    # BOTH branches — and a None inside the list would poison every
    # comparison. Split the sentinel out explicitly.
    non_null = [g for g in short_groups if g is not None]
    is_short = F.col(group_col).isin(non_null) if non_null else F.lit(False)
    if any(g is None for g in short_groups):
        is_short = is_short | F.col(group_col).isNull()
    else:
        is_short = F.coalesce(is_short, F.lit(False))
    exact_fallback = (
        keyed.filter(is_short)
        .withColumn("pick_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("pick_rank") <= k)
    )
    return (
        ranked.filter(~F.coalesce(is_short, F.lit(False)))
        .unionByName(exact_fallback)
        .drop("_ik")
    )
