"""Sinks (S3 CSV, S4/S5 Parquet/object store, S9 CTAS) with idempotent
partition overwrite.

The reference's sink is a blind Redshift COPY after CREATE IF NOT EXISTS —
re-running a day duplicates its rows (SURVEY.md §2.9 "upsert sink" row calls
this out as a real bug: retries:1 + non-idempotent load). The engine's daily
writer overwrites exactly the partitions present in the incoming frame
(dynamic partitionOverwriteMode), so a retried day converges instead of
doubling: the Spark-native idempotent upsert for append-only daily data.

S5 (boto3 upload to S3) is the same ``df.write`` with an ``s3a://`` path —
the Hadoop S3A committer replaces the hand-rolled byte upload; nothing else
changes, so these writers are the single sink surface for local disk and
object storage alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S3: header CSV encode — quoting-correct by construction.

    escape='"' selects RFC-4180 quote doubling (``""``) instead of Spark's
    default backslash escaping, matching readers.read_csv_table and what
    DuckDB/pandas/Redshift COPY parse without extra options."""
    (
        df.write.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .mode(mode)
        .csv(path)
    )


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] = "show_range",
    mode: str = "overwrite",
) -> None:
    """S4/S5 + the idempotent daily sink.

    With dynamic partition overwrite, ``mode=overwrite`` replaces only the
    partitions contained in ``df`` — the reference's re-run duplication bug
    cannot occur, and unrelated days are untouched (safe for backfills).
    """
    cols = [partition_by] if isinstance(partition_by, str) else partition_by
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*cols)
        .mode(mode)
        .parquet(path)
    )


def ctas(df: DataFrame, table_name: str) -> None:
    """S9: dbt '+materialized: table' (dbt_project.yml:32-36) — an eager
    CREATE OR REPLACE TABLE AS SELECT into the session catalog."""
    df.write.mode("overwrite").saveAsTable(table_name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    buckets: int = 32,
) -> None:
    """Materialize a table hash-bucketed (and sorted) on its join key.

    Two tables bucketed on the same key with the same bucket count join
    with ZERO shuffle on either side — Spark's sort-merge join reads the
    co-located buckets directly (tests/test_bucketed_join.py asserts the
    plan has no Exchange). This is the storage layout for the repeated
    big-big joins of a 100 TB pipeline (fact ⋈ fact, e.g. orders ⋈
    lineitem every day): pay the bucketing shuffle once at write time,
    never again at read time. Bucket count is fixed at write — size it to
    target-SF partition volume (buckets ≈ table_bytes / 128 MB).
    """
    keys = [key] if isinstance(key, str) else key
    (
        df.write.bucketBy(buckets, *keys)
        .sortBy(*keys)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    n_shards: int = 16,
    batch_id: str | None = None,
) -> None:
    """Physical twin of the ``shard_manifest`` query: write ``df`` as
    ``n_shards`` deterministic training shards under
    ``path/shard_id=K/``, each shard internally ordered by the md5-derived
    shuffle key (operators/sampling.py:shard_assign).

    Exactly ONE shuffle: ``repartition(n_shards, shard_id)`` routes every
    row to its shard's writer task, ``sortWithinPartitions(shard_id,
    sort_key)`` orders it there (spill-backed sort, no global order-by),
    and ``partitionBy`` names the directories. The sort leads with
    ``shard_id`` deliberately: the V1 file writer REQUIRES task rows
    ordered by the partition columns and inserts its own (unstable,
    sort_key-destroying) sort when they aren't — leading with shard_id
    satisfies that required ordering so the writer keeps ours. Rerunning produces byte-identical shard
    contents — shard and order derive from row keys, not from an RNG or
    partition layout — which is what makes a 100 TB training corpus
    reproducible from its manifest. The ``sort_key`` column is persisted
    so a reader can verify the order without recomputing digests.

    INCREMENTAL delivery (``batch_id``): the daily loop's survivors land
    as ``shard_id=K/batch_id=<day>/`` partitions under the same root —
    the fold-store convention — via dynamic partition overwrite, so a
    replayed day converges instead of doubling and a full re-deal is
    never needed (the digest deal guarantees a doc's shard is the same
    in every batch). Dynamic overwrite alone only replaces partitions
    PRESENT in the replayed frame — a replay whose changed input leaves
    a previously-populated shard empty for that batch would keep the
    stale partition live (ADVICE r9) — so the batch's existing
    ``shard_id=*/batch_id=<id>`` partitions are deleted first through
    the Hadoop FileSystem API (scheme-agnostic: local, HDFS, s3a). The
    delete+write pair is not atomic; a crash between them loses only
    this batch's partitions, which the replay that crashed was about to
    rewrite anyway. Each batch's files stay internally
    sort_key-ordered; a reader of the accumulated shard merges
    per-batch runs (or sorts on read) — the standard LSM-ish trade for
    append-style delivery.
    """
    from data_pipeline_team5_spark.operators.sampling import shard_assign

    dealt = shard_assign(df, key, n_shards)
    if batch_id is None:
        (
            dealt.repartition(n_shards, "shard_id")
            .sortWithinPartitions("shard_id", "sort_key")
            .write.partitionBy("shard_id")
            .mode("overwrite")
            .parquet(path)
        )
        return
    _drop_batch_partitions(df.sparkSession, path, batch_id)
    (
        dealt.withColumn("batch_id", F.lit(batch_id))
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "sort_key")
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id", "batch_id")
        .mode("overwrite")
        .parquet(path)
    )


def _drop_batch_partitions(spark, path: str, batch_id: str) -> None:
    """Delete every ``shard_id=*/batch_id=<id>`` partition under ``path``
    so a replay converges even when its changed input no longer touches a
    shard (dynamic overwrite cannot remove partitions it does not write).
    Hadoop ``FileSystem`` + ``globStatus`` keeps this scheme-agnostic —
    the same call works on file://, hdfs:// and s3a:// roots."""
    if "/" in batch_id:
        raise ValueError(f"batch_id may not contain '/': {batch_id!r}")
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # glob ONLY on the fixed-safe shard_id=* segment; the batch_id is
    # joined as an exact child path, never a pattern — a batch id
    # containing glob metachars (*, ?, {}, []) must not be able to
    # match — and delete — OTHER batches' partitions
    glob = jvm.org.apache.hadoop.fs.Path(f"{path}/shard_id=*")
    for status in fs.globStatus(glob) or []:
        child = jvm.org.apache.hadoop.fs.Path(
            status.getPath(), f"batch_id={batch_id}"
        )
        if fs.exists(child):
            fs.delete(child, True)


def create_if_not_exists(df: DataFrame, table_name: str) -> None:
    """S6: the reference's ``create_redshift_table`` DDL
    (daily_csv_pipeline.py:118-154, daily_parquet_pipeline.py:105-141 —
    a 20-column typed CREATE TABLE IF NOT EXISTS before every load).

    ``mode("ignore")`` is Spark's native if-not-exists: it creates the table
    with ``df``'s schema (and writes ``df``) only when absent, and is a
    no-op otherwise — schema comes from the DataFrame, not a hand-kept DDL
    string, so it can never drift the way the reference's dual CSV/Parquet
    DDLs did (SURVEY.md §1.2 type-variant divergence)."""
    df.write.mode("ignore").saveAsTable(table_name)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: str = "show_range",
    target_mb: int = 128,
    days: list | None = None,
) -> None:
    """Maintenance: rewrite a partitioned parquet dataset with right-sized
    files.

    Daily micro-batch ingest (10 rows/day here; one small file per
    executor-partition at scale) accretes small files that tax the
    InMemoryFileIndex listing and make scan tasks IO-bound — the classic
    100 TB operational failure the reference never hits at its data size
    but claims to design for. One file per partition-value-per-
    ``target_mb`` is restored by repartitioning on the partition column
    before a dynamic-overwrite write: each day's rewrite replaces only
    that day (idempotent, backfill-safe, same path as
    write_parquet_partitioned).
    """
    df = spark.read.parquet(path)
    if days is not None:
        df = df.where(F.col(partition_by).isin(list(days)))
    # Shuffle-partition count from the scan's own size estimate.
    total_bytes = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    n_parts = max(1, total_bytes // (target_mb * 1024 * 1024))
    # localCheckpoint materializes the scoped rows and cuts the lineage to
    # the source files — without it Spark (correctly) refuses to overwrite
    # a path it is still reading from. Compaction rewrites every byte it
    # touches anyway, so the materialization is not extra work; scope it
    # with ``days`` to keep each maintenance run bounded.
    checkpointed = df.localCheckpoint()
    # Repartitioning on the partition column ALONE would route each day to
    # one task → one file per day regardless of size (an oversized day
    # stays oversized). The file count must be sized PER DAY from that
    # day's volume — a corpus-average salt would fragment small days into
    # tiny files while leaving huge days over target. Per-day bytes are
    # estimated from row share of the scan's size estimate.
    # One aggregation job: collect the per-day counts, derive the per-day
    # file budget driver-side, and ship the tiny result back as a literal
    # frame (re-using the `counts` plan in the join would re-run the
    # aggregate a second time).
    count_rows = checkpointed.groupBy(partition_by).count().collect()
    rows_total = sum(r["count"] for r in count_rows) or 1
    bytes_per_row = total_bytes / rows_total
    target_bytes = target_mb * 1024 * 1024
    from data_pipeline_team5_spark.functions.localframe import local_frame

    files = local_frame(
        spark,
        [
            (
                r[partition_by],
                max(1, -(-int(r["count"] * bytes_per_row) // target_bytes)),
            )
            for r in count_rows
        ],
        checkpointed.select(partition_by).schema.add("_files", "integer"),
    )
    data_cols = [c for c in checkpointed.columns if c != partition_by]
    row_hash = F.hash(*data_cols) if data_cols else F.lit(0)
    compacted = (
        checkpointed.join(F.broadcast(files), partition_by)
        .withColumn("_salt", F.pmod(row_hash, F.col("_files")))
        .repartition(max(n_parts, 1), partition_by, "_salt")
        .drop("_salt", "_files")
    )
    write_parquet_partitioned(compacted, path, partition_by=partition_by)


def retention_sweep(
    spark: SparkSession,
    path: str,
    keep_days: int,
    as_of: str,
    partition_by: str = "show_range",
) -> list[str]:
    """Maintenance: drop partitions older than ``keep_days`` before
    ``as_of``; returns the partition values removed.

    The reference accretes one Redshift table per day forever (no retention
    anywhere in its DAGs); at 100 TB unbounded history is a storage and
    file-listing liability. Partition dirs are removed wholesale — an O(1)
    metadata operation per partition, no data rewrite — and the cutoff
    arithmetic runs driver-side on the partition VALUES (tiny), never on
    row data.
    """
    import datetime
    import shutil

    if "://" in path:
        raise ValueError(
            "retention_sweep deletes via the local filesystem only; for "
            "object stores drive deletion through the store's API "
            f"(got {path!r})"
        )
    cutoff = datetime.date.fromisoformat(as_of) - datetime.timedelta(
        days=keep_days
    )
    removed: list[str] = []
    values = [
        str(r[0])
        for r in spark.read.parquet(path).select(partition_by).distinct().collect()
    ]
    for v in values:
        try:
            day = datetime.date.fromisoformat(v)
        except ValueError:
            # non-date partition value (e.g. the Hive null-partition dir):
            # never age-based-deleted
            continue
        if day < cutoff:
            try:
                shutil.rmtree(f"{path}/{partition_by}={v}")
            except FileNotFoundError:
                continue  # already gone — not this sweep's removal
            except OSError as e:
                # Never report a partition as removed when it was not.
                raise OSError(
                    f"retention_sweep failed deleting {partition_by}={v}"
                ) from e
            removed.append(v)
    return sorted(removed)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC encode sink, same idempotent-partition contract as
    :func:`write_parquet_partitioned` when ``partition_by`` is given
    (dynamic overwrite replaces only the partitions present in ``df``)."""
    w = df.write.option("partitionOverwriteMode", "dynamic").mode(mode)
    if partition_by:
        cols = (
            [partition_by] if isinstance(partition_by, str) else partition_by
        )
        w = w.partitionBy(*cols)
    w.orc(path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Sort-clustered parquet layout for DATA SKIPPING — the storage-side
    lever partition directories can't provide for high-cardinality or
    range-queried columns (a directory per value would explode; a range
    cluster keeps file count free while making min/max footer stats
    selective).

    ``repartitionByRange(cluster_by)`` routes disjoint key ranges to
    disjoint files, ``sortWithinPartitions`` orders rows inside each so
    row-group stats are tight too. A later scan with a predicate on the
    cluster columns then prunes at TWO levels before reading data pages:
    whole files (footer min/max disjoint from the predicate) and row
    groups within surviving files. At 100 TB this is the difference
    between "read 3 files" and "read the corpus" for a range query —
    exactly what Delta/Iceberg Z-ordering buys, available in plain
    parquet for single-column-prefix predicates (multi-dimensional
    predicates genuinely need the space-filling-curve variant; this
    writer documents that boundary rather than pretending otherwise).

    Size ``num_files`` to target-SF volume (files ≈ bytes / 128 MB);
    left None, the range shuffle uses the session parallelism and AQE may
    coalesce small inputs to one file (fine for data, useless for
    demonstrating skipping).
    """
    parted = (
        df.repartitionByRange(int(num_files), *cluster_by)
        if num_files
        else df.repartitionByRange(*cluster_by)
    )
    (
        parted.sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )
