"""Small-file compaction: many tiny files per partition collapse to few,
rows and partition layout survive, and a scoped run touches only its days."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.sources.writers import (
    compact_partitions,
    write_parquet_partitioned,
)
from tests.conftest import SF_SMALL


def _parquet_files(path: str) -> list[str]:
    return glob.glob(f"{path}/*/*.parquet")


def _fragmented(spark, path: str):
    """Write orders as a day-partitioned dataset fragmented into many files."""
    o = (
        table(spark, SF_SMALL, "orders")
        .select(
            F.to_date("o_orderdate").alias("show_range"),
            "o_orderkey",
            "o_totalprice",
        )
        .filter(F.col("show_range") >= F.lit("1998-07-25"))
        .repartition(16)  # 16 files inside every day partition
    )
    write_parquet_partitioned(o, path)
    return spark.read.parquet(path)


def test_compaction_reduces_files_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    before = _fragmented(spark, path)
    n_rows = before.count()
    checksum = before.agg(F.sum("o_orderkey")).collect()[0][0]
    n_files_before = len(_parquet_files(path))

    compact_partitions(spark, path)

    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert after.agg(F.sum("o_orderkey")).collect()[0][0] == checksum
    n_files_after = len(_parquet_files(path))
    assert n_files_after < n_files_before
    # tiny dataset → size estimate under one target chunk → 1 shuffle
    # partition → one file per day partition
    days = after.select("show_range").distinct().count()
    assert n_files_after == days


def test_scoped_compaction_touches_only_given_days(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _fragmented(spark, path)
    day = "1998-07-30"
    other_files_before = {
        f for f in _parquet_files(path) if f"show_range={day}" not in f
    }
    compact_partitions(spark, path, days=[day])
    other_files_after = {
        f for f in _parquet_files(path) if f"show_range={day}" not in f
    }
    assert other_files_before == other_files_after  # untouched days intact
    day_files = [f for f in _parquet_files(path) if f"show_range={day}" in f]
    assert len(day_files) == 1


def test_retention_sweep_drops_only_expired_days(spark, tmp_path):
    from data_pipeline_team5_spark.sources.writers import retention_sweep

    path = str(tmp_path / "ret")
    _fragmented(spark, path)
    all_days = sorted(
        str(r[0])
        for r in spark.read.parquet(path).select("show_range").distinct().collect()
    )
    removed = retention_sweep(spark, path, keep_days=3, as_of="1998-08-02")
    kept = sorted(
        str(r[0])
        for r in spark.read.parquet(path).select("show_range").distinct().collect()
    )
    assert removed == [d for d in all_days if d < "1998-07-30"]
    assert kept == [d for d in all_days if d >= "1998-07-30"]
    # idempotent: second sweep removes nothing
    assert retention_sweep(spark, path, keep_days=3, as_of="1998-08-02") == []
