"""Bulk-load readers (S7 CSV, S8 Parquet).

The reference's Redshift ``COPY`` statements become plain Spark reads:
- S7 `COPY ... delimiter ',' IGNOREHEADER 1 removequotes dateformat 'auto'`
  (daily_csv_pipeline.py:164-169) → header-aware, properly-quoted CSV read
  against an explicit schema (fixing the reference's comma-unsafe string
  surgery, SURVEY.md §3.3).
- S8 `COPY ... FORMAT AS PARQUET` (daily_parquet_pipeline.py:151-156) →
  schema-by-name parquet read; appends stay unionByName-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_table(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("dateFormat", "yyyy-MM-dd")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_parquet_table(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Parquet scan; pass ``columns`` to prune at the scan (ReadSchema)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df
