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
from pyspark.sql import functions as F
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
    else:
        # without a schema every column would silently read as STRING
        # (lexicographic dates, garbage sums); infer types instead
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet_table(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Parquet scan; pass ``columns`` to prune at the scan (ReadSchema)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_json_landed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Scale-path ingest (S1 at volume): schema'd read of landed JSON-lines
    files, split into (good, quarantine).

    The reference aborts the whole day on any malformed response
    (daily_csv_pipeline.py:40-42); at 100 TB a single bad record must not
    kill the batch. Lines are read as text and parsed with ``from_json``
    carrying a corrupt-record field in its schema: a line that fails to
    parse is quarantined verbatim for replay, everything else loads — the
    loud-but-not-fatal version of the reference's P8 guard. Both frames
    are filters over the same one-pass text scan. (Not the json reader's
    file-level ``columnNameOfCorruptRecord``: Spark forbids scans that
    reference only that internal column, which makes
    ``quarantine.count()`` throw — inside ``from_json`` it is a computed
    column with no such restriction.) A syntactically-valid
    line with wrong field types parses to a struct with NULL fields and
    lands in ``good``; pair with functions/checks.py for type-level gates.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("_doc"),
    )
    # A line can fail two ways: the corrupt column is set (malformed JSON
    # object), or the whole struct is NULL (blank line, a literal `null`) —
    # without the isNull arm those lines would land in `good` as fabricated
    # all-NULL rows.
    is_bad = (
        F.col("_doc").isNull() | F.col(f"_doc.{corrupt_col}").isNotNull()
    )
    good = parsed.filter(~is_bad).select(
        *[F.col(f"_doc.{f.name}") for f in schema.fields]
    )
    quarantine = parsed.filter(is_bad).select(
        F.col("value").alias(corrupt_col)
    )
    return good, quarantine


def read_orc_table(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan (breadth beyond the reference's CSV/Parquet/JSON surface —
    the other columnar format a warehouse migration hands you). Same
    contract as :func:`read_parquet_table`: pass ``columns`` to prune at
    the scan; ORC pushes filters/projections like parquet does."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df
