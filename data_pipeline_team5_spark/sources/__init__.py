"""Sources & sinks (SURVEY.md §2.1).

ingest   — S1/S2: KOFIC-shaped JSON envelope → typed long-format DataFrame
readers  — S7/S8: CSV/Parquet bulk load with explicit schemas
writers  — S3/S4/S5/S9: CSV/Parquet sinks + idempotent partition overwrite
"""

from data_pipeline_team5_spark.sources.ingest import (
    BOX_OFFICE_SCHEMA,
    RENAME_MAP,
    ingest_box_office_json,
)
from data_pipeline_team5_spark.sources.readers import read_csv_table, read_parquet_table
from data_pipeline_team5_spark.sources.writers import (
    write_csv,
    write_parquet_partitioned,
)

__all__ = [
    "BOX_OFFICE_SCHEMA",
    "RENAME_MAP",
    "ingest_box_office_json",
    "read_csv_table",
    "read_parquet_table",
    "write_csv",
    "write_parquet_partitioned",
]
