"""S3 (CSV encode sink) + S7 (bulk CSV load): write_csv → read_csv_table
round-trips typed rows exactly, including the comma/quote cases the
reference's string-surgery CSV path corrupts (daily_csv_pipeline.py:66-107
rewrites raw header bytes; COPY ... removequotes then strips quotes blindly,
so an embedded comma splits a field — SURVEY.md §3.3)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from data_pipeline_team5_spark.sources.readers import read_csv_table
from data_pipeline_team5_spark.sources.writers import write_csv

SCHEMA = T.StructType(
    [
        T.StructField("code", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("sales", T.LongType()),
        T.StructField("released_date", T.DateType()),
    ]
)

ROWS = [
    (1, "plain title", 1000, datetime.date(2025, 1, 23)),
    (2, 'has "quotes" inside', 2000, datetime.date(2025, 1, 24)),
    (3, "comma, in, title", 3000, datetime.date(2025, 1, 25)),
    (4, None, None, None),  # NULLs survive the text format
]


def test_csv_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "csv_roundtrip")
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_csv(df, path)
    back = read_csv_table(spark, path, schema=SCHEMA)
    assert back.schema == SCHEMA
    assert sorted(back.collect()) == sorted(df.collect())
