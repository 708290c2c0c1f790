"""ORC encode sink + bulk load: write_orc → read_orc_table round-trips
typed rows exactly (the columnar sibling of the CSV/parquet round-trip
tests; ORC is the format breadth item beyond the reference's surface)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_team5_spark.sources.readers import read_orc_table
from data_pipeline_team5_spark.sources.writers import write_orc

SCHEMA = T.StructType(
    [
        T.StructField("code", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("sales", T.LongType()),
        T.StructField("released_date", T.DateType()),
        T.StructField("day", T.StringType()),
    ]
)

ROWS = [
    (1, "plain title", 1000, datetime.date(2025, 1, 23), "d1"),
    (2, 'has "quotes" inside', 2000, datetime.date(2025, 1, 24), "d1"),
    (3, "comma, in, title", 3000, datetime.date(2025, 1, 25), "d2"),
    (4, None, None, None, "d2"),
]


def test_orc_roundtrip_exact(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "t.orc")
    write_orc(df, p)
    back = read_orc_table(spark, p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)
    pruned = read_orc_table(spark, p, columns=["code", "sales"])
    assert pruned.columns == ["code", "sales"]


def test_orc_partitioned_write_is_idempotent(spark, tmp_path):
    """Dynamic overwrite of one day leaves the other day untouched —
    the same re-run convergence contract the parquet sink carries."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "t_part.orc")
    write_orc(df, p, partition_by="day")
    write_orc(df.filter(F.col("day") == "d1"), p, partition_by="day")
    back = read_orc_table(spark, p)
    assert back.count() == len(ROWS)  # d2 rows survived the d1 rewrite
    assert {r["day"] for r in back.select("day").distinct().collect()} == {
        "d1",
        "d2",
    }
