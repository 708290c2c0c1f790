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


def test_range_clustered_layout_enables_skipping(spark, tmp_path):
    """write_range_clustered must produce files whose footer min/max
    ranges on the cluster column are (near-)disjoint — the property data
    skipping actually consumes. Contrast with the unclustered layout,
    where every file spans ~the whole key range and nothing can skip."""
    import glob

    import pyarrow.parquet as pq

    from data_pipeline_team5_spark.sources.writers import (
        write_range_clustered,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .repartition(8)  # scatter first: worst-case incoming layout
    )
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_range_clustered(docs, clustered, ["n_chars"], num_files=6)
    docs.write.parquet(plain)

    def ranges(root):
        out = []
        for f in sorted(glob.glob(f"{root}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("n_chars")
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            if los:
                out.append((min(los), max(his)))
        return out

    def overlap_pairs(rs):
        return sum(
            1
            for i, (lo1, hi1) in enumerate(rs)
            for lo2, hi2 in rs[i + 1:]
            if lo1 <= hi2 and lo2 <= hi1
        )

    c, p = ranges(clustered), ranges(plain)
    assert len(c) > 1, "need multiple files to demonstrate skipping"
    # clustered: file ranges disjoint (range partitioner boundaries);
    # plain: essentially every pair overlaps
    assert overlap_pairs(c) == 0
    assert overlap_pairs(p) > 0
    # and the data survived intact
    assert (
        spark.read.parquet(clustered).count()
        == spark.read.parquet(plain).count()
    )
