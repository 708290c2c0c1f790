"""local_frame: JVM-backed driver-local frames (round-17 optimization).

Pins the two properties the optimization rests on:

1. **Bit-exact values** vs the classic ``spark.createDataFrame(rows,
   schema)`` path for every type the call sites use (dates, doubles,
   strings, ints/longs, arrays of doubles, NULLs in each).
2. **JVM evaluation**: the produced plan is a ``LocalTableScan`` (no
   pickled-RDD scan, hence no per-evaluation Python workers).
"""

from __future__ import annotations

import datetime
import struct

from pyspark.sql import types as T

from data_pipeline_team5_spark.functions.localframe import local_frame

SCHEMA = (
    "d DATE, v DOUBLE, s STRING, i INT, l BIGINT, arr ARRAY<DOUBLE>"
)

ROWS = [
    (datetime.date(1998, 11, 1), 0.1 + 0.2, "x", 7, 1 << 60, [1.0, -0.0]),
    (datetime.date(1970, 1, 1), 5e-324, "", -1, -(1 << 60), []),
    (None, None, None, None, None, None),
    (datetime.date(2049, 12, 31), -1e308, "é~한", 0, 0, [float("inf")]),
]


def _bits(x):
    if isinstance(x, float):
        return struct.pack(">d", x)
    if isinstance(x, list):
        return [_bits(e) for e in x]
    return x


def test_values_bitwise_match_classic_path(spark):
    got = local_frame(spark, ROWS, SCHEMA).collect()
    want = spark.createDataFrame(ROWS, SCHEMA).collect()
    assert [[_bits(v) for v in r] for r in got] == [
        [_bits(v) for v in r] for r in want
    ]


def test_plan_is_local_table_scan(spark):
    df = local_frame(spark, ROWS, SCHEMA)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan


def test_structtype_schema_and_row_inputs(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    src = spark.createDataFrame([(1, "x"), (2, None)], schema)
    got = local_frame(spark, src.collect(), schema)
    assert got.schema == schema
    assert sorted(map(tuple, got.collect())) == [(1, "x"), (2, None)]


def test_empty_rows_keep_schema_and_zero_rows(spark):
    df = local_frame(spark, [], SCHEMA)
    assert df.count() == 0
    # Exact StructType — dtypes, nullability flags and metadata included
    # (ADVICE r17: the round-17 typed-null projection relaxed nullability
    # and this test only pinned the names).
    assert df.schema == T.StructType.fromDDL(SCHEMA)
    # Still a pure-JVM local relation: zero tasks per evaluation.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_empty_rows_keep_nonnullable_fields_and_metadata(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), nullable=False),
            T.StructField("b", T.DoubleType(), nullable=True),
            T.StructField(
                "c", T.StringType(), nullable=False, metadata={"k": "v"}
            ),
        ]
    )
    df = local_frame(spark, [], schema)
    assert df.schema == schema
    assert df.schema["c"].metadata == {"k": "v"}
    assert df.count() == 0
