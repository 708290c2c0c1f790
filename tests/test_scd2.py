"""SCD2 snapshot merge semantics: close-on-change, insert-new, pass-through,
idempotent re-application (same batch twice changes nothing)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from data_pipeline_team5_spark.operators.scd2 import scd2_apply

D = datetime.date

DIM_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("seg", T.StringType()),
        T.StructField("valid_from", T.DateType()),
        T.StructField("valid_to", T.DateType()),
    ]
)

UPD_SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("seg", T.StringType())]
)

DIM = [
    (1, "gold", D(2025, 1, 1), None),        # will change → close + insert
    (2, "silver", D(2025, 1, 1), None),      # unchanged → pass through
    (3, "bronze", D(2024, 1, 1), D(2025, 1, 1)),  # closed history, untouched
    (3, "silver", D(2025, 1, 1), None),      # open row of key 3, unchanged
]

UPDATES = [
    (1, "platinum"),  # change
    (2, "silver"),    # no-op
    (9, "gold"),      # brand-new key
]


def _rows(df):
    return sorted(
        (r.k, r.seg, r.valid_from, r.valid_to) for r in df.collect()
    )


def test_scd2_close_insert_passthrough(spark):
    dim = spark.createDataFrame(DIM, DIM_SCHEMA)
    upd = spark.createDataFrame(UPDATES, UPD_SCHEMA)
    out = scd2_apply(dim, upd, "k", ["seg"], "2025-06-01")
    assert _rows(out) == sorted(
        [
            (1, "gold", D(2025, 1, 1), D(2025, 6, 1)),      # closed
            (1, "platinum", D(2025, 6, 1), None),           # new version
            (2, "silver", D(2025, 1, 1), None),             # untouched
            (3, "bronze", D(2024, 1, 1), D(2025, 1, 1)),    # old history
            (3, "silver", D(2025, 1, 1), None),             # untouched open
            (9, "gold", D(2025, 6, 1), None),               # new key
        ]
    )


def test_scd2_reapply_is_noop(spark):
    dim = spark.createDataFrame(DIM, DIM_SCHEMA)
    upd = spark.createDataFrame(UPDATES, UPD_SCHEMA)
    once = scd2_apply(dim, upd, "k", ["seg"], "2025-06-01")
    twice = scd2_apply(once, upd, "k", ["seg"], "2025-06-01")
    assert _rows(once) == _rows(twice)
