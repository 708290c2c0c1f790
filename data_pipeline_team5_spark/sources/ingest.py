"""KOFIC box-office JSON ingest: S1 (HTTP JSON scan) + S2 (unwrap) + P1-P4.

The reference fetches the KOFIC daily box-office endpoint and hand-rolls the
normalization in pandas/CSV string surgery (daily_parquet_pipeline.py:23-82,
daily_csv_pipeline.py:23-107). Here the whole normalization is ONE declarative
Spark plan over the raw JSON document:

    raw json text
      → F.from_json(envelope schema)        (S2: typed unwrap, no .get chains)
      → F.explode(dailyBoxOfficeList)       (S2: list → rows)
      → envelope fields broadcast per row   (P2: F.lit-like projection)
      → withColumnsRenamed(RENAME_MAP)      (P1: bulk rename — names are DATA,
                                             never date-prefixed identifiers)
      → substring_index(showRange, '~', 1)  (P3: ''a~b'' → a)
      → to_date(..., 'yyyyMMdd') / casts    (P4: schema-on-write, §1.2 types)

Unlike the reference, time is a COLUMN (`show_range`), not a table-name/
column-prefix; storage is parquet partitioned by show_range, so the dbt
models' 9-table UNION ALL becomes partition pruning (SURVEY.md §1.3).

The HTTP GET itself stays a driver-side fetch for a ~10-row/day API (S1); at
scale the same schema applies to landed JSON files via spark.read.json, or a
Spark 4 Python DataSource for parallel API shards.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# API field → engine column (daily_parquet_pipeline.py:53-72 rename_dict,
# normalized: no {YYYYMMDD}_ prefix — the date lives in show_range).
RENAME_MAP = {
    "rnum": "rank_num",
    "rank": "ranking",
    "rankInten": "increase_decrease",
    "rankOldAndNew": "new_entry",
    "movieCd": "code",
    "movieNm": "title",
    "openDt": "released_date",
    "salesAmt": "sales",
    "salesShare": "sales_ratio",
    "salesInten": "sales_delta",
    "salesChange": "sales_delta_pct",
    "salesAcc": "total_sales",
    "audiCnt": "audience_num",
    "audiInten": "audience_delta",
    "audiChange": "audience_delta_pct",
    "audiAcc": "total_audience_num",
    "scrnCnt": "screen_num",
    "showCnt": "screen_show",
}

# Envelope: boxOfficeResult.{boxofficeType, showRange, dailyBoxOfficeList[]}
# — every list field arrives as a JSON string (daily_parquet_pipeline.py:34-40).
_ROW = T.StructType(
    [T.StructField(f, T.StringType()) for f in RENAME_MAP]
)
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "boxOfficeResult",
            T.StructType(
                [
                    T.StructField("boxofficeType", T.StringType()),
                    T.StructField("showRange", T.StringType()),
                    T.StructField("dailyBoxOfficeList", T.ArrayType(_ROW)),
                ]
            ),
        )
    ]
)

_LONG_COLS = [
    "rank_num",
    "ranking",
    "increase_decrease",
    "code",
    "sales",
    "sales_delta",
    "total_sales",
    "audience_num",
    "audience_delta",
    "total_audience_num",
    "screen_num",
    "screen_show",
]
_DOUBLE_COLS = ["sales_ratio", "sales_delta_pct", "audience_delta_pct"]

# §1.2 canonical schema: LongType for counts/money (the Parquet-path BIGINT
# DDL, daily_parquet_pipeline.py:113-135; the CSV path's NUMERIC/INTEGER
# variant is the documented divergence), DoubleType for ratios, DateType for
# released_date / show_range.
BOX_OFFICE_SCHEMA = T.StructType(
    [
        T.StructField("show_range", T.DateType(), False),
        T.StructField("rank_num", T.LongType(), False),
        T.StructField("ranking", T.LongType(), False),
        T.StructField("increase_decrease", T.LongType()),
        T.StructField("new_entry", T.StringType()),
        T.StructField("code", T.LongType()),
        T.StructField("title", T.StringType(), False),
        T.StructField("released_date", T.DateType()),
        T.StructField("sales", T.LongType()),
        T.StructField("sales_ratio", T.DoubleType()),
        T.StructField("sales_delta", T.LongType()),
        T.StructField("sales_delta_pct", T.DoubleType()),
        T.StructField("total_sales", T.LongType()),
        T.StructField("audience_num", T.LongType()),
        T.StructField("audience_delta", T.LongType()),
        T.StructField("audience_delta_pct", T.DoubleType()),
        T.StructField("total_audience_num", T.LongType()),
        T.StructField("screen_num", T.LongType()),
        T.StructField("screen_show", T.LongType()),
        T.StructField("box_office_type", T.StringType()),
    ]
)


def ingest_box_office_json(
    spark: SparkSession, raw_json: str | list[str]
) -> DataFrame:
    """One KOFIC response document (or several) → typed long-format rows.

    P8 empty-result guard (daily_csv_pipeline.py:40-42): every document is
    validated *driver-side with plain json* before the plan is built — the
    docs are in driver memory anyway (10-row/day API), so this costs no
    Spark job, keeps the returned plan fully lazy (it previously ran an
    eager ``isEmpty()`` that re-executed the whole parse on write), and is
    per-document: a malformed or empty day in a multi-day batch raises
    naming that day instead of silently dropping out of the explode.
    """
    docs = [raw_json] if isinstance(raw_json, str) else list(raw_json)
    bad: list[str] = []
    for i, d in enumerate(docs):
        try:
            doc = json.loads(d)
        except (TypeError, ValueError):
            bad.append(f"doc[{i}]: malformed JSON")
            continue
        # Valid JSON that is not an object (list/string/number/null), or a
        # non-object boxOfficeResult, is just as malformed for this API.
        if not isinstance(doc, dict):
            bad.append(f"doc[{i}]: not a JSON object")
            continue
        body = doc.get("boxOfficeResult")
        if body is None:
            bad.append(f"doc[{i}]: missing boxOfficeResult")
            continue
        # isinstance BEFORE any falsy-coercion: `[] or {}` would turn a
        # list-typed boxOfficeResult into {} and misreport it as empty.
        if not isinstance(body, dict):
            bad.append(f"doc[{i}]: boxOfficeResult is not an object")
            continue
        # showRange is load-bearing downstream: it becomes the show_range
        # partition value and pipeline._day_of indexes it unconditionally
        # after the write. A doc without a parseable 8-digit day must be
        # rejected HERE, before anything is written, as a named validation
        # error — not as a bare KeyError between write and transform.
        day = str(body.get("showRange") or "").split("~")[0]
        if not (len(day) == 8 and day.isascii() and day.isdigit()):
            bad.append(
                f"doc[{i}]: missing or malformed showRange "
                f"(want 'yyyyMMdd~...', got {body.get('showRange')!r})"
            )
            continue
        rows_ = body.get("dailyBoxOfficeList")
        if not rows_:
            bad.append(f"{day}: empty dailyBoxOfficeList")
            continue
        # A truthy non-list (or list of non-objects) would pass a bare
        # truthiness check and then silently become NULL/zero rows in
        # from_json+explode — the exact silent drop this guard exists for.
        if not isinstance(rows_, list) or not all(
            isinstance(r, dict) for r in rows_
        ):
            bad.append(f"{day}: dailyBoxOfficeList is not a list of objects")
    if bad:
        raise ValueError(
            "aborting ingest (P8 guard) — " + "; ".join(bad)
        )
    # local_frame (round 17, guide §4): a handful of API documents as a
    # JVM LocalTableScan — the old createDataFrame(list) evaluated as 32
    # zero-input Python-worker tasks PER downstream evaluation (profiled:
    # 2 × ~8 task-s inside ingest_kofic_roundtrip for 3 rows of JSON).
    from data_pipeline_team5_spark.functions.localframe import local_frame

    raw = local_frame(spark, [(d,) for d in docs], "raw STRING")

    parsed = raw.select(
        F.from_json("raw", ENVELOPE_SCHEMA).alias("doc")
    ).select("doc.boxOfficeResult.*")

    rows = parsed.select(
        F.col("boxofficeType").alias("box_office_type"),
        # P3: '20250123~20250123' → '20250123' (substring_index ≡ split[0])
        F.substring_index("showRange", "~", 1).alias("show_range_raw"),
        F.explode("dailyBoxOfficeList").alias("r"),
    )

    renamed = rows.select(
        "box_office_type",
        "show_range_raw",
        *[F.col(f"r.{api}").alias(eng) for api, eng in RENAME_MAP.items()],
    )

    typed = renamed.select(
        F.to_date("show_range_raw", "yyyyMMdd").alias("show_range"),
        *[F.col(c).cast("long").alias(c) for c in _LONG_COLS[:3]],
        F.col("new_entry"),
        F.col("code").cast("long").alias("code"),
        F.col("title"),
        # openDt arrives as 'yyyy-MM-dd'; to_date's default pattern covers it
        # (the reference leans on pandas/Redshift 'auto' parsing — P4).
        F.to_date("released_date").alias("released_date"),
        *[F.col(c).cast("long").alias(c) for c in _LONG_COLS[4:]],
        *[F.col(c).cast("double").alias(c) for c in _DOUBLE_COLS],
        "box_office_type",
    ).select([f.name for f in BOX_OFFICE_SCHEMA.fields])

    return typed
