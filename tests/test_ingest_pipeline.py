"""Golden ingest + pipeline tests (FIXTURES.md §5): KOFIC-shaped JSON →
typed long table → showrange/pivot transforms, hand-checked expectations."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_team5_spark.pipeline import (
    last_n_days,
    transform_daily,
    transform_pivot,
)
from data_pipeline_team5_spark.sources.ingest import (
    BOX_OFFICE_SCHEMA,
    ingest_box_office_json,
)
from data_pipeline_team5_spark.sources.writers import write_parquet_partitioned


def _movie(rnum, code, title, sales, audi, scrn, new="OLD"):
    return {
        "rnum": str(rnum),
        "rank": str(rnum),
        "rankInten": "0",
        "rankOldAndNew": new,
        "movieCd": str(code),
        "movieNm": title,
        "openDt": "2025-01-01",
        "salesAmt": str(sales),
        "salesShare": "12.5",
        "salesInten": "100",
        "salesChange": "1.5",
        "salesAcc": str(sales * 10),
        "audiCnt": str(audi),
        "audiInten": "5",
        "audiChange": "0.5",
        "audiAcc": str(audi * 10),
        "scrnCnt": str(scrn),
        "showCnt": str(scrn * 4),
    }


def _doc(day: str, movies) -> str:
    return json.dumps(
        {
            "boxOfficeResult": {
                "boxofficeType": "일별 박스오피스",
                "showRange": f"{day}~{day}",
                "dailyBoxOfficeList": movies,
            }
        }
    )


DOC_D1 = _doc(
    "20250122",
    [
        _movie(1, 101, "Movie, With Comma", 1000, 90, 5, new="NEW"),
        _movie(2, 102, "Second", 800, 70, 4, new="NEW"),
    ],
)
DOC_D2 = _doc(
    "20250123",
    [
        _movie(1, 102, "Second", 900, 80, 4),
        _movie(2, 103, "Third", 500, 40, 3, new="NEW"),
    ],
)


def test_ingest_schema_and_values(spark):
    df = ingest_box_office_json(spark, DOC_D1)
    # names+types must match §1.2 exactly (nullability is enforced by the
    # data-quality checks, not the plan schema — from_json output is nullable)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in BOX_OFFICE_SCHEMA.fields
    ]
    rows = {r["code"]: r for r in df.collect()}
    assert set(rows) == {101, 102}
    r = rows[101]
    assert r["show_range"] == datetime.date(2025, 1, 22)  # P3 split + P4 cast
    assert r["title"] == "Movie, With Comma"  # comma-safe (ref CSV bug fixed)
    assert r["released_date"] == datetime.date(2025, 1, 1)
    assert r["sales"] == 1000 and r["total_sales"] == 10000
    assert r["sales_ratio"] == 12.5 and r["new_entry"] == "NEW"
    assert r["box_office_type"] == "일별 박스오피스"


def test_ingest_empty_guard(spark):
    with pytest.raises(ValueError, match="empty dailyBoxOfficeList"):
        ingest_box_office_json(spark, _doc("20250122", []))


def test_idempotent_partition_overwrite(spark, tmp_path):
    path = str(tmp_path / "warehouse")
    df = ingest_box_office_json(spark, [DOC_D1, DOC_D2])
    write_parquet_partitioned(df, path)
    # Re-running one day must NOT duplicate it (the reference's blind-COPY
    # retry bug) and must not clobber the other day.
    d1_again = ingest_box_office_json(spark, DOC_D1)
    write_parquet_partitioned(d1_again, path)
    out = spark.read.parquet(path)
    assert out.count() == 4
    assert out.groupBy("show_range").count().filter("count != 2").count() == 0


def test_transform_daily_sums(spark):
    df = ingest_box_office_json(spark, [DOC_D1, DOC_D2])
    res = transform_daily(df, ["2025-01-22", "2025-01-23"]).collect()
    by_day = {r["show_range"].isoformat(): r for r in res}
    assert by_day["2025-01-22"]["total_sales_sum"] == 1800.0
    assert by_day["2025-01-23"]["total_audience_sum"] == 120.0
    assert by_day["2025-01-22"]["screen_show_sum"] == 36.0


def test_transform_pivot_null_cells_and_max(spark):
    df = ingest_box_office_json(spark, [DOC_D1, DOC_D2])
    res = transform_pivot(df, ["2025-01-22", "2025-01-23"])
    rows = {r["code"]: r for r in res.collect()}
    assert set(rows) == {101, 102, 103}
    # movie 101 absent on day 2 → NULL cell (full-outer alignment, J1)
    assert rows[101]["20250123_sales"] is None
    assert rows[101]["20250122_sales"] == 1000.0
    # movie 102 present both days
    assert rows[102]["20250122_sales"] == 800.0
    assert rows[102]["20250123_sales"] == 900.0
    # global sort O1: title,code ascending
    titles = [r["title"] for r in res.collect()]
    assert titles == sorted(titles)


def test_last_n_days():
    assert last_n_days(datetime.date(2025, 1, 23), 3) == [
        "2025-01-21",
        "2025-01-22",
        "2025-01-23",
    ]


def test_daily_pipeline_end_to_end(spark, tmp_path):
    """X1-X5 composed: ingest → write → quality gate → both transforms."""
    from data_pipeline_team5_spark.pipeline import daily_pipeline

    out = daily_pipeline(
        spark, [DOC_D1, DOC_D2], str(tmp_path / "wh")
    )
    daily = {r.show_range: r.total_sales_sum for r in out["daily"].collect()}
    assert daily[datetime.date(2025, 1, 22)] == 1800.0
    assert daily[datetime.date(2025, 1, 23)] == 1400.0
    pivot = out["pivot"].collect()
    assert len(pivot) == 3  # movies 101, 102, 103 full-outer aligned
    by_code = {r.code: r for r in pivot}
    assert by_code[101]["20250123_sales"] is None  # absent day → NULL cell
    assert by_code[102]["20250122_sales"] == 800
    assert by_code[102]["20250123_sales"] == 900


def test_daily_pipeline_quality_gate_fires(spark, tmp_path):
    """A duplicate (code, show_range) must abort before transforms."""
    from data_pipeline_team5_spark.pipeline import daily_pipeline

    dup = _doc(
        "20250122",
        [
            _movie(1, 101, "A", 100, 1, 1),
            _movie(2, 101, "A again", 200, 2, 2),
        ],
    )
    with pytest.raises(ValueError, match="data-quality gate"):
        daily_pipeline(spark, dup, str(tmp_path / "wh2"))


def test_to_json_roundtrip_stability(spark):
    """F8: to_json(from_json(x)) re-serializes the envelope losslessly for
    the fields the schema names (the XCom transport the engine eliminates
    but still supports)."""
    from data_pipeline_team5_spark.sources.ingest import ENVELOPE_SCHEMA

    df = spark.createDataFrame([(DOC_D1,)], ["raw"])
    parsed = df.select(F.from_json("raw", ENVELOPE_SCHEMA).alias("doc"))
    back = parsed.select(F.to_json("doc").alias("j"))
    reparsed = back.select(F.from_json("j", ENVELOPE_SCHEMA).alias("doc2"))
    assert (
        parsed.select("doc").collect()[0][0]
        == reparsed.select("doc2").collect()[0][0]
    )


def test_cli_main_runs_pipeline(spark, tmp_path, capsys):
    import json

    from data_pipeline_team5_spark.pipeline import main

    p1 = tmp_path / "d1.json"
    p2 = tmp_path / "d2.json"
    p1.write_text(DOC_D1)
    p2.write_text(DOC_D2)
    wh = str(tmp_path / "wh")
    rc = main(["--input", str(p1), str(p2), "--warehouse", wh])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"
    assert out["rows"]["daily"] == 2  # two ingested days
    assert out["rows"]["pivot"] == 3  # three distinct movies


def test_ingest_guard_rejects_non_object_json(spark):
    import pytest

    from data_pipeline_team5_spark.sources.ingest import (
        ingest_box_office_json,
    )

    for bad in ("[]", '"x"', "3", "null", '{"boxOfficeResult": []}'):
        with pytest.raises(ValueError, match="P8 guard"):
            ingest_box_office_json(spark, bad)


def test_ingest_guard_names_non_object_box_office_result(spark):
    import pytest

    from data_pipeline_team5_spark.sources.ingest import (
        ingest_box_office_json,
    )

    with pytest.raises(ValueError, match="not an object"):
        ingest_box_office_json(spark, '{"boxOfficeResult": [1]}')
    with pytest.raises(ValueError, match="not an object"):
        ingest_box_office_json(spark, '{"boxOfficeResult": []}')
    with pytest.raises(ValueError, match="missing boxOfficeResult"):
        ingest_box_office_json(spark, '{"other": 1}')


def test_ingest_guard_rejects_bad_show_range(spark):
    """A doc without a parseable yyyyMMdd showRange must die in the P8
    guard (named error, pre-write) — pipeline._day_of indexes showRange
    unconditionally after the write, so the guard owns this invariant."""
    import json as _json

    movies = [_movie(1, 101, "A", 100, 1, 1)]

    def doc_with(show_range) -> str:
        body = {"boxofficeType": "일별", "dailyBoxOfficeList": movies}
        if show_range is not None:
            body["showRange"] = show_range
        return _json.dumps({"boxOfficeResult": body})

    for bad in (None, "", "2025012~20250123", "2025-01-23", "²0250123"):
        with pytest.raises(ValueError, match="showRange"):
            ingest_box_office_json(spark, doc_with(bad))
    # the happy path still passes
    ingest_box_office_json(spark, doc_with("20250123~20250123"))
