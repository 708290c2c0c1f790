"""Scale-path JSON ingest: PERMISSIVE read splits good rows from a
quarantine of corrupt lines in one pass — a bad record must not kill a
100 TB batch (the reference aborts the whole day instead)."""

from __future__ import annotations

from pyspark.sql import types as T

from data_pipeline_team5_spark.sources.readers import read_json_landed

SCHEMA = T.StructType(
    [
        T.StructField("code", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("sales", T.LongType()),
    ]
)

LINES = [
    '{"code": 1, "title": "good one", "sales": 100}',
    '{"code": 2, "title": "also good", "sales": 200}',
    '{"code": 3, "title": "broken", "sales": ',  # truncated JSON
    "not json at all",
]


def test_good_and_quarantine_split(spark, tmp_path):
    p = tmp_path / "landed.jsonl"
    p.write_text("\n".join(LINES))
    good, quarantine = read_json_landed(spark, str(p), SCHEMA)
    assert sorted(r.code for r in good.collect()) == [1, 2]
    assert good.columns == ["code", "title", "sales"]
    bad = [r["_corrupt_record"] for r in quarantine.collect()]
    assert len(bad) == 2
    # quarantine preserves the raw line for replay/debugging
    assert any("not json at all" in b for b in bad)


def test_clean_input_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text("\n".join(LINES[:2]))
    good, quarantine = read_json_landed(spark, str(p), SCHEMA)
    assert good.count() == 2
    assert quarantine.count() == 0


def test_blank_and_null_lines_are_quarantined(spark, tmp_path):
    p = tmp_path / "holes.jsonl"
    p.write_text(
        '{"code": 1, "title": "ok", "sales": 1}\n'
        "\n"
        "null\n"
        '{"code": 2, "title": "ok2", "sales": 2}'
    )
    good, quarantine = read_json_landed(spark, str(p), SCHEMA)
    assert sorted(r.code for r in good.collect()) == [1, 2]
    # neither the blank nor the `null` line may surface as an all-NULL row
    assert good.filter("code IS NULL").count() == 0
    assert quarantine.count() == 2
