"""Semantic tests for operators/scrub.py: PII redaction actually removes
every planted pattern (and nothing else), and line-level boilerplate
removal drops exactly the cross-document lines while preserving each
survivor's order. Cross-engine bitwise parity of the two catalog queries
is covered by the mini-driver (tests/test_catalog_oracle.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.scrub import (
    decorate_pii,
    pii_count_exprs,
    pii_residual_expr,
    remove_boilerplate_lines,
    scrub_pii,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_scrub_redacts_known_text_exactly(spark):
    df = spark.createDataFrame(
        [
            (
                "write to bob.smith+x@mail.example.com or call "
                "010-1234-5678 from 192.168.0.1 card 4111-1111-1111-0042 ok"
            ),
            ("no pii here at all"),
        ],
        "string",
    ).toDF("text")
    out = df.select(
        scrub_pii("text").alias("clean"),
        pii_residual_expr(scrub_pii("text")).alias("residual"),
    ).collect()
    assert out[0].clean == (
        "write to <EMAIL> or call <PHONE> from <IP> card <CARD> ok"
    )
    assert out[1].clean == "no pii here at all"
    assert all(r.residual == 0 for r in out)


def test_pii_counts_follow_injection_rule(spark):
    """The decorated fixture corpus must count exactly what decorate_pii
    planted: emails on doc_id%3 (0→1, 1→2, 2→0), phones on doc_id%4<2,
    IPs on %5==0, cards on %7==0 — i.e. the patterns neither miss a
    planted instance nor double-match across types."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    deco = docs.select(
        "doc_id", decorate_pii("doc_id", "lang", "text").alias("t")
    )
    c = pii_count_exprs("t")
    rows = deco.select(
        "doc_id", c["n_email"].alias("e"), c["n_card"].alias("c"),
        c["n_phone"].alias("p"), c["n_ip"].alias("i"),
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.e == {0: 1, 1: 2, 2: 0}[r.doc_id % 3], r
        assert r.p == (1 if r.doc_id % 4 < 2 else 0), r
        assert r.i == (1 if r.doc_id % 5 == 0 else 0), r
        assert r.c == (1 if r.doc_id % 7 == 0 else 0), r


def test_remove_boilerplate_lines_handcrafted(spark):
    # width=2 lines; "shared line" appears in all three docs (one of them
    # twice) → boilerplate at min_docs=2; everything else is unique.
    docs = spark.createDataFrame(
        [
            (1, "shared line alpha beta"),
            (2, "gamma delta shared line epsilon zeta"),
            (3, "shared line shared line"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            docs, min_docs=2, width=2
        ).collect()
    }
    assert (out[1].n_lines, out[1].n_kept, out[1].n_dropped) == (2, 1, 1)
    assert out[1].clean_fp == _md5("alpha beta")
    assert (out[2].n_lines, out[2].n_kept, out[2].n_dropped) == (3, 2, 1)
    assert out[2].clean_fp == _md5("gamma delta\nepsilon zeta")
    # every line of doc 3 was boilerplate — the doc keeps a row
    assert (out[3].n_lines, out[3].n_kept, out[3].n_dropped) == (2, 0, 2)
    assert out[3].clean_fp == _md5("")


def test_remove_boilerplate_keeps_survivor_order(spark):
    # within-doc repeats alone (df counts DISTINCT docs) are NOT
    # boilerplate; survivors rebuild in original line order.
    docs = spark.createDataFrame(
        [
            (1, "a b c d a b e f"),
            (2, "x y z w"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            docs, min_docs=2, width=2
        ).collect()
    }
    assert out[1].n_dropped == 0
    assert out[1].clean_fp == _md5("a b\nc d\na b\ne f")
    assert out[2].clean_fp == _md5("x y\nz w")


def test_curation_scrub_pii_noop_on_clean_corpus(spark):
    """The fixture corpus carries no PII, so scrub_pii=True must be a
    bitwise no-op through the whole curation preset — proving the flag
    changes nothing except the PII spans it redacts."""
    from data_pipeline_team5_spark.pipeline import curate_training_data
    from data_pipeline_team5_spark.plans.catalog import table
    from tests.conftest import SF_SMALL

    docs = table(spark, SF_SMALL, "documents")
    a = sorted(map(tuple, curate_training_data(docs).collect()))
    b = sorted(
        map(tuple, curate_training_data(docs, scrub_pii=True).collect())
    )
    assert a == b


def test_curation_filter_stage_scrubs_before_signals(spark):
    """With PII planted, the filter stage's output text must carry zero
    residual matches and n_chars must describe the SCRUBBED text — i.e.
    every downstream signal (quality, keys, budgets) sees redacted text."""
    from data_pipeline_team5_spark.pipeline import _curation_filter_stage
    from data_pipeline_team5_spark.plans.catalog import table
    from tests.conftest import SF_SMALL

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id",
        "lang",
        "source",
        decorate_pii("doc_id", "lang", "text").alias("text"),
    )
    docs = docs.withColumn("n_chars", F.length("text"))
    out = _curation_filter_stage(docs, scrub_pii=True)
    bad = out.filter(
        (pii_residual_expr("text") > 0)
        | (F.col("n_chars") != F.length("text"))
    ).count()
    assert bad == 0
    assert out.count() > 0
    # and the scrub actually fired: redaction placeholders present
    assert out.filter(F.col("text").contains("<EMAIL>")).count() > 0


def test_line_boilerplate_plan_broadcasts_removal_join(spark):
    """Structural pin of the scale claim in remove_boilerplate_lines's
    docstring: the boilerplate set must reach the removal join as a
    BROADCAST left-anti join — a refactor that drops the hint would
    silently re-shuffle the whole exploded corpus a second time and every
    row-level test would stay green."""
    from data_pipeline_team5_spark.plans.catalog import QUERIES
    from tests.conftest import SF_SMALL

    df = QUERIES["line_boilerplate_scrub"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_scrub_is_idempotent(spark):
    """scrub(scrub(x)) == scrub(x): placeholders contain no digits or
    '@', so a second pass can never re-trigger a pattern — the property
    that makes re-running a scrub job over partially-scrubbed data safe."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    deco = docs.select(
        decorate_pii("doc_id", "lang", "text").alias("t")
    )
    n_diff = deco.select(
        scrub_pii("t").alias("once"),
        scrub_pii(scrub_pii("t")).alias("twice"),
    ).filter(F.col("once") != F.col("twice")).count()
    assert n_diff == 0


def test_line_boilerplate_oracle_keeps_zero_line_docs(spark, tmp_path):
    """Cross-engine parity on the corner the fixtures never hit
    (ADVICE r7 #3): a doc whose normalized text is EMPTY has zero lines;
    the Spark side emits (n_lines=0, n_kept=0, n_dropped=0, md5('')) and
    the DuckDB oracle must keep the same row instead of dropping the doc
    in its UNNEST. Runs the REGISTERED catalog query + oracle on a
    purpose-built fixture containing empty and punctuation-only docs."""
    import duckdb
    import pandas as pd

    from data_pipeline_team5_spark.plans.catalog import QUERIES

    rows = [
        (1, "shared line alpha beta etc etc etc etc pad pad pad "
            "pad pad pad pad pad one", "en", "s", 0),
        (2, "shared line alpha beta etc etc etc etc pad pad pad "
            "pad pad pad pad pad two", "en", "s", 0),
        (3, "", "en", "s", 0),            # empty text → zero lines
        (4, "?!, .;:", "en", "s", 0),     # normalizes to empty
        (5, "solo words only here never repeated anywhere at all",
            "en", "s", 0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    q = QUERIES["line_boilerplate_scrub"]
    got = q.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.execute(q.oracle).df()
    assert list(got.columns) == list(exp.columns)
    assert set(exp.doc_id) == {1, 2, 3, 4, 5}, (
        "oracle dropped zero-line docs"
    )
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.astype(got.dtypes.to_dict()), check_dtype=True
    )
    empty = got[got.doc_id == 3].iloc[0]
    assert (empty.n_lines, empty.n_kept, empty.n_dropped) == (0, 0, 0)
    assert empty.clean_fp == _md5("")
