"""Content-scrubbing family (north star ⊕): PII redaction and
line-level boilerplate removal over ``documents`` — the rewrite stages a
public web-scale curation recipe (CCNet, RefinedWeb, Dolma) runs before
dedup. The reference ships raw VARCHARs (SURVEY.md §1.2); operators live
in operators/scrub.py with their DuckDB mirrors.

The fixture corpus is digit-free word soup, so the PII query first
decorates each doc with synthetic PII as a deterministic function of
(doc_id, lang) — same technique as multimodal's attach_bmp_blob — with
the decoration mirrored bit-for-bit in the oracle. The line query needs
no decoration: the corpus's planted near-duplicate docs share aligned
8-token chunks naturally, so cross-document line frequency ≥ 2 exists in
the fixtures at every SF.

Since round 14 both stages are driver-graded through ``scrub_panel``
(every cell of both queries section-tagged in one in-window slot under
a composed oracle); the standalone forms are oracle-backed TAIL entries
keeping their headline timings, and the local mini-driver exact-checks
all three against DuckDB every CI run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import norm_text_sql
from data_pipeline_team5_spark.operators.scrub import (
    LINE_WIDTH,
    decorate_pii,
    decorate_pii_sql,
    lines_sql,
    pii_count_exprs,
    pii_count_sql,
    pii_residual_expr,
    pii_residual_sql,
    remove_boilerplate_lines,
    scrub_pii,
    scrub_pii_sql,
)
from data_pipeline_team5_spark.plans.catalog import register, table

# Lines repeated in ≥ this many distinct docs are boilerplate. 2 is the
# strictest cross-document setting (any sharing counts); production web
# corpora typically raise it to single digits.
MIN_DOCS = 2

_C = pii_count_sql("dtext")
_SCRUB = scrub_pii_sql("dtext")


@register(
    "pii_scrub",
    oracle=f"""
        WITH deco AS (
            SELECT doc_id,
                   {decorate_pii_sql('doc_id', 'lang', 'text')} AS dtext
            FROM documents
        )
        SELECT doc_id,
               CAST({_C['n_email']} AS INT) AS n_email,
               CAST({_C['n_card']} AS INT) AS n_card,
               CAST({_C['n_phone']} AS INT) AS n_phone,
               CAST({_C['n_ip']} AS INT) AS n_ip,
               CAST({_C['n_email']} + {_C['n_card']} + {_C['n_phone']}
                    + {_C['n_ip']} AS INT) AS pii_total,
               md5({_SCRUB}) AS clean_fp,
               CAST({pii_residual_sql(f'({_SCRUB})')} AS INT) AS residual
        FROM deco
        ORDER BY doc_id
    """,
    doc="⊕ PII redaction: per-type match counts (email / payment card / "
    "dashed phone / IPv4) and the md5 of the fully-redacted text, plus a "
    "machine-checked `residual` column proving no pattern survives "
    "redaction (0 for every row — asserted in tests/test_scrub.py). "
    "Patterns are Java-regex ∩ RE2 so Spark and DuckDB match "
    "identically; redaction is a chained regexp_replace projection. "
    "Plan shape: pure map work, zero shuffles — at 100 TB this runs "
    "inside the parquet scan stage under whole-stage codegen, like "
    "every textops signal. Fixture docs carry no PII, so the query "
    "decorates them deterministically first (see module doc).",
    tags=("scrub", "pii", "text"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    deco = docs.select(
        "doc_id",
        decorate_pii("doc_id", "lang", "text").alias("dtext"),
    )
    counts = pii_count_exprs("dtext")
    scrubbed = scrub_pii("dtext")
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return deco.select(
        "doc_id",
        counts["n_email"].alias("n_email"),
        counts["n_card"].alias("n_card"),
        counts["n_phone"].alias("n_phone"),
        counts["n_ip"].alias("n_ip"),
        total.alias("pii_total"),
        F.md5(scrubbed).alias("clean_fp"),
        pii_residual_expr(scrubbed).alias("residual"),
    ).orderBy("doc_id")


_LINES = lines_sql("nt", LINE_WIDTH)


@register(
    "line_boilerplate_scrub",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {norm_text_sql('text')} AS nt
            FROM documents
        ),
        lines AS (
            SELECT doc_id, u.i AS line_no, ls[u.i + 1] AS line
            FROM (SELECT doc_id, {_LINES} AS ls FROM toks),
                 UNNEST(range(0, len(ls))) AS u(i)
        ),
        boiler AS (
            SELECT line FROM (
                SELECT line, COUNT(DISTINCT doc_id) AS df
                FROM lines GROUP BY line
            ) WHERE df >= {MIN_DOCS}
        ),
        kept AS (
            SELECT doc_id, line_no, line FROM lines
            WHERE line NOT IN (SELECT line FROM boiler)
        ),
        reb AS (
            SELECT doc_id, COUNT(*) AS n_kept,
                   md5(array_to_string(list(line ORDER BY line_no),
                                       chr(10))) AS clean_fp
            FROM kept GROUP BY doc_id
        ),
        -- n_lines from the UNEXPLODED array (len(ls), including 0): the
        -- exploded `lines` CTE has no rows for a zero-line doc, which
        -- would drop it here while the Spark side keeps a
        -- (0, 0, 0, md5('')) row — ADVICE r7 #3
        tot AS (SELECT doc_id, len(ls) AS n_lines
                FROM (SELECT doc_id, {_LINES} AS ls FROM toks))
        SELECT tot.doc_id,
               CAST(n_lines AS INT) AS n_lines,
               CAST(COALESCE(n_kept, 0) AS INT) AS n_kept,
               CAST(n_lines - COALESCE(n_kept, 0) AS INT) AS n_dropped,
               COALESCE(clean_fp, md5('')) AS clean_fp
        FROM tot LEFT JOIN reb USING (doc_id)
        ORDER BY doc_id
    """,
    doc="⊕ CCNet/RefinedWeb-style line-level dedup: chunk each document "
    "into 8-token lines, count each line's DISTINCT-document frequency, "
    "drop every line shared by ≥ 2 docs, and rebuild each doc from its "
    "surviving lines in order (md5 of the newline-joined remainder). "
    "Returns per-doc (n_lines, n_kept, n_dropped, clean_fp); the "
    "fixtures' planted near-dup docs supply natural cross-document "
    "repeats at every SF. Plan shape: ONE line-key shuffle with map-side "
    "partial agg for the frequencies (within-doc repeats collapsed by a "
    "per-doc distinct first); the boilerplate set — bounded by repeated "
    "header/footer vocabulary, not corpus size — broadcasts into a "
    "left-anti join, so the corpus is never shuffled a second time; one "
    "doc_id agg rebuilds the text. That is the minimal shape for "
    "cross-document line frequency at 100 TB.",
    headline=True,
    tags=("scrub", "dedup", "text"),
)
def line_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return remove_boilerplate_lines(
        docs, text_col="text", min_docs=MIN_DOCS, width=LINE_WIDTH
    ).orderBy("doc_id")


_PII_METRICS = ("n_email", "n_card", "n_phone", "n_ip", "pii_total",
                "residual")
_LINE_METRICS = ("n_lines", "n_kept", "n_dropped")


def _metric_rows_sql(metrics: tuple[str, ...]) -> tuple[str, str]:
    """(VALUES rows, CASE arms) for unpivoting a metric set in the
    oracle — returned together so each set is built once."""
    vals = ", ".join(f"('{m}')" for m in metrics)
    case = " ".join(f"WHEN '{m}' THEN {m}" for m in metrics)
    return vals, case


_PII_VALS, _PII_CASE = _metric_rows_sql(_PII_METRICS)
_LINE_VALS, _LINE_CASE = _metric_rows_sql(_LINE_METRICS)


from data_pipeline_team5_spark.plans.catalog import QUERIES as _Q


@register(
    "scrub_panel",
    oracle=f"""
        WITH p AS (SELECT * FROM ({_Q["pii_scrub"].oracle})),
             l AS (SELECT * FROM ({_Q["line_boilerplate_scrub"].oracle}))
        SELECT * FROM (
            SELECT 'pii' AS section, doc_id, m.metric,
                   CAST(CASE m.metric {_PII_CASE}
                        END AS INT) AS value,
                   clean_fp
            FROM p CROSS JOIN (VALUES {_PII_VALS})
                 AS m(metric)
            UNION ALL
            SELECT 'lines' AS section, doc_id, m.metric,
                   CAST(CASE m.metric {_LINE_CASE}
                        END AS INT) AS value,
                   clean_fp
            FROM l CROSS JOIN (VALUES {_LINE_VALS})
                 AS m(metric)
        ) ORDER BY section, doc_id, metric
    """,
    doc="⊕ both scrub stages section-tagged in ONE driver slot (round "
    "14 — the decontamination_panel recipe's next use, freeing the "
    "graded slot that promotes behavior_panel): every cell of "
    "pii_scrub (per-type PII counts, redacted-text fingerprint, the "
    "residual=0 proof) and line_boilerplate_scrub (line counts and the "
    "rebuilt-text fingerprint) in long (section, doc_id, metric, "
    "value, clean_fp) layout, so the driver hash still certifies both "
    "queries bit-for-bit. The standalone forms keep their tail oracles "
    "and headline timings; this panel is deliberately NOT timed (it "
    "would re-measure their sum). Plan cost = the two stages' plans "
    "verbatim (both map-side scans; the line stage's one line-key "
    "shuffle), plus a union.",
    tags=("scrub", "panel", "text"),
)
def scrub_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    def long_form(df: DataFrame, section: str, metrics) -> DataFrame:
        stack = ", ".join(f"'{m}', CAST({m} AS INT)" for m in metrics)
        return df.selectExpr(
            f"'{section}' AS section",
            "doc_id",
            f"stack({len(metrics)}, {stack}) AS (metric, value)",
            "clean_fp",
        ).select("section", "doc_id", "metric",
                 F.col("value").cast("int").alias("value"), "clean_fp")

    pii = long_form(pii_scrub(spark, sf_dir), "pii", _PII_METRICS)
    lines = long_form(
        line_boilerplate_scrub(spark, sf_dir), "lines", _LINE_METRICS
    )
    return pii.unionByName(lines).orderBy("section", "doc_id", "metric")
