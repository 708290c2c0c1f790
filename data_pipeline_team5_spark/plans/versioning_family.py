"""Corpus versioning (north star ⊕): snapshot diff between two corpus
versions — the observability step a maintained daily-loop corpus
(curate.py's fold loop) runs after every fold: how many docs were added,
removed, or rewritten, and which. The reference's analogue is its
per-day physical tables (SURVEY.md §1.1 — one snapshot per date, diffing
left to the reader); SCD2 (operators/scd2.py) tracks dimension history
row-by-row, this family reports the one-shot corpus-level delta.

The fixture ships a single corpus version, so — the decorate_pii /
attach_bmp_blob technique — version 2 is DERIVED deterministically from
version 1 inside the query, mirrored bit-for-bit in the oracle:
docs with ``doc_id % 11 = 0`` are dropped (removed), ``% 7 = 0`` (and
not dropped) get their text rewritten (changed), and a shifted copy of
every ``% 13 = 0`` doc arrives under a fresh id (added).

Scale notes (100 TB): the diff is ONE full-outer equi-join on doc_id
comparing md5 fingerprints — fingerprints are computed map-side in each
scan, so the join moves (id, 32-byte fp, lang) rows, never text. Two
corpus versions stored bucketed by doc_id (sources/writers.py:
write_bucketed) co-locate and the Exchange disappears entirely; without
bucketing it is a single sort-merge shuffle at fp-row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.textops import (
    fingerprint_md5,
    fingerprint_md5_sql,
)
from data_pipeline_team5_spark.plans.catalog import register, table

_V2_SQL = f"""
        v2 AS (
            SELECT doc_id, lang,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 11 <> 0
            UNION ALL
            SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
                   lang, text || ' fresh'
            FROM documents WHERE doc_id % 13 = 0
        )
"""


def _v2(docs: DataFrame) -> DataFrame:
    kept = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" rev2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # the id offset rides in as a broadcast 1-row aggregate (a
    # BroadcastNestedLoopJoin bounded at one row), keeping the plan fully
    # lazy — no driver-side collect
    off = docs.agg((F.max("doc_id") + 1).alias("_off"))
    fresh = (
        docs.filter(F.col("doc_id") % 13 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("_off")).alias("doc_id"),
            "lang",
            F.concat("text", F.lit(" fresh")).alias("text"),
        )
    )
    return kept.unionAll(fresh)


def snapshot_diff(a_docs: DataFrame, b_docs: DataFrame) -> DataFrame:
    """The diff core both the catalog query and production callers run:
    (doc_id, lang, text) × 2 versions → per-doc status row. Fingerprints
    are computed map-side in each scan (the join moves (id, 32-byte fp,
    lang) — never text); the comparison is ONE full-outer equi-join on
    doc_id. When both inputs are tables bucketed by doc_id with the same
    bucket count, the join plans with NO Exchange on either side —
    asserted in tests/test_bucketed_join.py
    (test_snapshot_diff_on_bucketed_versions_has_no_exchange), so the
    100 TB claim in the module doc is a contract, not prose."""
    a = a_docs.select(
        "doc_id", "lang", fingerprint_md5("text").alias("fp")
    ).alias("a")
    b = b_docs.select(
        "doc_id", "lang", fingerprint_md5("text").alias("fp")
    ).alias("b")
    return a.join(
        b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    ).select(
        F.coalesce("a.doc_id", "b.doc_id").alias("doc_id"),
        F.coalesce("a.lang", "b.lang").alias("lang"),
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.col("a.fp").alias("fp_old"),
        F.col("b.fp").alias("fp_new"),
    )


@register(
    "corpus_snapshot_diff",
    oracle=f"""
        WITH {_V2_SQL},
        a AS (SELECT doc_id, lang,
                     {fingerprint_md5_sql('text')} AS fp
              FROM documents),
        b AS (SELECT doc_id, lang,
                     {fingerprint_md5_sql('text')} AS fp
              FROM v2)
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               COALESCE(a.lang, b.lang) AS lang,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN a.fp <> b.fp THEN 'changed'
                    ELSE 'unchanged' END AS status,
               a.fp AS fp_old, b.fp AS fp_new
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        ORDER BY doc_id
    """,
    doc="⊕ corpus snapshot diff: per-doc added/removed/changed/unchanged "
    "status between two corpus versions via ONE full-outer join on "
    "doc_id comparing md5 content fingerprints (computed map-side; the "
    "join never moves text). Version 2 is derived deterministically from "
    "the fixture corpus (removals % 11, rewrites % 7, additions % 13) "
    "and mirrored in the oracle. At 100 TB: bucket both versions by "
    "doc_id and the Exchange disappears (plan-asserted in "
    "tests/test_bucketed_join.py over the same snapshot_diff core); "
    "otherwise one sort-merge shuffle at (id, fp) width — the minimal "
    "diff shape. The daily-loop fold (curate.py) runs exactly this "
    "after appending a batch to answer 'what did today change'.",
    tags=("versioning", "curation"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return snapshot_diff(docs, _v2(docs)).orderBy("doc_id")
