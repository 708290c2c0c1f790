"""Sampling family (north star ⊕): reproducible corpus sampling and
train/val/test splitting over ``documents``.

The decisions derive from md5-of-key buckets (operators/sampling.py), not
Spark's partition-seeded RNG — so the oracle is bitwise and, more
importantly, so a rerun / repartition / engine switch never reassigns a
document. Both queries are shuffle-free map work until the tiny final
rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.sampling import (
    deterministic_sample,
    frac_to_buckets,
    hash_bucket_sql,
    pack_bins,
    split_assign,
)
from data_pipeline_team5_spark.plans.catalog import register, table

SAMPLE_FRAC = 0.10
VAL_FRAC = 0.05
TEST_FRAC = 0.05


@register(
    "sample_stratified_counts",
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM documents
        WHERE {hash_bucket_sql('doc_id')} < {frac_to_buckets(SAMPLE_FRAC)}
        GROUP BY lang
        ORDER BY lang
    """,
    doc="⊕ reproducible 10% corpus sample, summarized per language "
    "(count + id checksum proves the exact same documents were chosen). "
    "Hash-of-key sampling, not sample(): partition-seeded RNG reassigns "
    "rows whenever partitioning changes — the silent eval-set-drift bug "
    "of large corpora (operators/sampling.py:deterministic_sample).",
    tags=("sampling", "reproducible"),
)
def sample_stratified_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sampled = deterministic_sample(docs, "doc_id", SAMPLE_FRAC)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang")
    )


@register(
    "split_train_val_test",
    oracle=f"""
        SELECT CASE
                 WHEN {hash_bucket_sql('doc_id')} < {frac_to_buckets(VAL_FRAC)}
                   THEN 'val'
                 WHEN {hash_bucket_sql('doc_id')}
                      < {frac_to_buckets(VAL_FRAC) + frac_to_buckets(TEST_FRAC)}
                   THEN 'test'
                 ELSE 'train'
               END AS split,
               lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
    doc="⊕ train/val/test assignment (90% train / 5% val / 5% test) from the key hash, "
    "rolled up per (split, lang). Growing the corpus never moves an "
    "existing document between splits — its bucket depends only on its "
    "own key — which is what keeps a 100 TB corpus's eval sets stable "
    "across ingestion runs (operators/sampling.py:split_assign).",
    tags=("sampling", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    assigned = split_assign(
        docs, "doc_id", val_frac=VAL_FRAC, test_frac=TEST_FRAC
    )
    return (
        assigned.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


TOKEN_BUDGET = 2048


@register(
    "pack_training_sequences",
    oracle=f"""
        WITH sized AS (
            SELECT lang, doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tok
            FROM documents
        ),
        placed AS (
            SELECT lang, doc_id, n_tok,
                   CAST(COALESCE(SUM(n_tok) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // {TOKEN_BUDGET} AS BIGINT) AS bin_id
            FROM sized
        )
        SELECT lang, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
        FROM placed
        GROUP BY lang, bin_id
        ORDER BY lang, bin_id
    """,
    doc="⊕ sequence packing: documents concatenated into ~2048-token "
    "training bins per language — linear packing by running token count "
    "(a doc goes to the bin where its start offset falls), deterministic "
    "doc_id order so bins are reproducible run-over-run. The prefix sum is "
    "the TWO-LEVEL form (operators/sampling.py:pack_bins, VERDICT r2 #4): "
    "cumsum per (lang, doc_id-range shard) in parallel, then a tiny "
    "per-shard offset table broadcast back — no single task ever sorts a "
    "whole language, which is what survives an 80%-English 100 TB corpus "
    "where the naive per-lang window serializes most of the data through "
    "one reducer. Bit-identical to the single-window form (pinned in "
    "tests/test_properties.py).",
    headline=True,
    tags=("sampling", "packing"),
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok")
    sized = docs.select("lang", "doc_id", n_tok)
    placed = pack_bins(
        sized, order_key="doc_id", size_col="n_tok", budget=TOKEN_BUDGET
    )
    return (
        placed.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("lang", "bin_id")
    )
