"""Production near-dup guard presets (VERDICT r2 #7).

The catalog's exact-oracle queries run `jaccard_pairs` unguarded (the oracle
requires no dropped shingles) and `minhash_lsh_neardup` runs with
`max_bucket=50`. Production runs set BOTH guards; these tests pin that at
fixture scale the guarded and unguarded pipelines agree exactly (no
stop-shingles / degenerate buckets exist at this SF, so the guards must be
no-ops), and that the guard code paths actually filter when forced.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.dedup import (
    MIN_STOP_SHINGLE_DF,
    PRODUCTION_MAX_BUCKET,
    doc_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    production_max_doc_freq,
)
from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.plans.dedup_family import JACCARD_T
from tests.conftest import SF_SMALL


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_production_max_doc_freq_floor_and_scale():
    assert production_max_doc_freq(100) == MIN_STOP_SHINGLE_DF
    assert production_max_doc_freq(10_000_000) == 100
    assert production_max_doc_freq(10**10) == 10**5


def test_guarded_jaccard_equals_unguarded_at_fixture_scale(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    guard = production_max_doc_freq(docs.count())
    guarded = jaccard_pairs(sh, JACCARD_T, max_doc_freq=guard)
    unguarded = jaccard_pairs(sh, JACCARD_T)
    assert _pairs(guarded) == _pairs(unguarded)
    # the fixture precondition that makes equality meaningful: the guard
    # threshold really is above every shingle's document frequency
    max_df = (
        sh.groupBy("s").agg(F.count("*").alias("df")).agg(F.max("df"))
    ).collect()[0][0]
    assert max_df <= guard


def test_max_doc_freq_guard_actually_filters_when_forced(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    # max_doc_freq=1 keeps only shingles unique to one doc — no shared
    # shingles survive, so no candidate pairs at all
    assert jaccard_pairs(sh, 0.0, max_doc_freq=1).count() == 0
    assert jaccard_pairs(sh, 0.0).count() > 0


def test_guarded_lsh_candidates_equal_unguarded_at_fixture_scale(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    sig = minhash_signatures(sh, num_perm=32, seed=42)
    guarded = lsh_candidate_pairs(
        sig, num_perm=32, bands=8, max_bucket=PRODUCTION_MAX_BUCKET
    )
    unguarded = lsh_candidate_pairs(sig, num_perm=32, bands=8)
    assert _pairs(guarded) == _pairs(unguarded)


def test_max_bucket_guard_actually_filters_when_forced(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    sig = minhash_signatures(sh, num_perm=32, seed=42)
    all_cand = lsh_candidate_pairs(sig, num_perm=32, bands=8)
    # max_bucket=1 forbids any doc from sharing a bucket — zero candidates
    assert (
        lsh_candidate_pairs(sig, num_perm=32, bands=8, max_bucket=1).count()
        == 0
    )
    assert all_cand.count() > 0
