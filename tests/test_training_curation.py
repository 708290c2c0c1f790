"""pipeline.curate_training_data — the composed end-to-end curation run.

Each stage is oracle/guard-tested on its own; these tests pin the
COMPOSITION: survivors really satisfy every filter, no exact or near dup
pair survives, splits/bins behave, and the whole plan is deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import norm_text
from data_pipeline_team5_spark.operators.dedup import (
    doc_shingles,
    jaccard_pairs,
)
from data_pipeline_team5_spark.operators.textops import (
    quality_exprs,
    tokens_expr,
)
from data_pipeline_team5_spark.pipeline import curate_training_data
from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.plans.text_family import (
    _KEEP_LANGS,
    _LEN_HI,
    _LEN_LO,
    _MIN_QUALITY,
)
from tests.conftest import SF_SMALL

THRESH = 0.6


def _run(spark):
    docs = table(spark, SF_SMALL, "documents")
    return docs, curate_training_data(docs, neardup_threshold=THRESH)


def test_survivors_satisfy_every_filter_stage(spark):
    docs, out = _run(spark)
    assert out.count() > 0
    joined = out.select("doc_id").join(docs, "doc_id")
    q = quality_exprs(tokens_expr("text"))
    violations = joined.filter(
        ~F.col("lang").isin(*_KEEP_LANGS)
        | (q["quality"] < _MIN_QUALITY)
        | ~F.col("n_chars").between(_LEN_LO, _LEN_HI)
    )
    assert violations.count() == 0


def test_no_exact_or_near_dup_pair_survives(spark):
    docs, out = _run(spark)
    surv = out.select("doc_id").join(docs, "doc_id")
    # exact: the dedup key is unique among survivors
    key = F.md5(F.substring(norm_text("text"), 1, 40))
    n = surv.count()
    assert surv.select(key.alias("k")).distinct().count() == n
    # near: no surviving pair reaches the threshold (guards are no-ops at
    # fixture SF, so the unguarded exact pair set is the ground truth)
    residual = jaccard_pairs(
        doc_shingles(surv, "doc_id", "text"), THRESH
    )
    assert residual.count() == 0


def test_packing_and_splits_are_consistent_and_deterministic(spark):
    docs, out = _run(spark)
    rows = out.collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # bins are contiguous from 0 within each (split, lang)
    from collections import defaultdict

    bins = defaultdict(set)
    for r in rows:
        bins[(r.split, r.lang)].add(r.bin_id)
    for got in bins.values():
        assert got == set(range(max(got) + 1))
    # n_tok matches the documents' whitespace token count (conservation)
    truth = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    assert all(truth[r.doc_id] == r.n_tok for r in rows)
    # determinism: a second independent run builds the identical assignment
    again = sorted(tuple(r) for r in _run(spark)[1].collect())
    assert again == sorted(tuple(r) for r in rows)


def test_lsh_method_agrees_with_jaccard_method(spark):
    """At fixture SF the guarded LSH path finds the same near-dup pairs as
    the exact inverted-index path (recall==1.0 there, pinned separately),
    so the two curation variants must produce identical assignments."""
    docs = table(spark, SF_SMALL, "documents")
    a = sorted(
        tuple(r)
        for r in curate_training_data(
            docs, neardup_threshold=THRESH, neardup_method="jaccard"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in curate_training_data(
            docs, neardup_threshold=THRESH, neardup_method="lsh"
        ).collect()
    )
    assert a == b
