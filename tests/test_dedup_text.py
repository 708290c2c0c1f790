"""Dedup + text family invariants beyond the oracle gate:

- MinHash-LSH recall vs the exact-Jaccard pair set (the property that makes
  the sketch trustworthy as the 100 TB replacement for the exact join);
- SimHash places truly-near pairs within the Hamming threshold;
- exact dedup survivor determinism (min doc_id, idempotence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.dedup import (
    dedup_exact,
    doc_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    simhash_pairs,
    verify_jaccard,
)
from data_pipeline_team5_spark.plans.catalog import table
from tests.conftest import SF_MEDIUM


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_lsh_recall_vs_exact(spark):
    docs = table(spark, SF_MEDIUM, "documents")
    sh = doc_shingles(docs, "doc_id", "text").cache()
    exact = _pairs(jaccard_pairs(sh, 0.6))
    assert exact, "fixture should contain planted near-dup pairs"
    sig = minhash_signatures(sh, num_perm=32, seed=42)
    cand = lsh_candidate_pairs(sig, num_perm=32, bands=8, max_bucket=50)
    lsh = _pairs(verify_jaccard(cand, sh, 0.6))
    # Verification makes precision exact; recall must be total here (pairs
    # at Jaccard ≈ 0.99 collide in ≥1 of 8 bands with near-certainty).
    assert lsh == exact
    sh.unpersist()


def test_simhash_separates_near_from_far(spark):
    docs = table(spark, SF_MEDIUM, "documents")
    sh = doc_shingles(docs, "doc_id", "text").cache()
    near = _pairs(jaccard_pairs(sh, 0.6))
    sim_pairs = _pairs(simhash_pairs(simhash(sh), max_hamming=7))
    # every truly-near pair lands within the Hamming threshold...
    assert near <= sim_pairs
    # ...and the sketch is discriminative, not a pass-everything filter
    n_docs = docs.count()
    assert len(sim_pairs) < n_docs * (n_docs - 1) / 20
    sh.unpersist()


def test_dedup_exact_survivor_is_min_and_idempotent(spark):
    docs = table(spark, SF_MEDIUM, "documents")
    key = F.md5(F.substring(F.col("text"), 1, 40))
    keyed = docs.withColumn("_key", key)
    out = dedup_exact(keyed, ["_key"], "doc_id").cache()
    # survivor = min doc_id per key
    expect = keyed.groupBy("_key").agg(F.min("doc_id").alias("doc_id"))
    assert out.select("_key", "doc_id").exceptAll(expect).count() == 0
    assert out.count() == expect.count()
    # idempotent: dedup of the dedup'd table is a no-op
    assert dedup_exact(out, ["_key"], "doc_id").count() == out.count()
    out.unpersist()


def test_components_raise_on_non_convergence(spark):
    import pytest

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    # a 5-node chain has diameter 4 > max_iter=2
    verts = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iter=2)
    done = connected_components(verts, edges, max_iter=10)
    assert {r.component for r in done.collect()} == {0}


def test_lsh_rejects_indivisible_bands(spark):
    import pytest

    from data_pipeline_team5_spark.operators.dedup import lsh_candidate_pairs

    with pytest.raises(ValueError, match="divisible"):
        lsh_candidate_pairs(None, num_perm=32, bands=5)


def test_components_reject_nonpositive_max_iter(spark):
    import pytest

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    verts = spark.createDataFrame([(1,)], ["id"])
    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(verts, edges, max_iter=0)
