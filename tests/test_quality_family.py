"""Edge-case guards for the embedding-quality family (plans/quality_family).

ADVICE r8: ``decontaminate_embedding_overlap`` must agree with its oracle
on a corpus where the benchmark subset (vec_id % BENCH_MOD == 0) is
EMPTY — the SQL cross join yields zero rows there, so the Spark plan must
not emit sentinel best_b=-1 rows. And on a normal corpus the guard filter
must be a no-op (every row finds a nearest benchmark)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.plans.quality_family import (
    BENCH_MOD,
    decontaminate_embedding_overlap,
)
from tests.conftest import SF_SMALL


def test_decontaminate_embedding_empty_bench_yields_zero_rows(
    spark, tmp_path
):
    """Corpus shape with zero benchmark vectors: oracle's cross join is
    empty, so the Spark side must emit zero rows too — not one
    best_b=-1 / max_cos=-inf row per corpus vector."""
    emb = table(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id") % BENCH_MOD != 0
    )
    assert emb.count() > 0
    sf_dir = str(tmp_path / "nobench")
    emb.write.parquet(f"{sf_dir}/embeddings.parquet")
    assert decontaminate_embedding_overlap(spark, sf_dir).count() == 0


def test_decontaminate_embedding_guard_is_noop_with_bench(spark):
    """With a non-empty benchmark set every corpus vector resolves a
    nearest benchmark id (best_b >= 0), so the empty-bench guard must
    drop nothing: one output row per non-benchmark vector."""
    emb = table(spark, SF_SMALL, "embeddings")
    n_corpus = emb.filter(F.col("vec_id") % BENCH_MOD != 0).count()
    out = decontaminate_embedding_overlap(spark, SF_SMALL)
    assert out.count() == n_corpus
    assert out.filter(F.col("bench_id") < 0).count() == 0


def test_drift_report_identity_is_exactly_zero(spark):
    """drift_report(x, x): every bucket's shares are equal and every
    feature's total-variation distance is EXACTLY 0.0 — the all-integer
    numerator is identically zero, so no float epsilon is involved (the
    property the exact-arithmetic design buys)."""
    from data_pipeline_team5_spark.plans.versioning_family import (
        drift_report,
    )

    docs = table(spark, SF_SMALL, "documents").select("lang", "n_chars")
    rows = drift_report(docs, docs).collect()
    assert rows
    for r in rows:
        assert r["cnt_old"] == r["cnt_new"]
        assert r["share_old"] == r["share_new"]
        assert r["tv"] == 0.0
