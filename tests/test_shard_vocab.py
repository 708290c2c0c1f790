"""Round-9 shard manifest + vocab coverage: the properties the bitwise
oracle can't express — partition-independence of the deal, the physical
writer's determinism, and the coverage curve's shape invariants."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.sampling import shard_assign
from data_pipeline_team5_spark.plans.catalog import QUERIES, table
from data_pipeline_team5_spark.plans.sampling_family import N_SHARDS
from data_pipeline_team5_spark.plans.text_family import VOCAB_TOP_K
from data_pipeline_team5_spark.sources.writers import write_training_shards
from tests.conftest import SF_SMALL


def test_shard_assign_partition_independent(spark):
    """The deal must not change under repartitioning — the property
    ``df.sample``/``rand()`` lacks and the whole reason the shard derives
    from the row key."""
    docs = table(spark, SF_SMALL, "documents")
    base = shard_assign(docs, "doc_id", N_SHARDS).select(
        "doc_id", "shard_id", "sort_key"
    )
    redealt = shard_assign(
        docs.repartition(7, "lang"), "doc_id", N_SHARDS
    ).select("doc_id", "shard_id", "sort_key")
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, redealt.collect())
    )


def test_shard_manifest_covers_corpus_and_balances(spark):
    rows = QUERIES["shard_manifest"].fn(spark, SF_SMALL).collect()
    docs_total = table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in rows) == docs_total
    assert {r["shard_id"] for r in rows} <= set(range(N_SHARDS))
    # md5 deal ⇒ no shard should be grossly over/under-subscribed even at
    # 50 docs (expected ~3/shard): bound the spread loosely, not tightly.
    counts = [r["n_docs"] for r in rows]
    assert max(counts) <= 6 * max(1, min(counts))


def test_shard_independent_of_split_bucket(spark):
    """Regression for the bits-reuse trap: hash_bucket uses md5 hex 1-8 and
    16 | 10000, so a shard drawn from the same hex chars would be a pure
    function of the split bucket. Using hex 17-24 must break that
    determination — over the fixture, at least one pair of docs shares a
    bucket residue class mod 16 but lands in different shards."""
    from data_pipeline_team5_spark.operators.sampling import hash_bucket

    docs = table(spark, SF_SMALL, "documents")
    dealt = shard_assign(docs, "doc_id", N_SHARDS).select(
        (hash_bucket("doc_id") % N_SHARDS).alias("bucket_mod"),
        "shard_id",
    )
    pairs = dealt.distinct().groupBy("bucket_mod").count().collect()
    assert any(r["count"] > 1 for r in pairs)


def test_write_training_shards_deterministic(spark, tmp_path):
    docs = table(spark, SF_SMALL, "documents")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, p1, n_shards=4)
    write_training_shards(docs.repartition(13), p2, n_shards=4)

    def shard_contents(root: str) -> dict[int, list[tuple]]:
        df = spark.read.parquet(root)
        out: dict[int, list[tuple]] = {}
        for s in range(4):
            rows = (
                df.filter(F.col("shard_id") == s)
                .orderBy("sort_key")
                .select("doc_id", "sort_key")
                .collect()
            )
            out[s] = [tuple(r) for r in rows]
        return out

    c1, c2 = shard_contents(p1), shard_contents(p2)
    assert c1 == c2
    assert sum(len(v) for v in c1.values()) == docs.count()
    # each shard directory holds its rows pre-sorted by sort_key on disk
    # (one file per shard after the n_shards-way repartition)
    import glob

    files = glob.glob(f"{p1}/shard_id=*/*.parquet")
    assert files, "partitioned shard directories missing"
    for f in files:
        keys = pq.read_table(f, columns=["sort_key"])["sort_key"].to_pylist()
        assert keys == sorted(keys)


def test_vocab_coverage_curve_shape(spark):
    rows = QUERIES["vocab_coverage"].fn(spark, SF_SMALL).collect()
    assert [r["term_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= VOCAB_TOP_K
    counts = [r["term_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    cov = [r["cum_coverage"] for r in rows]
    assert all(0.0 < c <= 1.0 for c in cov)
    assert cov == sorted(cov)  # strictly accumulating
    # top-K of a zipf-ish fixture vocabulary must cover a meaningful share
    assert cov[-1] > 0.3


def test_vocab_coverage_takeordered_plan(spark):
    """The top-K must be TakeOrderedAndProject — a global Sort before the
    limit would materialize the full vocabulary order at 100 TB."""
    plan = (
        QUERIES["vocab_coverage"]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def _naive_inspection(spark, docs, k):
    from pyspark.sql import Window as W

    from data_pipeline_team5_spark.operators.sampling import inspect_key

    w = W.partitionBy("source").orderBy(inspect_key("doc_id"), "doc_id")
    return (
        docs.withColumn("pick_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("pick_rank") <= k)
        .select("source", "pick_rank", "doc_id")
    )


@pytest.mark.parametrize("safety", [1, 2, 50])
def test_inspection_two_phase_equals_naive(spark, safety):
    """The two-phase (prefilter + verify + fallback) draw must be
    EXACTLY the naive single-window draw at every safety factor — tiny
    safety forces the prefilter (and, on this fixture, the fallback)
    to actually execute."""
    from data_pipeline_team5_spark.operators.sampling import (
        inspection_sample,
    )

    docs = table(spark, SF_SMALL, "documents").select(
        "source", "doc_id", "lang", "n_chars"
    )
    k = 5
    got = sorted(
        map(
            tuple,
            inspection_sample(docs, "source", "doc_id", k, safety=safety)
            .select("source", "pick_rank", "doc_id")
            .collect(),
        )
    )
    want = sorted(map(tuple, _naive_inspection(spark, docs, k).collect()))
    assert got == want


def test_inspection_fallback_is_exercised_at_tiny_safety(spark):
    """Replicate the operator's threshold math and confirm that at
    safety=1 on this fixture at least one group under-fills — i.e. the
    equivalence test above genuinely covers the fallback branch, not just
    the happy prefilter path."""
    import math

    from data_pipeline_team5_spark.operators.sampling import inspect_key

    docs = table(spark, SF_SMALL, "documents").select("source", "doc_id")
    k, safety = 5, 1
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    min_n = min(counts.values())
    frac = min(1.0, (safety * k) / max(min_n, 1))
    assert frac < 1.0, "fixture too small to force the prefilter"
    t = min(int(math.ceil(frac * (1 << 32))), (1 << 32) - 1)
    under = (
        docs.withColumn("_ik", inspect_key("doc_id"))
        .filter(F.substring("_ik", 1, 8) < F.lit(format(t, "08x")))
        .groupBy("source")
        .agg(F.count("*").alias("got"))
        .collect()
    )
    got = {r["source"]: r["got"] for r in under}
    short = [
        s for s, n in counts.items() if got.get(s, 0) < min(k, n)
    ]
    assert short, (
        "no group under-filled at safety=1 — pick a smaller safety in "
        "test_inspection_two_phase_equals_naive to cover the fallback"
    )


def test_term_spectrum_partitions_vocabulary(spark):
    rows = QUERIES["term_spectrum"].fn(spark, SF_SMALL).collect()
    bins = [r["count_bin"] for r in rows]
    assert bins == sorted(bins)
    # bins partition the vocabulary: min/max counts nest inside [2^b, 2^(b+1))
    for r in rows:
        assert (1 << r["count_bin"]) <= r["min_count"] <= r["max_count"]
        assert r["max_count"] < (1 << (r["count_bin"] + 1))
    # token shares over ALL bins sum to 1 (exact integer ratios summed)
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-12
    # cross-check the Good-Turing numerator against an independent count:
    # bin 0 holds exactly the hapax terms
    from data_pipeline_team5_spark.operators.textops import tokens_expr

    hapax = (
        table(spark, SF_SMALL, "documents")
        .select(F.explode(tokens_expr("text")).alias("t"))
        .groupBy("t")
        .count()
        .filter(F.col("count") == 1)
        .count()
    )
    bin0 = [r for r in rows if r["count_bin"] == 0]
    got = bin0[0]["n_terms"] if bin0 else 0
    assert got == hapax


@pytest.mark.parametrize("safety", [1, 50])
def test_inspection_handles_null_groups(spark, safety):
    """NULL group values must survive both phases: isin() is three-valued
    and would silently drop the NULL partition from ranked AND fallback
    branches (and a None inside the membership list would poison every
    comparison)."""
    from data_pipeline_team5_spark.operators.sampling import (
        inspection_sample,
    )

    docs = table(spark, SF_SMALL, "documents").select(
        "source", "doc_id", "lang", "n_chars"
    )
    # a NULL-source slice big enough to be its own group
    nulled = docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
            F.col("source")
        ),
    )
    k = 5
    got = sorted(
        map(
            tuple,
            inspection_sample(nulled, "source", "doc_id", k, safety=safety)
            .select("source", "pick_rank", "doc_id")
            .collect(),
        ),
        key=lambda t: (t[0] is None, t),
    )
    want = sorted(
        map(tuple, _naive_inspection(spark, nulled, k).collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == want
    assert any(t[0] is None for t in got)  # the NULL group IS sampled


def test_batch_replay_drops_stale_shard_partitions(spark, tmp_path):
    """A replayed batch whose changed input no longer touches a shard must
    remove that shard's stale partition — dynamic overwrite alone keeps
    it live (ADVICE r9), so the writer deletes batch partitions first."""
    import glob as _glob

    root = str(tmp_path / "shards")
    docs = spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(40)], "doc_id STRING, text STRING"
    )
    write_training_shards(docs, root, n_shards=4, batch_id="day1")
    before = sorted(_glob.glob(f"{root}/shard_id=*/batch_id=day1"))
    assert len(before) == 4  # 40 docs deal into all 4 shards

    # replay with ONE doc: at most one shard populated — the other three
    # day1 partitions must be GONE, not stale
    one = docs.limit(1)
    write_training_shards(one, root, n_shards=4, batch_id="day1")
    after = sorted(_glob.glob(f"{root}/shard_id=*/batch_id=day1"))
    assert len(after) == 1
    got = spark.read.parquet(root).filter("batch_id = 'day1'")
    assert got.count() == 1


def test_batch_id_with_glob_metachars_cannot_delete_other_batches(
    spark, tmp_path
):
    """The replay delete-first step must treat batch_id as an exact path
    segment, never a Hadoop glob — a batch id containing '*' must not
    match (and delete) OTHER batches' shard partitions."""
    import glob as _glob

    root = str(tmp_path / "shards")
    docs = spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(20)],
        "doc_id STRING, text STRING",
    )
    write_training_shards(docs, root, n_shards=2, batch_id="day1")
    write_training_shards(docs, root, n_shards=2, batch_id="day2")
    assert _glob.glob(f"{root}/shard_id=*/batch_id=day1")
    assert _glob.glob(f"{root}/shard_id=*/batch_id=day2")

    write_training_shards(docs.limit(3), root, n_shards=2, batch_id="day*")
    # the metachar batch landed, and day1/day2 are untouched
    assert _glob.glob(f"{root}/shard_id=*/batch_id=day1")
    assert _glob.glob(f"{root}/shard_id=*/batch_id=day2")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="may not contain"):
        write_training_shards(docs, root, n_shards=2, batch_id="a/b")
