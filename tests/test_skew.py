"""Salting is semantics-preserving: salted plans equal their plain
counterparts on a deliberately skewed dataset (one key holds ~90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.skew import salted_distinct, salted_join


def _skewed(spark):
    # key 'hot' carries 900 rows over 300 distinct values; 10 cold keys.
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") % 300).alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_distinct_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"],): r["nd"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("nd")).collect()
    }
    salted = {
        (r["k"],): r["nd"]
        for r in salted_distinct(df, ["k"], "v", "nd", n=16).collect()
    }
    assert salted == plain and plain[("hot",)] == 300


def test_salted_join_equals_plain(spark):
    probe = _skewed(spark)
    build = spark.range(12).select(
        F.when(F.col("id") == 0, "hot")
        .otherwise(F.concat(F.lit("c"), F.col("id") % 10))
        .alias("k"),
        (F.col("id") * 100).alias("w"),
    )
    plain = sorted(map(tuple, probe.join(build, "k").collect()))
    salted = sorted(map(tuple, salted_join(probe, build, "k", n=8).collect()))
    assert salted == plain and len(plain) > 0


def test_salted_join_left_keeps_unmatched(spark):
    probe = _skewed(spark).filter(F.col("k") == "hot")
    build = spark.createDataFrame([("nomatch", 1)], ["k", "w"])
    out = salted_join(probe, build, "k", n=4, how="left")
    assert out.count() == probe.count()
    assert out.filter(F.col("w").isNotNull()).count() == 0


def test_salted_join_rejects_build_preserving_types(spark):
    import pytest

    probe = _skewed(spark)
    build = spark.createDataFrame([("hot", 1)], ["k", "w"])
    with pytest.raises(ValueError, match="duplicate unmatched build"):
        salted_join(probe, build, "k", how="full_outer")


def test_frac_to_buckets_rounds_not_truncates():
    from data_pipeline_team5_spark.operators.sampling import frac_to_buckets

    assert frac_to_buckets(0.043) == 430  # 0.043*10000 == 429.999...
    assert frac_to_buckets(0.10) == 1000
