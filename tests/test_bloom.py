"""Bloom prefilter contract (operators/bloom.py, round 11): no false
negatives ever, false-positive rate near the design fpp, parameter math,
the literal-embedding cap, and end-to-end parity of the prefiltered
decontamination query against its exact sibling (the driver oracle is
shared, but this pins the two SPARK plans against each other directly)."""

from __future__ import annotations

import math

import pytest

from data_pipeline_team5_spark.operators.bloom import (
    MAX_LITERAL_WORDS,
    bloom_might_contain,
    bloom_parameters,
    build_bloom_words,
)
from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_MEDIUM, SF_SMALL


def test_bloom_parameters_math():
    m, k = bloom_parameters(1000, fpp=0.01)
    # textbook optimum ≈ 9.585 bits/key → next pow2 of 9585 = 16384
    assert m == 16384 and m & (m - 1) == 0
    # k = smallest count meeting the target at the realized m (k=3:
    # (1-e^(-3000/16384))^3 ≈ 0.0047 ≤ 0.01; k=2 gives 0.013 > 0.01),
    # NOT the m/n optimum (11) — apply cost is k hashes per corpus row
    assert k == 3
    assert (1.0 - math.exp(-k * 1000 / m)) ** k <= 0.01
    assert (1.0 - math.exp(-(k - 1) * 1000 / m)) ** (k - 1) > 0.01
    # degenerate inputs stay valid
    assert bloom_parameters(0) == (64, 1)
    m1, k1 = bloom_parameters(1, fpp=0.01)
    assert m1 >= 64 and k1 >= 1


def test_bloom_no_false_negatives_and_fpp(spark):
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(2000)], "s STRING"
    )
    m, k = bloom_parameters(2000, fpp=0.01)
    words = build_bloom_words(keys, "s", m, k)
    member = keys.filter(bloom_might_contain(words, m, k, "s")).count()
    assert member == 2000  # every inserted key passes — by construction
    probes = spark.createDataFrame(
        [(f"other-{i}",) for i in range(20000)], "s STRING"
    )
    fp = probes.filter(bloom_might_contain(words, m, k, "s")).count()
    # design fpp is 1% (m rounds UP so realized rate is ≤ design);
    # 5x headroom keeps the assertion non-flaky at 20k probes
    assert fp / 20000 < 0.05, fp


def test_bloom_literal_cap_raises():
    with pytest.raises(ValueError, match="literal cap"):
        bloom_might_contain(
            [0] * (MAX_LITERAL_WORDS + 1),
            (MAX_LITERAL_WORDS + 1) * 64,
            3,
            "s",
        )


def test_bloom_decontamination_matches_exact_plan(spark):
    got = (
        QUERIES["decontaminate_bloom_prefilter"].fn(spark, SF_SMALL)
        .collect()
    )
    want = (
        QUERIES["decontaminate_ngram_overlap"].fn(spark, SF_SMALL)
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_bloom_literal_constant_folds(spark):
    """The word array must reach the optimized plan as a folded literal
    (UnsafeArrayData), not a per-row CreateArray — the prefilter's
    map-side cost claim rests on this (SCALING.md round-11)."""
    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(500)], "s STRING"
    )
    m, k = bloom_parameters(500)
    words = build_bloom_words(keys, "s", m, k)
    out = keys.filter(bloom_might_contain(words, m, k, "s"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "array(" not in plan, "word array not constant-folded"


def test_bloom_broadcast_path_bitwise_vs_literal_and_exact(
    spark, monkeypatch
):
    """Past-the-cap strategy (round 13, VERDICT r12 #1): with the
    literal cap forced below the realized filter size, bloom_prefilter
    must route to the broadcast-variable + Arrow-batch apply and return
    EXACTLY the literal path's rows — and composing it with the exact
    join must equal the plain exact join (no false negatives)."""
    from pyspark.sql import functions as F

    from data_pipeline_team5_spark.operators import bloom

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(1500)], "s STRING"
    )
    m, k = bloom.bloom_parameters(1500, fpp=0.01)
    words = bloom.build_bloom_words(keys, "s", m, k)
    assert len(words) > 8  # the forced cap below must actually trip
    probes = spark.createDataFrame(
        [(f"key-{i}",) for i in range(0, 3000, 2)]
        + [(f"other-{i}",) for i in range(5000)],
        "s STRING",
    )
    literal = sorted(
        r["s"]
        for r in probes.filter(
            bloom.bloom_might_contain(words, m, k, "s")
        ).collect()
    )
    monkeypatch.setattr(bloom, "MAX_LITERAL_WORDS", 8)
    routed = bloom.bloom_prefilter(probes, "s", words, m, k)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan  # Arrow batch, not a literal
    assert "BatchEvalPython" not in plan
    got = sorted(r["s"] for r in routed.collect())
    assert got == literal
    # composition restores exact semantics: prefilter + exact join ==
    # exact join (false positives only ADD candidates, never members)
    exact = sorted(
        r["s"] for r in probes.join(F.broadcast(keys), "s").collect()
    )
    via_bloom = sorted(
        r["s"]
        for r in routed.join(F.broadcast(keys), "s").collect()
    )
    assert via_bloom == exact


def test_bloom_mmap_transport_bitwise(spark, monkeypatch):
    """The past-the-cap apply's SECOND routing layer (round 13): past
    MMAP_MIN_WORDS the words ship via addFile + np.memmap (one
    page-cache copy per node) instead of a per-worker-unpickled
    broadcast variable. Forced low, the mmap transport must return
    exactly the literal path's rows."""
    from data_pipeline_team5_spark.operators import bloom

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(1200)], "s STRING"
    )
    m, k = bloom.bloom_parameters(1200, fpp=0.01)
    words = bloom.build_bloom_words(keys, "s", m, k)
    probes = spark.createDataFrame(
        [(f"key-{i}",) for i in range(0, 2400, 2)]
        + [(f"zzz-{i}",) for i in range(4000)],
        "s STRING",
    )
    literal = sorted(
        r["s"]
        for r in probes.filter(
            bloom.bloom_might_contain(words, m, k, "s")
        ).collect()
    )
    monkeypatch.setattr(bloom, "MAX_LITERAL_WORDS", 0)
    monkeypatch.setattr(bloom, "MMAP_MIN_WORDS", 0)
    got = sorted(
        r["s"]
        for r in bloom.bloom_prefilter(probes, "s", words, m, k).collect()
    )
    assert got == literal and len(got) > 0


def test_bloom_catalog_query_routes_on_cap(spark, monkeypatch):
    """decontaminate_bloom_prefilter must select the broadcast strategy
    automatically (no raise) when the reference filter exceeds the
    literal cap, and stay bitwise-identical to the exact sibling."""
    from data_pipeline_team5_spark.operators import bloom

    monkeypatch.setattr(bloom, "MAX_LITERAL_WORDS", 4)
    got = (
        QUERIES["decontaminate_bloom_prefilter"].fn(spark, SF_SMALL)
        .collect()
    )
    want = (
        QUERIES["decontaminate_ngram_overlap"].fn(spark, SF_SMALL)
        .collect()
    )
    assert got == want and len(got) > 0


def test_bloom_backtick_column_name(spark):
    """Column names splice backtick-escaped (ADVICE r11): a name
    containing a literal backtick must build and probe correctly on
    both apply strategies."""
    from data_pipeline_team5_spark.operators import bloom

    keys = spark.createDataFrame(
        [(f"k-{i}",) for i in range(300)], "id STRING"
    ).withColumnRenamed("id", "we`ird")
    m, k = bloom.bloom_parameters(300, fpp=0.01)
    words = bloom.build_bloom_words(keys, "we`ird", m, k)
    kept = keys.filter(
        bloom.bloom_might_contain(words, m, k, "we`ird")
    ).count()
    assert kept == 300
    kept_bc = bloom._broadcast_bloom_keep(
        keys, "we`ird", words, m, k
    ).count()
    assert kept_bc == 300


def test_bloom_prefilter_selectivity(spark):
    """The corpus-side sliver claim, empirically: grams surviving the
    prefilter ≈ true overlaps + fpp of the rest — the fraction that
    would reach a shuffle in the too-big-to-broadcast regime."""
    from pyspark.sql import functions as F

    from data_pipeline_team5_spark.operators.dedup import doc_shingles
    from data_pipeline_team5_spark.plans.catalog import table
    from data_pipeline_team5_spark.plans.text_family import (
        DECON_BENCH_MOD,
        DECON_N,
    )

    docs = table(spark, SF_MEDIUM, "documents")
    sh = doc_shingles(docs, "doc_id", "text", n=DECON_N)
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    bench = sh.filter(is_bench).select("s").distinct().localCheckpoint()
    n_keys = bench.count()
    m, k = bloom_parameters(n_keys, fpp=0.01)
    words = build_bloom_words(bench, "s", m, k)
    train = sh.filter(~is_bench)
    total = train.count()
    survivors = train.filter(
        bloom_might_contain(words, m, k, "s")
    ).count()
    true_hits = train.join(F.broadcast(bench), "s").count()
    # survivors = true hits + false positives; FP rate over the
    # non-overlapping remainder must sit near the 1% design point
    fp_rate = (survivors - true_hits) / max(1, total - true_hits)
    assert true_hits <= survivors
    assert fp_rate < 0.05, (survivors, true_hits, total, fp_rate)


def test_shipped_words_failed_write_cleans_tmp(spark):
    """ADVICE r13: a tofile failure (disk full) must unlink its partial
    tmp file before re-raising — not orphan a filter-sized file beside
    which a retry writes another — and the retry with the SAME content
    must then succeed through the normal path."""
    import os

    import numpy as np

    from data_pipeline_team5_spark.operators import bloom

    class _Boom(np.ndarray):
        def tofile(self, *a, **k):
            raise OSError("disk full (simulated)")

    arr = (np.arange(997, dtype=np.int64) * 7919).view(np.uint64)
    sc = spark.sparkContext
    with pytest.raises(OSError, match="disk full"):
        bloom._shipped_words_file(sc, arr.view(_Boom))
    d = bloom._SHIPPED_DIR[0]
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
    fname = bloom._shipped_words_file(sc, arr)  # retry: clean path
    assert os.path.getsize(os.path.join(d, fname)) == arr.nbytes


def test_shipped_words_accounting_and_ceiling(spark, monkeypatch, caplog):
    """ADVICE r13: every ship adds its bytes to the per-app cumulative
    counter (repeats of the same content are free — content-addressed),
    and crossing SHIPPED_BYTES_WARN logs a warning naming the remedy."""
    import logging

    import numpy as np

    from data_pipeline_team5_spark.operators import bloom

    sc = spark.sparkContext
    arr = (np.arange(1009, dtype=np.int64) * 104729).view(np.uint64)
    before = bloom._SHIPPED_BYTES.get(sc.applicationId, 0)
    monkeypatch.setattr(bloom, "SHIPPED_BYTES_WARN", 0)
    with caplog.at_level(
        logging.WARNING, logger="data_pipeline_team5_spark.operators.bloom"
    ):
        f1 = bloom._shipped_words_file(sc, arr)
        f2 = bloom._shipped_words_file(sc, arr)  # cache hit: no growth
    assert f1 == f2
    after = bloom._SHIPPED_BYTES[sc.applicationId]
    assert after == before + arr.nbytes
    assert any("SHIPPED_BYTES_WARN" in r.message for r in caplog.records)
