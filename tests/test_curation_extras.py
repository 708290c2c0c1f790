"""Round-7 curation additions: repetition metrics (max_run_freq fold),
benchmark decontamination, and domain-mixture sampling.

The catalog oracle test already pins all three against DuckDB bitwise;
these tests pin the SEMANTICS the oracle comparison can't express — the
fold's equivalence to an independent counting algorithm on adversarial
inputs, exclusion/bound invariants of the decontamination output, and the
waterline property of the mixture sampler.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.textops import (
    max_run_freq,
    ngrams_expr,
)
from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_SMALL

# Small alphabet forces collisions; '' is a legal normalized token (empty
# text -> ['']) and must not confuse the fold's initial prev='' state.
_tok = st.sampled_from(["", "a", "b", "ab", "the", "的"])
_arrays = st.lists(st.lists(_tok, max_size=12), min_size=1, max_size=8)


@given(arrays=_arrays)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_max_run_freq_matches_counter(spark, arrays):
    """Fold-over-sorted-array == Counter most_common — the independent
    algorithm check, including empty arrays (0) and ''-only arrays."""
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i int, arr array<string>"
    )
    got = {
        r["i"]: r["mx"]
        for r in df.select("i", max_run_freq(F.col("arr")).alias("mx")).collect()
    }
    for i, a in enumerate(arrays):
        want = max(Counter(a).values()) if a else 0
        assert got[i] == want, (i, a, got[i], want)


def test_ngrams_expr_short_docs_empty(spark):
    """Docs shorter than n contribute NO n-grams (no whole-text fallback —
    that would score 1-token docs top_bigram_frac = 1.0)."""
    df = spark.createDataFrame(
        [(["a"],), (["a", "b"],), (["a", "b", "a", "b"],)],
        "arr array<string>",
    )
    rows = df.select(ngrams_expr(F.col("arr"), 2).alias("g")).collect()
    assert rows[0]["g"] == []
    assert rows[1]["g"] == ["a b"]
    assert rows[2]["g"] == ["a b", "b a", "a b"]  # non-distinct


def test_decontaminate_invariants(spark):
    from data_pipeline_team5_spark.plans.text_family import DECON_BENCH_MOD

    out = QUERIES["decontaminate_ngram_overlap"].fn(spark, SF_SMALL).collect()
    assert out, "fixture has injected near-dups; expected contaminated docs"
    for r in out:
        # Benchmark members are never reported against themselves.
        assert r["doc_id"] % DECON_BENCH_MOD != 0
        assert 1 <= r["n_overlap"] <= r["n_grams"]
        assert 0.0 < r["overlap_frac"] <= 1.0


def test_domain_mixture_waterline(spark):
    from data_pipeline_team5_spark.plans.sampling_family import TARGET_MIX

    rows = {
        r["lang"]: r
        for r in QUERIES["domain_mixture_sample"].fn(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(TARGET_MIX)
    # Exactly the bottleneck language keeps everything; every keep_rate is
    # a valid probability and the bottleneck determines the waterline.
    bottleneck = min(rows, key=lambda l: rows[l]["n_avail"] / TARGET_MIX[l])
    assert rows[bottleneck]["keep_rate"] == 1.0
    assert rows[bottleneck]["n_kept"] == rows[bottleneck]["n_avail"]
    total = sum(r["n_kept"] for r in rows.values())
    for lang, r in rows.items():
        assert 0.0 < r["keep_rate"] <= 1.0
        assert r["n_kept"] <= r["n_avail"]
        # Achieved share tracks the target (md5-bucket sampling noise at
        # n~500 docs: allow 3 percentage points).
        assert abs(r["n_kept"] / total - TARGET_MIX[lang]) < 0.03, lang


def test_domain_mixture_membership_stable(spark):
    """Two runs draw the exact same documents (md5 buckets, not RNG)."""
    q = QUERIES["domain_mixture_sample"].fn
    a = {r["lang"]: r["kept_id_checksum"] for r in q(spark, SF_SMALL).collect()}
    b = {r["lang"]: r["kept_id_checksum"] for r in q(spark, SF_SMALL).collect()}
    assert a == b
