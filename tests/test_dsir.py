"""DSIR importance weighting vs a from-scratch pure-Python mirror.

The catalog query is rows-only for the driver (ln() is not bitwise
across engines), so parity is pinned here instead: bucket counts and
smoothing totals must match the mirror INTEGER-EXACTLY (md5 hashing via
hashlib reproduces the Spark-SQL conv(substring(md5..)) bucket), and the
per-doc weights must match the mirror's identical left-to-right fold to
1e-9 relative. Tokens are taken from Spark's own tokenizer (itself
cross-checked bitwise by the text-family oracles) so the mirror
exercises the DSIR math — hashing, smoothing, λ, fold — independently.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.textops import tokens_expr
from data_pipeline_team5_spark.plans.catalog import QUERIES, table
from data_pipeline_team5_spark.plans.sampling_family import (
    DSIR_BUCKETS,
    DSIR_TARGET_MOD,
    DSIR_TARGET_TERM,
)
from tests.conftest import SF_SMALL


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS


def _mirror(tok_rows):
    ct = [0] * DSIR_BUCKETS
    cr = [0] * DSIR_BUCKETS
    for doc_id, text, toks in tok_rows:
        tgt = doc_id % DSIR_TARGET_MOD == 0 and DSIR_TARGET_TERM in text
        side = ct if tgt else cr
        for t in toks:
            side[_bucket(t)] += 1
    tot_t = sum(ct) + DSIR_BUCKETS
    tot_r = sum(cr) + DSIR_BUCKETS
    lam = [
        math.log((ct[b] + 1) / tot_t) - math.log((cr[b] + 1) / tot_r)
        for b in range(DSIR_BUCKETS)
    ]
    weights = {}
    for doc_id, text, toks in tok_rows:
        if doc_id % DSIR_TARGET_MOD == 0 and DSIR_TARGET_TERM in text:
            continue
        acc = 0.0
        for t in toks:  # same left-to-right fold as the Spark aggregate
            acc = acc + lam[_bucket(t)]
        weights[doc_id] = acc
    return weights


def test_dsir_weights_match_pure_python_mirror(spark):
    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", tokens_expr("text").alias("_t")
    )
    tok_rows = [
        (r["doc_id"], r["text"], list(r["_t"])) for r in docs.collect()
    ]
    expected = _mirror(tok_rows)

    out = {
        r["doc_id"]: (r["weight"], r["selected"], r["n_tokens"])
        for r in QUERIES["dsir_importance_weights"].fn(
            spark, SF_SMALL
        ).collect()
    }
    assert set(out) == set(expected)
    n_by_id = {d: len(t) for d, _, t in tok_rows}
    n_sel = 0
    for doc_id, exp_w in expected.items():
        w, sel, n_tok = out[doc_id]
        assert math.isclose(w, exp_w, rel_tol=1e-9, abs_tol=1e-12), (
            doc_id,
            w,
            exp_w,
        )
        assert sel == (w > 0.0)
        assert n_tok == n_by_id[doc_id]
        n_sel += int(sel)
    # the fixture must exercise BOTH branches of the selection rule, or
    # the sign convention could silently flip without failing
    assert 0 < n_sel < len(expected)


def test_dsir_spark_bucket_matches_hashlib(spark):
    """The Spark-SQL md5-bucket expression and the mirror's hashlib
    bucket must agree token-for-token (the exactness everything else
    rests on)."""
    from data_pipeline_team5_spark.plans.sampling_family import (
        _dsir_bucket_sql,
    )

    toks = ["the", "a", "zh", "", "Straße", "东京", "x" * 50, "42"]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    got = {
        r["tok"]: r["b"]
        for r in df.select(
            "tok", F.expr(_dsir_bucket_sql("tok")).alias("b")
        ).collect()
    }
    assert got == {t: _bucket(t) for t in toks}
