"""CCNet-style LM perplexity filter vs a from-scratch pure-Python mirror.

The catalog query is rows-only for the driver (log2() has no bitwise
cross-engine SQL form — the DSIR precedent), so parity is pinned here:
reference bucket counts must match a hashlib-md5 mirror INTEGER-EXACTLY,
and per-doc bits must equal the mirror's identical left-to-right fold
BIT-FOR-BIT (the log table is computed in Python on the driver and
embedded as literals, so Spark never runs its own log — both sides use
the same CPython libm and the same IEEE op sequence). The tertile cut
is checked for exact balance and the keep rule for head/middle.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.textops import tokens_expr
from data_pipeline_team5_spark.plans.catalog import QUERIES, table
from data_pipeline_team5_spark.plans.text_family import (
    PPLX_BUCKETS,
    PPLX_REF_MOD,
)
from tests.conftest import SF_SMALL


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % PPLX_BUCKETS


def _mirror(tok_rows):
    """(doc_id -> (n_bigrams, ppl_bits)) replicating the query's math
    from Spark's own tokens: +1-smoothed hashed-bigram model on the
    reference slice, left-to-right fold, -sum/n."""
    grams = {
        doc_id: [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]
        for doc_id, t in tok_rows
    }
    c = [0] * PPLX_BUCKETS
    for doc_id, gs in grams.items():
        if doc_id % PPLX_REF_MOD == 0:
            for g in gs:
                c[_bucket(g)] += 1
    tot = sum(c) + PPLX_BUCKETS
    logp = [math.log2((c[b] + 1) / tot) for b in range(PPLX_BUCKETS)]
    out = {}
    for doc_id, gs in grams.items():
        if doc_id % PPLX_REF_MOD == 0 or not gs:
            continue
        acc = 0.0
        for g in gs:  # same left-to-right fold as the Spark aggregate
            acc = acc + logp[_bucket(g)]
        out[doc_id] = (len(gs), (-acc) / float(len(gs)))
    return out


def test_lm_perplexity_matches_pure_python_mirror(spark):
    tok_rows = [
        (r["doc_id"], r["t"])
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens_expr("text").alias("t"))
        .collect()
    ]
    want = _mirror(tok_rows)
    got = {
        r["doc_id"]: r
        for r in QUERIES["lm_perplexity_filter"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(want) and got
    for doc_id, (n, bits) in want.items():
        r = got[doc_id]
        assert r["n_bigrams"] == n
        assert r["ppl_bits"] == bits, (doc_id, r["ppl_bits"], bits)


def test_lm_perplexity_tertiles_and_keep_rule(spark):
    rows = QUERIES["lm_perplexity_filter"].fn(spark, SF_SMALL).collect()
    n = len(rows)
    sizes = {t: sum(1 for r in rows if r["tertile"] == t) for t in (1, 2, 3)}
    # exact NTILE balance: bucket sizes differ by at most one
    assert max(sizes.values()) - min(sizes.values()) <= 1, sizes
    assert sum(sizes.values()) == n
    band = {1: "head", 2: "middle", 3: "tail"}
    for r in rows:
        assert r["band"] == band[r["tertile"]]
        assert r["keep"] == (r["tertile"] <= 2)
        assert r["doc_id"] % PPLX_REF_MOD != 0  # reference never scored
    # the split is by perplexity: every kept doc scores <= every dropped
    # doc under the (ppl_bits, doc_id) total order
    kept_max = max(
        (r["ppl_bits"], r["doc_id"]) for r in rows if r["keep"]
    )
    drop_min = min(
        (r["ppl_bits"], r["doc_id"]) for r in rows if not r["keep"]
    )
    assert kept_max < drop_min
