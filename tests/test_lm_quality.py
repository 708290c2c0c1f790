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


# ---------------------------------------------------------------------------
# Round 14: the supervised quality classifier (quality_classifier_filter)
# vs an INDEPENDENT hashlib + pure-Python mirror. The query's entire
# numeric surface — md5 featurization, deterministic token permutation,
# the full-batch logistic GD, and the map-side scoring fold — is
# re-implemented here from the documented spec and must agree
# bit-for-bit (fit and mirror both run CPython doubles; the Spark-side
# scoring fold is sums/divides only, IEEE-exact).


def _qb(g: str) -> int:
    from data_pipeline_team5_spark.plans.text_family import QCLS_BUCKETS

    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % QCLS_BUCKETS


def _perm(tokens):
    """The documented negative-class permutation: sort by
    (md5('token#pos'), token)."""
    keyed = sorted(
        (hashlib.md5(f"{t}#{i}".encode()).hexdigest(), t)
        for i, t in enumerate(tokens)
    )
    return [t for _, t in keyed]


def _grams(tokens):
    return [" ".join(tokens[i : i + 2]) for i in range(len(tokens) - 1)]


def _mirror_fit(tok_rows):
    """Independent reimplementation of the documented GD spec: capped
    training docs = first QCLS_TRAIN_CAP reference-slice doc_ids by
    (md5(str(doc_id)), doc_id); examples sorted by (doc_id, label),
    buckets ascending, x = count/n; stable sigmoid; full-batch updates
    w -= lr*gw/N."""
    from data_pipeline_team5_spark.plans.text_family import (
        PPLX_REF_MOD,
        QCLS_BUCKETS,
        QCLS_ITERS,
        QCLS_LR,
        QCLS_TRAIN_CAP,
    )

    ref = sorted(
        (hashlib.md5(str(d).encode()).hexdigest(), d)
        for d, _ in tok_rows
        if d % PPLX_REF_MOD == 0
    )
    cap_ids = {d for _, d in ref[:QCLS_TRAIN_CAP]}
    toks = dict(tok_rows)
    ex = {}
    for d in cap_ids:
        for label, tokens in ((1, toks[d]), (0, _perm(toks[d]))):
            counts = {}
            for g in _grams(tokens):
                b = _qb(g)
                counts[b] = counts.get(b, 0) + 1
            if counts:
                ex[(d, label)] = counts
    examples = []
    for key in sorted(ex):
        counts = ex[key]
        n = float(sum(counts.values()))
        examples.append(
            (key[1], [(b, counts[b] / n) for b in sorted(counts)])
        )
    w = [0.0] * QCLS_BUCKETS
    b = 0.0
    n_ex = float(len(examples))
    for _ in range(QCLS_ITERS):
        gw = [0.0] * QCLS_BUCKETS
        gb = 0.0
        for y, feats in examples:
            z = b
            for bk, x in feats:
                z = z + w[bk] * x
            if z >= 0:
                p = 1.0 / (1.0 + math.exp(-z))
            else:
                e = math.exp(z)
                p = e / (1.0 + e)
            err = p - float(y)
            for bk, x in feats:
                gw[bk] = gw[bk] + err * x
            gb = gb + err
        for j in range(QCLS_BUCKETS):
            w[j] = w[j] - QCLS_LR * gw[j] / n_ex
        b = b - QCLS_LR * gb / n_ex
    return w, b, examples


def test_quality_classifier_fit_matches_mirror_bitwise(spark):
    from data_pipeline_team5_spark.plans.text_family import _qcls_fit

    tok_rows = [
        (r["doc_id"], r["t"])
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens_expr("text").alias("t"))
        .collect()
    ]
    mw, mb, examples = _mirror_fit(tok_rows)
    qw, qb = _qcls_fit(spark, SF_SMALL)
    assert qb == mb
    assert qw == mw  # every one of the 512 doubles, bit-for-bit
    # the fit must actually separate the classes on its training set
    acc = sum(
        ((mb + sum(mw[bk] * x for bk, x in f)) > 0) == (y == 1)
        for y, f in examples
    ) / len(examples)
    assert acc >= 0.9, acc


def test_quality_classifier_scores_match_mirror_bitwise(spark):
    from data_pipeline_team5_spark.plans.text_family import PPLX_REF_MOD

    tok_rows = [
        (r["doc_id"], r["t"])
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens_expr("text").alias("t"))
        .collect()
    ]
    mw, mb, _ = _mirror_fit(tok_rows)
    got = {
        r["doc_id"]: r
        for r in QUERIES["quality_classifier_filter"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    want = {}
    for d, tokens in tok_rows:
        if d % PPLX_REF_MOD == 0:
            continue
        gs = _grams(tokens)
        if not gs:
            continue
        acc = 0.0
        for g in gs:  # same left-to-right fold as the Spark aggregate
            acc = acc + mw[_qb(g)]
        want[d] = (len(gs), acc / float(len(gs)) + mb)
    assert set(got) == set(want) and got
    for d, (n, logit) in want.items():
        r = got[d]
        assert r["n_bigrams"] == n
        assert r["logit"] == logit, (d, r["logit"], logit)
        assert r["keep"] == (logit > 0)


# ---------------------------------------------------------------------------
# Round 14: the per-language variant (lm_perplexity_by_lang) vs the
# same pure-Python mirror, grouped — one +1-smoothed model per lang fit
# on that lang's reference docs, per-doc bits under the doc's OWN
# language's table, and exact per-language tertile balance.


def _mirror_by_lang(tok_rows):
    """doc_id -> (lang, n_bigrams, ppl_bits) under per-lang models."""
    grams = {
        d: (lang, [" ".join(t[i : i + 2]) for i in range(len(t) - 1)])
        for d, lang, t in tok_rows
    }
    c: dict[str, list[int]] = {}
    for d, (lang, gs) in grams.items():
        if d % PPLX_REF_MOD == 0:
            tab = c.setdefault(lang, [0] * PPLX_BUCKETS)
            for g in gs:
                tab[_bucket(g)] += 1
    logp = {}
    for lang, tab in c.items():
        tot = sum(tab) + PPLX_BUCKETS
        logp[lang] = [
            math.log2((tab[b] + 1) / tot) for b in range(PPLX_BUCKETS)
        ]
    out = {}
    for d, (lang, gs) in grams.items():
        if d % PPLX_REF_MOD == 0 or not gs or lang not in logp:
            continue
        acc = 0.0
        for g in gs:
            acc = acc + logp[lang][_bucket(g)]
        out[d] = (lang, len(gs), (-acc) / float(len(gs)))
    return out


def test_lm_by_lang_matches_mirror_bitwise(spark):
    tok_rows = [
        (r["doc_id"], r["lang"], r["t"])
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", "lang", tokens_expr("text").alias("t"))
        .collect()
    ]
    want = _mirror_by_lang(tok_rows)
    got = {
        r["doc_id"]: r
        for r in QUERIES["lm_perplexity_by_lang"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(want) and got
    for d, (lang, n, bits) in want.items():
        r = got[d]
        assert (r["lang"], r["n_bigrams"]) == (lang, n)
        assert r["ppl_bits"] == bits, (d, r["ppl_bits"], bits)


def test_lm_by_lang_tertiles_per_language(spark):
    rows = QUERIES["lm_perplexity_by_lang"].fn(spark, SF_SMALL).collect()
    assert rows
    langs = {r["lang"] for r in rows}
    assert len(langs) > 1  # the grouped machinery is actually exercised
    band = {1: "head", 2: "middle", 3: "tail"}
    for lang in langs:
        sub = [r for r in rows if r["lang"] == lang]
        sizes = {
            t: sum(1 for r in sub if r["tertile"] == t) for t in (1, 2, 3)
        }
        # exact per-lang NTILE balance
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        # the split is by perplexity WITHIN the language
        kept_max = max(
            ((r["ppl_bits"], r["doc_id"]) for r in sub if r["keep"]),
            default=None,
        )
        drop_min = min(
            ((r["ppl_bits"], r["doc_id"]) for r in sub if not r["keep"]),
            default=None,
        )
        if kept_max is not None and drop_min is not None:
            assert kept_max < drop_min, lang
    for r in rows:
        assert r["band"] == band[r["tertile"]]
        assert r["keep"] == (r["tertile"] <= 2)
        assert r["doc_id"] % PPLX_REF_MOD != 0


def test_lm_by_lang_null_lang_and_empty_reference(spark):
    """Review r14 hardening: a NULL lang in the reference slice must not
    crash the driver-side fit (NULL-lang docs are unscoreable, like any
    lang without reference text), and an EMPTY reference slice must
    degenerate to an all-unscoreable result, not an analysis error."""
    from data_pipeline_team5_spark.plans.text_family import (
        PPLX_REF_MOD,
        _lm_lang_scored_frame,
    )

    base = "/root/testdata/sf0.001"
    # doctor the fixture in-memory: NULL the lang of one reference doc
    import tempfile

    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, base, "documents")
    with tempfile.TemporaryDirectory() as d:
        doctored = docs.withColumn(
            "lang",
            F.when(
                F.col("doc_id") == PPLX_REF_MOD, None  # a reference doc
            ).otherwise(F.col("lang")),
        )
        doctored.write.parquet(f"{d}/documents.parquet")
        rows = _lm_lang_scored_frame(spark, d).collect()
        assert rows  # fit survived the NULL-lang reference doc
        # empty reference slice: keep only doc_ids NOT divisible by the
        # reference mod
        docs.filter(
            F.col("doc_id") % PPLX_REF_MOD != 0
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = _lm_lang_scored_frame(spark, d).collect()
        assert rows and all(r["ppl_bits"] is None for r in rows)


def test_fit_quality_classifier_empty_reference_raises(spark):
    """ADVICE r14: an empty (or all-<2-token) reference must raise a
    named ValueError, not an opaque ZeroDivisionError deep in the GD
    loop."""
    import pytest as _pytest

    from data_pipeline_team5_spark.operators.quality import (
        fit_quality_classifier,
    )

    empty = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    with _pytest.raises(ValueError, match="no scoreable training docs"):
        fit_quality_classifier(empty)

    # every doc under 2 tokens → zero bigrams → same named error
    short = spark.createDataFrame(
        [(1, "one"), (2, "word")], "doc_id BIGINT, text STRING"
    )
    with _pytest.raises(ValueError, match="no scoreable training docs"):
        fit_quality_classifier(short)


# ---------------------------------------------------------------------------
# Round 15 (VERDICT r14 #3): the classifier's per-language form vs the
# same mirror recipe, grouped — one logistic model per lang (capped
# per-lang sample, same GD core), each doc scored under its OWN
# language's weights + bias.


def test_qcls_by_lang_fit_is_slice_global_fit_bitwise(spark):
    """Per-language fit must be BIT-FOR-BIT the global fit run on that
    language's reference slice alone — same cap keys, same canonical
    orders, same GD core — so per-language behavior needs no new math
    trust."""
    from data_pipeline_team5_spark.operators.quality import (
        fit_quality_classifier,
        fit_quality_classifier_by_lang,
    )

    docs = table(spark, SF_SMALL, "documents")
    ref = docs.filter(F.col("doc_id") % PPLX_REF_MOD == 0)
    models = fit_quality_classifier_by_lang(ref)
    assert len(models) >= 2  # fixture has several languages
    for lang in sorted(models):
        w, b = fit_quality_classifier(ref.filter(F.col("lang") == lang))
        assert models[lang] == (w, b), lang


def test_qcls_by_lang_scores_match_mirror_bitwise(spark):
    """Catalog-query logits vs the independent hashlib + pure-Python
    mirror: per-lang capped fit, per-doc fold under the doc's own
    model, keep = logit > 0 — every double bit-for-bit. Also pins the
    per-language training-accuracy floor."""
    tok_rows = [
        (r["doc_id"], r["lang"], r["t"])
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", "lang", tokens_expr("text").alias("t"))
        .collect()
    ]
    langs = sorted({lg for _, lg, _ in tok_rows if lg is not None})
    mirror = {}
    for lang in langs:
        sub = [(d, t) for d, lg, t in tok_rows if lg == lang]
        mw, mb, examples = _mirror_fit(sub)
        mirror[lang] = (mw, mb)
        acc = sum(
            ((mb + sum(mw[bk] * x for bk, x in f)) > 0) == (y == 1)
            for y, f in examples
        ) / len(examples)
        assert acc >= 0.9, (lang, acc)

    got = {
        r["doc_id"]: r
        for r in QUERIES["quality_classifier_by_lang"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    want = {}
    for d, lang, tokens in tok_rows:
        if d % PPLX_REF_MOD == 0 or lang not in mirror:
            continue
        gs = _grams(tokens)
        if not gs:
            continue
        mw, mb = mirror[lang]
        acc = 0.0
        for g in gs:  # the Spark aggregate's left-to-right fold
            acc = acc + mw[_qb(g)]
        want[d] = (lang, len(gs), acc / float(len(gs)) + mb)
    assert set(got) == set(want) and got
    for d, (lang, n, logit) in want.items():
        r = got[d]
        assert (r["lang"], r["n_bigrams"]) == (lang, n)
        assert r["logit"] == logit, (d, r["logit"], logit)
        assert r["keep"] == (logit > 0)


def test_qcls_by_lang_unmodeled_lang_scores_null(spark):
    """Docs whose language has no reference model score NULL (the
    CCNet unscoreable rule), and an empty model map degenerates to
    all-NULL, not an error."""
    from data_pipeline_team5_spark.operators.quality import (
        classifier_score_frame_by_lang,
        fit_quality_classifier_by_lang,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta gamma delta epsilon zeta"),
            (2, "xx", "unmodeled language text here today"),
            (3, None, "null language text here today okay"),
        ],
        "doc_id LONG, lang STRING, text STRING",
    )
    ref = spark.createDataFrame(
        [(10 + i, "en", f"clean english reference text number {i} ok")
         for i in range(4)],
        "doc_id LONG, lang STRING, text STRING",
    )
    models = fit_quality_classifier_by_lang(ref)
    assert sorted(models) == ["en"]
    got = {
        r["doc_id"]: r["logit"]
        for r in classifier_score_frame_by_lang(docs, models).collect()
    }
    assert got[1] is not None
    assert got[2] is None and got[3] is None
    empty = classifier_score_frame_by_lang(docs, {})
    assert all(r["logit"] is None for r in empty.collect())
