"""Text-analysis family (north star ⊕, SURVEY.md §7 M6): language ID,
quality scoring, token statistics, fingerprints over ``documents``.

The reference has no text operators (its documents are opaque VARCHARs,
SURVEY.md §1.2); this family supplies what an LLM training-data pipeline
needs at 100 TB. Every query is shuffle-free row-parallel map work except
the corpus rollup (one hash agg on a low-cardinality key), the round-7
decontamination query (whose corpus side is STILL map-side — the only
broadcast is the tiny benchmark gram set, and only per-doc overlap counts
reach an exchange), and the round-7 tf-idf/LM scorer (the one query whose
semantics genuinely need corpus-global statistics, so it pays one
(doc,term) shuffle and one vocab-sized rollup — see its doc for why the
term join still broadcasts) — the cheapest possible shapes at scale. All
are fully SQL-expressible, so each gets a bitwise DuckDB oracle (the
Spark expressions and SQL fragments are built from the same constants in
operators/textops.py).

Catalog shape (round-4 consolidation, VERDICT r2 #1): the five per-doc
signal queries (quality, lang-ID, sentiment, fingerprints, token budgets)
are ONE registration, ``text_doc_profile`` — same doc_id grain, one scan —
so the whole family fits the driver's 50-row correctness window. The
rollup (corpus stats — which since round 5 also carries the per-group
length-quantile cutoffs) and the curation funnel keep their own
registrations (different grains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import norm_text_sql
from data_pipeline_team5_spark.operators.textops import (
    bpe_count_sql,
    sentiment_exprs,
    sentiment_sql,
    bpe_token_count,
    fingerprint_md5,
    fingerprint_md5_sql,
    lang_id_expr,
    lang_id_sql,
    max_run_freq,
    ngrams_expr,
    ngrams_sql,
    quality_exprs,
    quality_sql,
    rolling_hash,
    rolling_hash_sql,
    shingles_sql,
    tokens_expr,
)
from data_pipeline_team5_spark.plans.catalog import register, table

# Shared oracle CTE: documents with their normalized-token arrays.
_TOKS = f"""
WITH toks AS (
    SELECT doc_id, lang, source, n_chars, text,
           string_split({norm_text_sql('text')}, ' ') AS t
    FROM documents
)
"""

_Q = quality_sql("t")
_S = sentiment_sql("t")


@register(
    "text_doc_profile",
    oracle=f"""
        {_TOKS},
        g AS (SELECT doc_id, {ngrams_sql('t', 2)} AS g2,
                     {ngrams_sql('t', 3)} AS g3
              FROM toks),
        top1 AS (SELECT doc_id, MAX(c) AS m1 FROM (
                     SELECT doc_id, u.s, COUNT(*) AS c
                     FROM toks, UNNEST(t) AS u(s) GROUP BY doc_id, u.s)
                 GROUP BY doc_id),
        top2 AS (SELECT doc_id, MAX(c) AS m2 FROM (
                     SELECT doc_id, u.s, COUNT(*) AS c
                     FROM g, UNNEST(g2) AS u(s) GROUP BY doc_id, u.s)
                 GROUP BY doc_id)
        SELECT doc_id,
               CAST({_Q['n_tokens']} AS INT) AS n_tokens,
               {_Q['uniq_ratio']} AS uniq_ratio,
               {_Q['stop_ratio']} AS stop_ratio,
               {_Q['quality']} AS quality,
               lang AS decl_lang, {lang_id_sql('t')} AS pred_lang,
               CAST({_S['n_pos']} AS INT) AS n_pos,
               CAST({_S['n_neg']} AS INT) AS n_neg,
               {_S['polarity']} AS polarity,
               {fingerprint_md5_sql('text')} AS fp_md5,
               {rolling_hash_sql('t')} AS fp_roll,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)
                   AS n_ws,
               CAST({bpe_count_sql('text')} AS INT) AS n_bpe,
               CAST(m1 AS DOUBLE) / CAST(len(t) AS DOUBLE) AS top_tok_frac,
               CAST(m2 AS DOUBLE) / CAST(NULLIF(len(g2), 0) AS DOUBLE)
                   AS top_bigram_frac,
               1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                     / CAST(NULLIF(len(g3), 0) AS DOUBLE)
                   AS dup_trigram_frac
        FROM toks
        JOIN g USING (doc_id)
        JOIN top1 USING (doc_id)
        LEFT JOIN top2 USING (doc_id)
        ORDER BY doc_id
    """,
    doc="⊕ the per-document text profile, ONE scan (round-4 consolidation "
    "of text_quality + text_lang_id + text_sentiment + text_fingerprint + "
    "text_bpe_token_counts, VERDICT r2 #1): quality scoring (token count, "
    "uniqueness/stopword ratios, linear score), marker-stopword language "
    "ID vs the declared lang, lexicon sentiment counts and polarity, md5 + "
    "order-sensitive rolling-hash fingerprints, and whitespace-vs-BPE "
    "token budgets, and (round 7) Gopher-style repetition signals — "
    "top-unigram/top-bigram frequency fractions and the duplicate-trigram "
    "fraction, the standard repetitive-boilerplate filters for training "
    "data. The repetition maxima come from a per-row array_sort + aggregate "
    "fold (operators/textops.py:max_run_freq), NOT the textbook explode → "
    "groupBy(doc, gram) → max whose two shuffles move one row per gram "
    "INSTANCE — i.e. the whole corpus, several times over, at 100 TB; the "
    "DuckDB oracle deliberately uses that explode/group form, so the "
    "bitwise match also cross-checks the fold against an independent "
    "algorithm. This is also the shape a real curation pipeline runs: "
    "every per-doc signal in a single shuffle-free codegen'd pass over the "
    "corpus — eight separate scans of 100 TB collapse into one. All "
    "expressions are shared constants with the DuckDB oracle "
    "(operators/textops.py).",
    headline=True,
    tags=(
        "text",
        "quality",
        "langid",
        "sentiment",
        "fingerprint",
        "tokens",
    ),
)
def text_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.skew import spread_small_scan

    # spread_small_scan (round 17, guide §2.5): the profile is pure
    # regex/HOF map work per doc, and a one-split corpus ran ALL of it in
    # one 2.4 s serial task at sf0.1; no-op once the scan is wide.
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    # Tokens / gram arrays projected once — inlining the normalize+split
    # chain at every use site multiplies codegen compile time (see
    # operators/dedup.py).
    base = docs.select(
        "doc_id", "lang", "text", tokens_expr("text").alias("_t")
    )
    toked = base.select(
        "*",
        ngrams_expr("_t", 2).alias("_g2"),
        ngrams_expr("_t", 3).alias("_g3"),
    )
    q = quality_exprs(F.col("_t"))
    s = sentiment_exprs(F.col("_t"))
    n_ws = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("int")
    n_g2 = F.size(F.col("_g2"))
    n_g3 = F.size(F.col("_g3"))
    top_tok = (
        max_run_freq(F.col("_t")).cast("double")
        / F.size(F.col("_t")).cast("double")
    )
    top_bigram = F.when(
        n_g2 > 0,
        max_run_freq(F.col("_g2")).cast("double") / n_g2.cast("double"),
    )
    dup_trigram = F.when(
        n_g3 > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(F.col("_g3"))).cast("double")
        / n_g3.cast("double"),
    )
    return toked.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["uniq_ratio"].alias("uniq_ratio"),
        q["stop_ratio"].alias("stop_ratio"),
        q["quality"].alias("quality"),
        F.col("lang").alias("decl_lang"),
        lang_id_expr(F.col("_t")).alias("pred_lang"),
        s["n_pos"].cast("int").alias("n_pos"),
        s["n_neg"].cast("int").alias("n_neg"),
        s["polarity"].alias("polarity"),
        fingerprint_md5("text").alias("fp_md5"),
        rolling_hash(F.col("_t")).alias("fp_roll"),
        n_ws.alias("n_ws"),
        bpe_token_count("text").cast("int").alias("n_bpe"),
        top_tok.alias("top_tok_frac"),
        top_bigram.alias("top_bigram_frac"),
        dup_trigram.alias("dup_trigram_frac"),
    )
    # No final global sort: the output is doc-grain (proportional to the
    # corpus), the driver's compare is order-insensitive, and the sort's
    # range Exchange DOUBLED the query at 10×-sf0.1 (20.5 s → 9.8 s
    # measured) — at 100 TB it would be the dominant cost of an otherwise
    # shuffle-free map pass.


_QUANTILES = ((0.25, "p25_chars"), (0.50, "p50_chars"), (0.75, "p75_chars"), (0.95, "p95_chars"))


@register(
    "text_corpus_stats",
    oracle=f"""
        {_TOKS}
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(CAST(len(t) AS BIGINT)) AS BIGINT) AS sum_tokens,
               CAST(SUM(CAST(len(t) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               {", ".join(
                   f"CAST(quantile_cont(n_chars, {p}) AS DOUBLE) AS {a}"
                   for p, a in _QUANTILES
               )}
        FROM toks
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    doc="⊕ corpus rollup per (lang, source): doc counts, integer-exact "
    "token/char totals (avg = one double division — bitwise stable), and "
    "the doc-length quantile cutoffs (p25/p50/p75/p95 of n_chars) a "
    "curation pipeline derives its length band from — one hash agg on a "
    "~100-key space instead of two corpus scans (round-5 consolidation of "
    "the former text_length_quantiles registration, VERDICT r4 #2). "
    "Spark's exact `percentile` and DuckDB's quantile_cont share the "
    "lower+(upper-lower)*frac interpolation at position p*(n-1), so "
    "values match bitwise. Exact percentile holds the group's values — "
    "fine on a low-cardinality (lang, source) key; for high-cardinality "
    "keys switch to percentile_approx (t-digest sketch, bounded state; "
    "see dash_approx_distinct for the same exact-vs-sketch tradeoff). "
    "Partial aggregation keeps the sums map-side at 100 TB.",
    tags=("text", "rollup", "quantile"),
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(tokens_expr("text")).cast("long")
    return (
        docs.select("lang", "source", "n_chars", n_tok.alias("n_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
            F.sum("n_chars").alias("sum_chars"),
            *[
                F.percentile("n_chars", F.lit(p)).alias(a)
                for p, a in _QUANTILES
            ],
        )
        .orderBy("lang", "source")
    )


# zh included since round 5: the lang-ID heuristic gained a zh marker
# lexicon (operators/textops.py:ZH_MARKERS), so a multilingual corpus no
# longer silently drops Chinese at the allowlist stage (VERDICT r4 #5).
_KEEP_LANGS = ("en", "de", "fr", "es", "zh")
_MIN_QUALITY = 0.55
_LEN_LO, _LEN_HI = 120, 600  # n_chars cutoffs ≈ the p10/p90 band


@register(
    "curation_funnel",
    oracle=f"""
        {_TOKS}
        SELECT stage, CAST(n_docs AS BIGINT) AS n_docs FROM (
            SELECT '1_raw' AS stage, COUNT(*) AS n_docs FROM toks
            UNION ALL
            SELECT '2_lang', COUNT(*) FROM toks
            WHERE lang IN {_KEEP_LANGS!r}
            UNION ALL
            SELECT '3_quality', COUNT(*) FROM toks
            WHERE lang IN {_KEEP_LANGS!r}
              AND {_Q['quality']} >= {_MIN_QUALITY}
            UNION ALL
            SELECT '4_length', COUNT(*) FROM toks
            WHERE lang IN {_KEEP_LANGS!r}
              AND {_Q['quality']} >= {_MIN_QUALITY}
              AND n_chars BETWEEN {_LEN_LO} AND {_LEN_HI}
        )
        ORDER BY stage
    """,
    doc="⊕ the curation funnel — the composed keep/drop decision a "
    "training-data pipeline actually ships: language allowlist → quality "
    "score floor → length band, reported as per-stage survivor counts "
    "(the numbers a data card publishes). Single scan: the stages are "
    "conditional counts over one pass, not four scans — F.sum(when) per "
    "stage keeps it one map-side aggregate at 100 TB.",
    tags=("text", "curation"),
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "lang", "n_chars", tokens_expr("text").alias("_t")
    )
    q = quality_exprs(F.col("_t"))
    lang_ok = F.col("lang").isin(*_KEEP_LANGS)
    qual_ok = lang_ok & (q["quality"] >= _MIN_QUALITY)
    len_ok = qual_ok & F.col("n_chars").between(_LEN_LO, _LEN_HI)
    # coalesce: a global F.sum over zero rows is NULL, but the oracle's
    # filtered COUNT(*) is 0 — an empty day's funnel must publish zeros.
    counted = toked.agg(
        F.count(F.lit(1)).alias("1_raw"),
        F.coalesce(F.sum(lang_ok.cast("long")), F.lit(0)).alias("2_lang"),
        F.coalesce(F.sum(qual_ok.cast("long")), F.lit(0)).alias("3_quality"),
        F.coalesce(F.sum(len_ok.cast("long")), F.lit(0)).alias("4_length"),
    )
    return (
        counted.unpivot([], ["1_raw", "2_lang", "3_quality", "4_length"],
                        "stage", "n_docs")
        .select("stage", F.col("n_docs").cast("bigint").alias("n_docs"))
        .orderBy("stage")
    )


# TF-IDF / unigram-LM doc scoring (round 7): corpus-weighted signals. Both
# scores are deliberately RATIONAL (no ln/exp): JVM Math.log and DuckDB's
# libm ln disagree in the last ulp on ~7% of inputs (measured over 3,481
# small-int ratios), so a textbook log-idf could never hash-match an
# oracle bitwise. (N+1)/(df+1) odds-idf preserves the df ordering log-idf
# ranks by, and the LM score keeps its numerator an exact BIGINT sum so
# the only double op is one final division (the engine decimal policy,
# functions/scalars.py).
TFIDF_LAPLACE = 1  # Laplace smoothing constant shared by idf and p(term)


@register(
    "tfidf_doc_scores",
    oracle=f"""
        {_TOKS},
        tok AS (SELECT doc_id, u.s AS term FROM toks, UNNEST(t) AS u(s)),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf
               FROM tok GROUP BY doc_id, term),
        st AS (SELECT term, SUM(tf) AS cf, COUNT(*) AS df
               FROM tf GROUP BY term),
        tot AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                       SUM(cf) AS t_tokens, COUNT(*) AS v_terms
                FROM st),
        per AS (
            SELECT doc_id,
                   SUM(tf) AS n_tok,
                   COUNT(*) AS n_terms,
                   MIN(struct_pack(
                       nt := -(CAST(tf AS DOUBLE)
                               * CAST(n_docs + {TFIDF_LAPLACE} AS DOUBLE)
                               / CAST(df + {TFIDF_LAPLACE} AS DOUBLE)),
                       term := term)) AS top,
                   SUM(tf * (cf + {TFIDF_LAPLACE})) AS ws,
                   MIN(t_tokens) AS t_tokens,
                   MIN(v_terms) AS v_terms
            FROM tf JOIN st USING (term) CROSS JOIN tot
            GROUP BY doc_id)
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tok,
               CAST(n_terms AS BIGINT) AS n_terms,
               top.term AS top_term,
               -(top.nt) AS top_tfidf,
               CAST(ws AS DOUBLE)
                   / CAST(n_tok * (t_tokens + v_terms) AS DOUBLE)
                   AS mean_token_p
        FROM per
    """,
    doc="⊕ corpus-weighted per-document scores — the two classic "
    "statistical text signals a curation pipeline derives from the corpus "
    "itself rather than per-row: (1) the document's most distinctive term "
    "by tf-idf (odds-form idf (N+1)/(df+1) — rational on purpose, see the "
    "module comment: log-idf cannot hash-match DuckDB bitwise; ties break "
    "to the lexicographically smallest term via min(struct) in BOTH "
    "engines), and (2) a unigram-LM commonness score: the mean Laplace-"
    "smoothed token probability Σtf·(cf+1) / (n_tok·(T+V)) — the numerator "
    "is an exact BIGINT sum (associative, order-free across partitions; a "
    "double Σ tf·p would be partition-order-dependent and could never "
    "hash-match), one double division at the end. CCNet-style LM quality "
    "filtering thresholds exactly this kind of score. 100 TB shape: "
    "explode is map-side; tf is one (doc,term) shuffle with map-side "
    "combine; term stats are a second, vocab-sized shuffle; the tf⋈stats "
    "join is term-keyed — natural-language vocabularies are ~1e6-1e8 "
    "rows ≈ MBs-GBs, so Catalyst/AQE broadcasts it (verified at fixture "
    "SF), and head-term skew (\"the\" in every doc) never forms a skewed "
    "shuffle partition; the per-doc rollup reuses tf's (doc,term) "
    "partitioning for a cheap final agg. No global sort: the result is "
    "corpus-grain and the driver compare is order-insensitive.",
    headline=True,
    tags=("text", "tfidf", "lm", "curation"),
)
def tfidf_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("term")
    )
    # localCheckpoint (the engine's multi-consumer idiom, cf. pipeline.py
    # curated layer): tf feeds the scored probe side AND the term-stats
    # rollup, and st feeds the join build side AND the totals row — without
    # the two checkpoints Spark re-derives the scan→explode→(doc,term)
    # shuffle subtree three times (verified in the formatted plan), i.e.
    # three corpus passes at 100 TB instead of one.
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    st = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("cf"), F.count(F.lit(1)).alias("df"))
        .localCheckpoint()
    )
    tot = st.agg(
        F.sum("cf").alias("t_tokens"), F.count(F.lit(1)).alias("v_terms")
    ).crossJoin(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    lap = F.lit(TFIDF_LAPLACE)
    tfidf = (
        F.col("tf").cast("double")
        * (F.col("n_docs") + lap).cast("double")
        / (F.col("df") + lap).cast("double")
    )
    per = (
        tf.join(st, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.count(F.lit(1)).alias("n_terms"),
            F.min(
                F.struct((-tfidf).alias("nt"), F.col("term").alias("term"))
            ).alias("top"),
            F.sum(F.col("tf") * (F.col("cf") + lap)).alias("ws"),
            F.min("t_tokens").alias("t_tokens"),
            F.min("v_terms").alias("v_terms"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_tok").alias("n_tok"),
        F.col("n_terms").alias("n_terms"),
        F.col("top.term").alias("top_term"),
        (-F.col("top.nt")).alias("top_tfidf"),
        (
            F.col("ws").cast("double")
            / (F.col("n_tok") * (F.col("t_tokens") + F.col("v_terms"))).cast(
                "double"
            )
        ).alias("mean_token_p"),
    )


# Benchmark decontamination (round 7): the fixture has no separate eval
# table, so the benchmark set is a deterministic slice of the corpus —
# every 17th doc_id — which also keeps the oracle a pure documents-table
# query. N=5 word-grams: the standard published range is 8-13-gram overlap
# (GPT-3 App. C / PaLM); 5 matches this fixture's ~56-token docs the way
# 13 matches web pages, and at N=3 the tiny fixture vocabulary flags 80%
# of the corpus (measured) — boilerplate, not contamination.
DECON_N = 5
DECON_BENCH_MOD = 17


_DECON_ORACLE = f"""
        {_TOKS},
        sh AS (SELECT doc_id, {shingles_sql('t', DECON_N)} AS g FROM toks),
        b AS (SELECT DISTINCT u.s FROM sh, UNNEST(g) AS u(s)
              WHERE doc_id % {DECON_BENCH_MOD} = 0),
        tr AS (SELECT doc_id, len(g) AS n_grams, u.s
               FROM sh, UNNEST(g) AS u(s)
               WHERE doc_id % {DECON_BENCH_MOD} <> 0)
        SELECT doc_id,
               CAST(n_grams AS INT) AS n_grams,
               CAST(COUNT(*) AS BIGINT) AS n_overlap,
               CAST(COUNT(*) AS DOUBLE) / CAST(n_grams AS DOUBLE)
                   AS overlap_frac
        FROM tr JOIN b USING (s)
        GROUP BY doc_id, n_grams
        ORDER BY doc_id
    """


@register(
    "decontaminate_ngram_overlap",
    oracle=_DECON_ORACLE,
    doc="⊕ train/eval decontamination — the n-gram-overlap check every "
    "published LLM pipeline runs before training (docs sharing a 5-gram "
    "with the benchmark set, with overlap counts and fraction-of-doc so "
    "the caller can threshold). Spark-first shape for the 100 TB side: the "
    "benchmark gram set is tiny (eval suites are MBs), so it is "
    "distinct-ed and BROADCAST; the corpus side then never shuffles its "
    "grams — the inner hash join runs map-side inside the scan stage and "
    "only the per-doc overlap counts (partial-agg'd) hit the exchange. "
    "Reuses the dedup family's carried-set-size shingle table "
    "(operators/dedup.py:doc_shingles) so n_grams needs no second "
    "tokenize pass.",
    headline=True,
    tags=("text", "curation", "decontamination"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.dedup import doc_shingles

    docs = table(spark, sf_dir, "documents")
    # spread=False (round 18, VERDICT r17 #1): this query is broadcast-
    # join-bound, not tokenize-bound (flat with the spread in r17), and
    # its scale pin forbids any Exchange between the corpus-side gram
    # explode and the broadcast join.
    sh = doc_shingles(docs, "doc_id", "text", n=DECON_N, spread=False)
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    bench_grams = sh.filter(is_bench).select("s").distinct()
    train = sh.filter(~is_bench)
    return _decon_overlap_result(train, bench_grams)


def _decon_overlap_result(train: DataFrame, bench_grams: DataFrame) -> DataFrame:
    """Shared result shaping of both decontamination variants — the bloom
    twin's bitwise-parity contract requires the exact-join/groupBy/
    projection to be THE SAME code, not a copy that can drift."""
    return (
        train.join(F.broadcast(bench_grams), "s")
        .groupBy("doc_id", "n")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            "doc_id",
            F.col("n").alias("n_grams"),
            F.col("n_overlap"),
            (
                F.col("n_overlap").cast("double")
                / F.col("n").cast("double")
            ).alias("overlap_frac"),
        )
        .orderBy("doc_id")
    )


def _bloom_reference_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-gram construction plan of the bloom query, exposed
    for the plan-invariant sweep (it executes eagerly inside the query
    builder and the returned panel plan no longer contains it)."""
    from data_pipeline_team5_spark.operators.dedup import doc_shingles

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text", n=DECON_N)
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    return sh.filter(is_bench).select("s").distinct()


@register(
    "decontaminate_bloom_prefilter",
    oracle=_DECON_ORACLE,
    doc="⊕ the same decontamination check under the physical strategy "
    "that survives a reference set too large to broadcast EXACTLY "
    "(merged eval batteries + web overlap lists — billions of grams): a "
    "hand-built Bloom filter over the benchmark grams (~10 bits/key at "
    "1% fpp, so 1e9 keys ≈ 1.2 GB broadcasts where the exact set "
    "cannot) prefilters the corpus gram stream MAP-SIDE — one parsed "
    "JVM expression of xxhash64 bit tests against the word array, no "
    "UDF, no shuffle (operators/bloom.py; PySpark 4 exposes no "
    "bloom_filter_agg/might_contain, so the filter and bit tests are "
    "built from public primitives). False positives only ADD "
    "candidates, and the surviving sliver still passes an exact join "
    "(broadcast at fixture scale; in the too-big-to-broadcast regime "
    "the verify becomes a SHUFFLE join whose corpus side is the "
    "prefiltered sliver — ~fpp of the gram stream plus true overlaps, "
    "which is the filter's whole point), so results are BITWISE the "
    "exact query's — the oracle is decontaminate_ngram_overlap's "
    "verbatim. At fixture scale the variant is strictly EXTRA work over "
    "the broadcastable exact join (k xxhash64 per corpus gram + the "
    "build pass; measured 1.7 vs 1.1 s at sf0.1, both linear at 10× — "
    "SCALING.md round-11); it exists for the regime the exact form "
    "cannot enter. Filter "
    "parameters derive from the realized reference size (m = next "
    "pow2 of n·ln(1/fpp)/ln²2; k = the SMALLEST hash count meeting "
    "fpp at that m — the derived-knob discipline); the literal "
    "embedding is capped at 512 KiB and past the cap the apply ROUTES "
    "automatically to a broadcast-variable strategy (round 13): words "
    "ship as a Spark broadcast consumed by an Arrow-batched numpy bit "
    "test over JVM-computed xxhash64 positions — bitwise "
    "interchangeable with the literal path, forced-low-cap-pinned in "
    "tests/test_bloom.py. The distinct reference grams are "
    "checkpoint-pinned once for the build count, the filter words and "
    "the verify join — RETAINED by the returned lazy plan (the "
    "documented-retention convention; the pin is reference-sized, "
    "never corpus-sized).",
    headline=True,
    tags=("text", "curation", "decontamination", "bloom"),
)
def decontaminate_bloom_prefilter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from data_pipeline_team5_spark.operators.bloom import (
        bloom_parameters,
        bloom_prefilter,
        build_bloom_words,
    )
    from data_pipeline_team5_spark.operators.dedup import doc_shingles

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text", n=DECON_N)
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    # one pass over the (reference-sized, corpus-independent) gram set
    # builds the filter; n_keys comes from that same materialization
    bench_grams = _bloom_reference_grams(spark, sf_dir).localCheckpoint()
    n_keys = bench_grams.count()
    m_bits, k = bloom_parameters(n_keys, fpp=0.01)
    words = build_bloom_words(bench_grams, "s", m_bits, k)
    train = sh.filter(~is_bench)
    # Strategy routes on the literal cap (round 13, VERDICT r12 #1):
    # fixture-scale filters embed as one constant-folded plan literal;
    # past the cap the words ship as a broadcast variable consumed by
    # an Arrow-batched numpy bit test — same xxhash64 positions, bitwise
    # interchangeable (forced-low-cap parity in tests/test_bloom.py).
    prefiltered = bloom_prefilter(train, "s", words, m_bits, k)
    return _decon_overlap_result(prefiltered, bench_grams)


# The two decontamination strategies return IDENTICAL rows by contract,
# so the panel's oracle is the same statement tagged twice — any
# strategy divergence breaks the union hash.
_DECON_BODY = _DECON_ORACLE.rsplit("ORDER BY doc_id", 1)[0]
_DECON_PANEL_ORACLE = f"""
        SELECT 'bloom' AS strategy, q.* FROM ({_DECON_BODY}) q
        UNION ALL
        SELECT 'exact' AS strategy, q.* FROM ({_DECON_BODY}) q
        ORDER BY strategy, doc_id
    """


@register(
    "decontamination_panel",
    oracle=_DECON_PANEL_ORACLE,
    doc="⊕ BOTH decontamination strategies in one driver slot (round 13, "
    "VERDICT r12 #7 — the bloom strategy had no driver-graded row; the "
    "window was full, so this is the same-slot consolidation recipe's "
    "4th use): section 'exact' is decontaminate_ngram_overlap's "
    "broadcast-join form, section 'bloom' is decontaminate_bloom_"
    "prefilter's prefilter-plus-exact-verify form, union-tagged under "
    "ONE oracle that is the decontamination SQL stated twice — the "
    "strategies are bitwise interchangeable by contract, so a green "
    "hash here certifies the exact result AND the strategy parity in "
    "one row. Each section is the standalone registered query verbatim "
    "(both stay registered, oracle-backed, in the tail); the panel adds "
    "no third implementation that could drift. NOT a bench headliner: "
    "both standalone forms are timed, and the panel would re-measure "
    "their sum (the round-13 quantile-accounting rule).",
    tags=("text", "curation", "decontamination", "bloom"),
)
def decontamination_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = decontaminate_ngram_overlap(spark, sf_dir)
    bl = decontaminate_bloom_prefilter(spark, sf_dir)
    return (
        bl.select(F.lit("bloom").alias("strategy"), "*")
        .unionByName(ex.select(F.lit("exact").alias("strategy"), "*"))
        .orderBy("strategy", "doc_id")
    )


# Sequence-length histogram (round 7): fixed-width bins over the BPE-ish
# token count. 16-token bins resolve this fixture's ~40-90-token docs into
# ~6 bins per lang; a production run widens the bin to its budget grid.
HIST_BIN_TOKENS = 16


@register(
    "doc_length_histogram",
    oracle=f"""
        SELECT lang,
               CAST(({bpe_count_sql('text')} // {HIST_BIN_TOKENS})
                    * {HIST_BIN_TOKENS} AS INT) AS bin_lo,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS DOUBLE)
                   AS lang_share
        FROM documents
        GROUP BY lang, bin_lo
        ORDER BY lang, bin_lo
    """,
    doc="⊕ the sequence-length histogram a packing/batching planner reads "
    "before choosing its token budget: docs per (lang, 16-token BPE-count "
    "bin) with each bin's share of its language. The grouped count is one "
    "map-side-combined hash agg over a derived key (the binned "
    "regexp_count — no token array is materialized, operators/textops.py: "
    "bpe_token_count); the share's window sum runs over the ALREADY "
    "AGGREGATED ~langs×bins-row result, so the exchange it adds moves a "
    "few hundred rows, not the corpus — shares stay exact because the "
    "window sums BIGINT counts and the one double division happens last. "
    "The global sort orders the same tiny result (cf. text_corpus_stats).",
    tags=("text", "histogram", "packing"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bin_lo = (
        F.floor(bpe_token_count("text") / F.lit(HIST_BIN_TOKENS))
        * F.lit(HIST_BIN_TOKENS)
    ).cast("int")
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    return (
        docs.groupBy("lang", bin_lo.alias("bin_lo"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lang",
            "bin_lo",
            "n_docs",
            (
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(w).cast("double")
            ).alias("lang_share"),
        )
        .orderBy("lang", "bin_lo")
    )


@register(
    "source_dup_report",
    oracle=f"""
        WITH fp AS (
            SELECT source,
                   {fingerprint_md5_sql('text')} AS fp
            FROM documents
        ),
        per_fp_source AS (
            SELECT fp, source, COUNT(*) AS n_in_source
            FROM fp GROUP BY fp, source
        ),
        fp_spread AS (
            SELECT fp, COUNT(*) AS n_sources
            FROM per_fp_source GROUP BY fp
        )
        SELECT p.source,
               CAST(SUM(p.n_in_source) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_unique,
               1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(p.n_in_source)
                   AS dup_rate,
               CAST(COUNT(CASE WHEN s.n_sources > 1 THEN 1 END) AS BIGINT)
                   AS n_syndicated,
               CAST(COUNT(CASE WHEN s.n_sources > 1 THEN 1 END) AS DOUBLE)
                   / COUNT(*) AS syndication_rate
        FROM per_fp_source p JOIN fp_spread s ON p.fp = s.fp
        GROUP BY p.source
        ORDER BY p.source
    """,
    doc="⊕ per-source duplication & syndication report — the diagnostic a "
    "curation pipeline reads before deciding which sources to drop or "
    "downweight: within-source exact-dup rate (docs vs distinct content "
    "fingerprints) and cross-source syndication (fingerprints that also "
    "appear under another source — wire-service/mirror content that "
    "inflates several sources at once). Grain discipline at 100 TB: ONE "
    "corpus-sized shuffle (the (fp, source) aggregation — the same md5 "
    "fingerprint key exact dedup already shuffles on); everything after "
    "runs on fingerprint grain, orders of magnitude smaller, and the "
    "final rollup is a ~#sources-key agg. The fp→n_sources spread joins "
    "back to (fp, source) rows, never to documents — text never moves. "
    "Rates are single double divisions of exact BIGINTs, so both engines "
    "emit bitwise-identical doubles.",
    tags=("text", "dedup", "rollup", "source"),
)
def source_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    # ONE corpus-sized exchange, genuinely shared: repartition('fp')
    # hash-distributes the fingerprints once, and HashPartitioning(fp)
    # satisfies BOTH downstream distribution requirements — the
    # (fp, source) aggregation (clustering keys are a superset of the
    # partitioning keys) and the fp window. Without it Catalyst plans
    # Exchange(fp, source) for the groupBy and then a SECOND
    # Exchange(fp) for the window, because HashPartitioning(fp, source)
    # does NOT satisfy ClusteredDistribution(fp) (ADVICE r8; pinned by
    # tests/test_plan_invariants.py::test_source_dup_report_single_exchange).
    per_fp_source = (
        docs.select("source", fingerprint_md5("text").alias("fp"))
        .repartition("fp")
        .groupBy("fp", "source")
        .agg(F.count(F.lit(1)).alias("n_in_source"))
    )
    n_sources = F.count(F.lit(1)).over(Window.partitionBy("fp"))
    spread = per_fp_source.withColumn("n_sources", n_sources)
    return (
        spread.groupBy("source")
        .agg(
            F.sum("n_in_source").alias("n_docs"),
            F.count(F.lit(1)).alias("n_unique"),
            (
                F.lit(1.0)
                - F.count(F.lit(1)).cast("double") / F.sum("n_in_source")
            ).alias("dup_rate"),
            F.count(F.when(F.col("n_sources") > 1, F.lit(1))).alias(
                "n_syndicated"
            ),
            (
                F.count(F.when(F.col("n_sources") > 1, F.lit(1))).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("syndication_rate"),
        )
        .orderBy("source")
    )


# Cross-document n-gram duplication (round 8): the corpus-level repetition
# signal RefinedWeb (Penedo et al. 2023, §"fraction of duplicated n-grams")
# and Dolma publish per document — HOW MUCH of this doc's content also
# appears verbatim in OTHER documents. Deliberately distinct from the two
# neighbors it completes: text_doc_profile's Gopher dup_trigram_frac is
# WITHIN-doc repetition (no shuffle, says nothing about the rest of the
# corpus), and exact_substring_neardup is PAIRWISE containment (names the
# matching partner doc). This is the corpus-marginal middle: one number
# per doc, no pair enumeration. N reuses the fixture-calibrated DECON_N.
DUP_NGRAM_N = DECON_N


@register(
    "dup_ngram_fraction",
    oracle=f"""
        {_TOKS},
        g AS (
            SELECT doc_id, lang,
                   list_distinct({ngrams_sql('t', DECON_N)}) AS gs
            FROM toks
        ),
        dg AS (SELECT doc_id, u.g AS gram FROM g, UNNEST(gs) AS u(g)),
        dupg AS (SELECT gram FROM dg GROUP BY gram HAVING COUNT(*) >= 2),
        dpd AS (
            SELECT doc_id, COUNT(*) AS n_dup
            FROM dg JOIN dupg USING (gram) GROUP BY doc_id
        )
        SELECT g.doc_id, g.lang,
               CAST(len(gs) AS BIGINT) AS n_grams,
               CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_grams,
               CASE WHEN len(gs) = 0 THEN 0.0
                    ELSE CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / len(gs)
               END AS dup_gram_frac
        FROM g LEFT JOIN dpd d USING (doc_id)
    """,
    doc="⊕ cross-document duplicated-n-gram fraction (RefinedWeb/Dolma "
    "corpus-repetition signal): per doc, the share of its DISTINCT word "
    f"{DECON_N}-grams that also occur in at least one OTHER document — "
    "within-doc repeats don't count (per-doc array_distinct before the "
    "corpus exchange), so the signal is orthogonal to text_doc_profile's "
    "in-row Gopher fractions. Scale shape = tfidf_doc_scores: n_grams is "
    "computed IN-ROW (zero shuffle); only the dup count pays a gram-keyed "
    "exchange — document frequency comes from a count window over the "
    "gram partition, so the (doc, gram) load crosses exactly ONE corpus-"
    "sized exchange (a groupBy(gram)→join-back shape pays it twice; 1.9× "
    "slower measured at 10×), and everything df==1 — a web corpus's "
    "mostly-unique gram space — dies in the post-window filter before "
    "the doc rollup. Zero-gram docs (< N tokens) keep a row with frac 0.0 "
    "via the doc-grain left join — same empty-doc discipline as "
    "line_boilerplate_scrub. Fraction = one double division of exact "
    "BIGINTs (engine decimal policy).",
    headline=True,
    tags=("text", "dedup", "repetition", "curation"),
)
def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # Plan discipline (measured at sf0.1, four shapes tried): the token
    # array MUST be projected to a named column BEFORE ngrams_expr builds
    # the gram transform over it. A higher-order-function lambda is
    # evaluated INTERPRETED, with no cross-call subexpression elimination —
    # so when the lambda's element_at calls reference the raw
    # split(norm_text(text)) EXPRESSION (rather than an attribute), the
    # whole regexp-normalize + split chain re-runs for every element_at at
    # every gram position: 5 re-tokenizations of the full document per
    # 5-gram, ~47 s per consuming scan here (and 360 s when projection
    # collapse additionally inlined the tree into every final-select
    # consumer). With `_t` bound as a column the lambda reads an O(1)
    # array attribute and each scan codegens normally: the full query
    # collects in < 2 s. text_doc_profile documents the same rule
    # (text_family.py:140); CollapseProject will not re-inline `_t`
    # because it is referenced ~8 times inside the gram expression.
    base = docs.select("doc_id", "lang", tokens_expr("text").alias("_t"))
    grams = F.array_distinct(ngrams_expr("_t", DUP_NGRAM_N))
    stats = base.select(
        "doc_id", "lang", F.size(grams).cast("bigint").alias("n_grams")
    )
    dg = base.select("doc_id", F.explode(grams).alias("gram"))
    # df via a count window over the gram partition, NOT groupBy(gram) →
    # join-back: the window ships the (doc, gram) load through ONE gram-
    # keyed exchange, where the join-back shape pays that exchange twice
    # (once into the agg, once into the join probe). Measured on the 10×
    # stress corpus — where replication makes EVERY gram df≥10, the worst
    # case, since the whole gram load then survives the filter — the
    # window form is 19.5 s vs 36.5 s for join-back (1.7 s vs 2.1 s at
    # sf0.1). dg is per-doc DISTINCT grams, so the partition count IS
    # document frequency.
    w_gram = Window.partitionBy("gram")
    dpd = (
        dg.withColumn("df", F.count(F.lit(1)).over(w_gram))
        .filter(F.col("df") >= 2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    n_dup = F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint")
    n_grams = F.col("n_grams")
    return stats.join(dpd, "doc_id", "left").select(
        "doc_id",
        "lang",
        "n_grams",
        n_dup.alias("n_dup_grams"),
        F.when(n_grams == 0, F.lit(0.0))
        .otherwise(n_dup.cast("double") / n_grams.cast("double"))
        .alias("dup_gram_frac"),
    )


# Token-budget quality cut (round 8): "spend a fixed training-token budget
# on the highest-quality documents" — the selection step every
# budget-constrained pretraining mix runs after scoring (the data-mix
# literature's quality-threshold selection, e.g. DoReMi/DataComp-style
# budget cuts). Per-language budget so one dominant language cannot eat
# the whole allowance (same concern domain_mixture_sample handles for
# sampling).
QCUT_BUDGET = 2_000  # tokens kept per language (fixture-calibrated)
QCUT_Q_SCALE = 1_000_000  # quality quantization for the bucket key


@register(
    "token_budget_cut",
    oracle=f"""
        {_TOKS},
        sized AS (
            SELECT doc_id, lang,
                   CAST({_Q['n_tokens']} AS BIGINT) AS n_tok,
                   CAST(floor({_Q['quality']} * {QCUT_Q_SCALE}) AS BIGINT)
                       AS qb
            FROM toks
        ),
        bt AS (
            SELECT lang, qb, SUM(n_tok) AS btot
            FROM sized GROUP BY lang, qb
        ),
        boff AS (
            SELECT lang, qb,
                   COALESCE(SUM(btot) OVER (
                       PARTITION BY lang ORDER BY qb DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS boff
            FROM bt
        ),
        placed AS (
            SELECT s.lang, s.n_tok, s.qb,
                   b.boff + COALESCE(SUM(s.n_tok) OVER (
                       PARTITION BY s.lang, s.qb ORDER BY s.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS tok_before
            FROM sized s JOIN boff b USING (lang, qb)
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs_total,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
               CAST(SUM(CASE WHEN tok_before < {QCUT_BUDGET} THEN 1
                             ELSE 0 END) AS BIGINT) AS n_docs_kept,
               CAST(SUM(CASE WHEN tok_before < {QCUT_BUDGET} THEN n_tok
                             ELSE 0 END) AS BIGINT) AS tokens_kept,
               CAST(SUM(CASE WHEN tok_before < {QCUT_BUDGET} THEN n_tok
                             ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(n_tok) AS DOUBLE) AS kept_token_share,
               CAST(MIN(CASE WHEN tok_before < {QCUT_BUDGET} THEN qb END)
                   AS BIGINT) AS cutoff_qbucket
        FROM placed
        GROUP BY lang ORDER BY lang
    """,
    doc="⊕ token-budget quality cut: per language, keep the highest-"
    f"quality documents until a {QCUT_BUDGET}-token training budget is "
    "spent (a doc whose start offset falls inside the budget is kept — "
    "the pack_training_sequences convention), and report the per-lang "
    "keep counts, token shares and the effective quality cutoff. "
    "Selection rule is EXACT and engine-portable: quality is quantized "
    f"to floor(q·{QCUT_Q_SCALE}) buckets (the shared bitwise-identical "
    "double, one deterministic IEEE multiply+floor), budget is charged "
    "bucket-major (qb descending) with doc_id as the deterministic "
    "in-bucket tie-break. Scale shape — NO global sort and NO whole-"
    "language single-task window (the trap pack_bins documents): the "
    "only corpus-sized exchange is the in-bucket cumsum window's hash on "
    "(lang, qb); the bucket-total agg ships map-side-combined bucket "
    "partials, and the "
    "budget walk happens on the bucket-grain offsets table (≤ langs × "
    "quality buckets rows, orders of magnitude smaller than the corpus), "
    "joined back by (lang, qb). Per-task sort cost is bounded by bucket "
    "occupancy, set by QCUT_Q_SCALE. All counters exact BIGINT; the one "
    "double division is integer/integer (engine decimal policy).",
    headline=True,
    tags=("text", "quality", "sampling", "curation", "budget"),
)
def token_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # Token array bound to a column BEFORE the quality expressions consume
    # it — see dup_ngram_fraction above for the measured HOF re-evaluation
    # pathology this avoids (quality_exprs contains an F.filter lambda).
    base = docs.select("doc_id", "lang", tokens_expr("text").alias("_t"))
    q = quality_exprs(F.col("_t"))
    sized = base.select(
        "doc_id",
        "lang",
        q["n_tokens"].cast("long").alias("n_tok"),
        F.floor(q["quality"] * QCUT_Q_SCALE).cast("long").alias("qb"),
    )
    totals = sized.groupBy("lang", "qb").agg(
        F.sum("n_tok").cast("long").alias("_btot")
    )
    w_bucket = (
        Window.partitionBy("lang")
        .orderBy(F.desc("qb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "lang",
        "qb",
        F.coalesce(F.sum("_btot").over(w_bucket), F.lit(0))
        .cast("long")
        .alias("_boff"),
    )
    w_local = (
        Window.partitionBy("lang", "qb")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        sized.withColumn(
            "_lb",
            F.coalesce(F.sum("n_tok").over(w_local), F.lit(0)).cast("long"),
        )
        .join(offsets, ["lang", "qb"])
        .withColumn("_kept", (F.col("_boff") + F.col("_lb")) < QCUT_BUDGET)
    )
    kept = F.when(F.col("_kept"), F.col("n_tok"))
    return (
        placed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_total"),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
            F.sum(F.when(F.col("_kept"), F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_docs_kept"),
            F.sum(F.coalesce(kept, F.lit(0))).cast("bigint").alias(
                "tokens_kept"
            ),
            F.min(F.when(F.col("_kept"), F.col("qb")))
            .cast("bigint")
            .alias("cutoff_qbucket"),
        )
        .select(
            "lang",
            "n_docs_total",
            "tokens_total",
            "n_docs_kept",
            "tokens_kept",
            (
                F.col("tokens_kept").cast("double")
                / F.col("tokens_total").cast("double")
            ).alias("kept_token_share"),
            "cutoff_qbucket",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (round 9): the gzip/zlib entropy proxy
# Dolma and RefinedWeb publish as a repetitiveness filter — highly
# compressible text (low compressed/raw ratio) is boilerplate or
# template spam; near-incompressible text (ratio ≈ 1) is often binary
# junk or hash dumps. The complement of the Gopher n-gram fractions:
# those count exact token repeats, this catches ANY low-entropy
# regularity (including character-level and structural repetition the
# token metrics miss).

ZRATIO_LO = 0.45  # below → repetitive/templated (fixture p27)
ZRATIO_HI = 1.00  # above → incompressible junk (ratio > 1 = zlib overhead)


@register(
    "compression_ratio_signal",
    oracle=None,  # zlib is not expressible in DuckDB SQL; exactness is
    # pinned instead by tests/test_compression_signal.py — the SAME
    # CPython zlib runs in the executors and the mirror, level fixed, so
    # byte counts match integer-exactly and the ratio is one double
    # division of those integers.
    doc="⊕ compression-ratio quality signal (the Dolma/RefinedWeb zlib "
    "entropy proxy): per-doc raw/compressed byte counts, their ratio, "
    "and a keep flag (repetitive below the low cut, junk above the high "
    "cut). The one text-family operator that genuinely needs Python — "
    "there is no JVM-side zlib expression — so it is the sanctioned "
    "Arrow path: mapInPandas streams record batches, zlib level is "
    "pinned (deterministic output bytes for a given input on any "
    "zlib build — rerun- and partitioning-stable), and the plan stays "
    "a single map-side pass inside the scan stage with zero shuffle. "
    "At 100 TB: compression throughput (~100 MB/s/core) is the honest "
    "cost — the same work any pipeline materializing compressed "
    "training shards pays anyway; fuse this signal into that write "
    "rather than paying a second pass.",
    headline=True,
    tags=("text", "quality", "entropy", "udf"),
)
def compression_ratio_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = (
        "doc_id bigint, n_bytes int, n_zbytes int, zratio double, "
        "keep boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            raw = pdf["text"].str.encode("utf-8")
            n_bytes = raw.map(len)
            n_z = raw.map(lambda b: len(zlib.compress(b, 6)))
            zratio = n_z / n_bytes
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "n_zbytes": n_z,
                    "zratio": zratio,
                    "keep": (zratio >= ZRATIO_LO) & (zratio <= ZRATIO_HI),
                }
            )

    return docs.mapInPandas(batches, out_schema).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Vocabulary coverage (round 9 continued): the tokenizer-training prep step —
# corpus-global term frequencies, ranked, with the cumulative fraction of all
# running text a top-K vocabulary would cover. The coverage curve is how a
# vocab size is actually chosen (where the curve flattens, stop), and the
# ranked list is the seed vocabulary for BPE-style tokenizer induction.

VOCAB_TOP_K = 24


@register(
    "vocab_coverage",
    oracle=f"""
        {_TOKS},
        terms AS (
            SELECT u.tok AS term, CAST(COUNT(*) AS BIGINT) AS term_count
            FROM toks, UNNEST(t) AS u(tok)
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(term_count) AS BIGINT) AS total FROM terms
        ),
        top AS (
            SELECT term, term_count FROM terms
            ORDER BY term_count DESC, term
            LIMIT {VOCAB_TOP_K}
        )
        SELECT CAST(ROW_NUMBER() OVER
                   (ORDER BY term_count DESC, term) AS INT) AS term_rank,
               term,
               term_count,
               CAST(SUM(term_count) OVER
                        (ORDER BY term_count DESC, term
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / CAST(total AS DOUBLE) AS cum_coverage
        FROM top, tot
        ORDER BY term_rank
    """,
    doc="⊕ vocabulary coverage curve: corpus-global term frequencies over "
    "normalized whitespace tokens, top-24 by (count DESC, term) with each "
    "rank's cumulative share of ALL running tokens — the tokenizer-"
    "training prep step (the curve's knee picks the vocab size; the ranked "
    "list seeds BPE induction) and the complement of text_corpus_stats' "
    "per-group view. Spark shape at 100 TB: the ONLY corpus-sized exchange "
    "is the term count (map-side combine collapses each partition to its "
    "local vocab first); top-K is TakeOrderedAndProject (no global sort "
    "materializes the billion-term tail); the denominator is a 1-row "
    "aggregate of the already-grouped counts, broadcast back; the rank/"
    "cumsum window runs over exactly K rows. Deterministic total order "
    "(ties break on the term string) and a single double division keep "
    "the oracle bitwise.",
    headline=True,
    tags=("text", "vocab", "tokenizer", "coverage"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # localCheckpoint (the multi-consumer idiom, cf. tfidf_doc_scores):
    # the aggregated term counts feed BOTH the top-K branch and the
    # total-tokens denominator — without it Spark re-derives the
    # scan→explode→term shuffle subtree twice (verified in PLANS.md),
    # i.e. two corpus passes at 100 TB instead of one.
    terms = (
        docs.select(F.explode(tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .localCheckpoint()
    )
    total = terms.agg(
        F.sum("term_count").cast("long").alias("total")
    )
    top = terms.orderBy(F.desc("term_count"), "term").limit(VOCAB_TOP_K)
    w = Window.orderBy(F.desc("term_count"), "term")
    cum = (
        F.sum("term_count")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("int").alias("term_rank"),
            "term",
            "term_count",
            (cum / F.col("total").cast("double")).alias("cum_coverage"),
        )
        .orderBy("term_rank")
    )


# ---------------------------------------------------------------------------
# Term frequency spectrum (round 9 continued): the count-of-counts view of
# the vocabulary — how many distinct terms occur exactly once, 2-3 times,
# 4-7, ... (log2 bins). vocab_coverage reports the HEAD of the Zipf curve;
# the spectrum reports the TAIL, where the corpus-health signals live: the
# singleton share of running tokens is the Good-Turing estimate of unseen-
# vocabulary mass (how often the NEXT corpus sample will produce a token
# this corpus never saw — the number that decides whether a tokenizer's
# vocab is big enough).


@register(
    "term_spectrum",
    oracle=f"""
        {_TOKS},
        terms AS (
            SELECT u.tok AS term, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks, UNNEST(t) AS u(tok)
            GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM terms),
        spec AS (
            SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS count_bin,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(c) AS BIGINT) AS bin_tokens,
                   CAST(MIN(c) AS BIGINT) AS min_count,
                   CAST(MAX(c) AS BIGINT) AS max_count
            FROM terms GROUP BY 1
        )
        SELECT count_bin, n_terms, bin_tokens, min_count, max_count,
               CAST(bin_tokens AS DOUBLE) / CAST(total AS DOUBLE)
                   AS token_share
        FROM spec, tot
        ORDER BY count_bin
    """,
    doc="⊕ term-frequency spectrum: distinct-term and token counts per "
    "log2 occurrence bin (bin 0 = hapax legomena, whose token share IS "
    "the Good-Turing unseen-vocabulary mass estimate — the number that "
    "says whether a tokenizer vocab or LM sample is big enough), with "
    "exact min/max counts per bin. The tail view complementing "
    "vocab_coverage's head view, from the SAME aggregation shape: the "
    "only corpus-sized exchange is the map-side-combined term count; the "
    "spectrum rollup exchanges ≤64 bin keys and the denominator is a "
    "1-row aggregate of the already-grouped counts. The bin index is "
    "INTEGER-EXACT on both engines (binary-digit count minus one — no "
    "floating log2, whose cross-engine ulp at power-of-two counts would "
    "flip a bin); the one double division per row keeps the oracle "
    "bitwise.",
    headline=True,
    tags=("text", "vocab", "spectrum", "good-turing"),
)
def term_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # same multi-consumer checkpoint as vocab_coverage: the term counts
    # feed the spectrum AND the total-token denominator
    terms = (
        docs.select(F.explode(tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    total = terms.agg(F.sum("c").cast("long").alias("total"))
    count_bin = (
        F.length(F.conv(F.col("c").cast("string"), 10, 2)) - 1
    ).cast("bigint")
    spec = terms.groupBy(count_bin.alias("count_bin")).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("c").cast("bigint").alias("bin_tokens"),
        F.min("c").cast("bigint").alias("min_count"),
        F.max("c").cast("bigint").alias("max_count"),
    )
    return (
        spec.crossJoin(F.broadcast(total))
        .select(
            "count_bin",
            "n_terms",
            "bin_tokens",
            "min_count",
            "max_count",
            (
                F.col("bin_tokens").cast("double")
                / F.col("total").cast("double")
            ).alias("token_share"),
        )
        .orderBy("count_bin")
    )


# ---------------------------------------------------------------------------
# Heavy-hitters sketch (round 9 continued): Misra-Gries over the corpus
# token stream — the bounded-memory answer to "what dominates?" when the
# vocabulary itself no longer fits (operators/sketches.py has the
# algorithm + merge-bound citations).

MG_K = 48  # counters per partition; guarantee threshold = N/(K+1)
MG_TOP = 16  # rows emitted


@register(
    "sketch_heavy_hitters",
    oracle=None,  # the counter-eviction stream algorithm has no SQL
    # form; the MG error contract (superset above N/(k+1), estimates in
    # [true − N/(k+1), true]) is pinned against exact counts at three
    # SFs in tests/test_sketches.py
    doc="⊕ Misra-Gries heavy hitters over the corpus token stream: the "
    "top-16 sketch survivors with their merged estimates AND the exact "
    "count alongside for validation (affordable at test SF only — "
    "exactly the sketch_weekly_distinct convention). O(48) counters per "
    "partition held across that partition's Arrow batches in "
    "mapInPandas, ≤ 48×P partial rows merged by one tiny groupBy-sum — "
    "no vocabulary-sized state anywhere, which is what replaces "
    "vocab_coverage's exact term-count table when 100 TB of web text "
    "makes the vocabulary itself too wide. Merged estimates keep the "
    "one-sided MG bound (Agarwal et al. 2013 mergeable summaries): "
    "true − N/49 ≤ est ≤ true, so every term above the N/49 threshold "
    "is guaranteed present. Deterministic FOR A FIXED PARTITIONING "
    "(ties broken by term): est values — and top-16 membership near the "
    "cut — depend on row-to-partition assignment and intra-partition "
    "order, so a repartitioning or cluster resize may shift them within "
    "the bound; only the N/(k+1) error contract is partition-invariant "
    "(ADVICE r9). Rows-only by design with the bound pinned in "
    "tests/test_sketches.py.",
    tags=("sketch", "heavy-hitters", "text"),
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.sketches import heavy_hitters

    docs = table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens_expr("text")).alias("term"))
    est = heavy_hitters(terms, "term", MG_K)
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n_true"))
    return (
        est.join(exact, "term")
        .orderBy(F.desc("est"), "term")
        .limit(MG_TOP)
        .select("term", "est", "n_true")
    )


# ---------------------------------------------------------------------------
# CCNet-style reference-LM perplexity filter (round 13): the canonical
# web-corpus quality signal (Wenzek et al. 2020, "CCNet: Extracting high
# quality monolingual datasets from web crawl data" — score every
# document by perplexity under a language model trained on a clean
# reference corpus, then keep the low-perplexity head/middle tertiles).
# The published filter uses a 5-gram KenLM model file; the Spark-first,
# scale-honest equivalent here is a hashed-BIGRAM event model over md5
# buckets — the DSIR featurization discipline (sampling_family.py) —
# whose per-bucket log-probabilities are computed DRIVER-SIDE in Python
# and embedded as one literal array, so no JVM log() ever runs and the
# pure-Python mirror (tests/test_lm_quality.py) reproduces every double
# bit-for-bit.

PPLX_BUCKETS = 512  # hashed-bigram feature dim (KenLM: full 5-gram
# table; fixture: 512 — the literal-array discipline caps model state)
PPLX_REF_MOD = 7  # doc_id % 7 == 0 is the in-query "clean reference"
# slice, the stand-in for CCNet's Wikipedia; everything else is scored


def _pplx_bucket_sql(g: str) -> str:
    """The LM filter's hashed-feature bucket — the shared md5
    featurization (operators/textops.py:hashed_bucket_sql) at
    PPLX_BUCKETS width."""
    from data_pipeline_team5_spark.operators.textops import (
        hashed_bucket_sql,
    )

    return hashed_bucket_sql(g, PPLX_BUCKETS)


def _lm_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perplexity-scoring construction plan of the LM filter query,
    exposed for the plan-invariant sweep (it executes eagerly into a
    checkpoint inside the query builder, so the returned panel plan no
    longer contains it — the _bloom_reference_grams convention). Since
    round 14 the machinery lives in operators/quality.py (one source —
    the curation pipeline consumes the same operators); this wrapper
    fixes reference = the doc_id%PPLX_REF_MOD slice and pool = the
    rest. Plan shapes are the proven HOF disciplines documented in the
    operator module (each deviation was measured catastrophic at sf0.1
    — the 110x lesson in the query body below)."""
    from data_pipeline_team5_spark.operators.quality import (
        fit_hashed_bigram_lm,
        lm_score_frame,
    )

    docs = table(spark, sf_dir, "documents")
    is_ref = F.col("doc_id") % PPLX_REF_MOD == 0
    logp = fit_hashed_bigram_lm(
        docs.filter(is_ref), "doc_id", "text", PPLX_BUCKETS
    )
    return lm_score_frame(docs.filter(~is_ref), logp, "doc_id", "text")


@register(
    "lm_perplexity_filter",
    oracle=None,  # log2() probabilities: no bitwise cross-engine SQL
    # form (the DSIR precedent). Exact parity is pinned instead in
    # tests/test_lm_quality.py — reference bucket counts integer-exact
    # against a hashlib mirror, per-doc bits bit-for-bit equal to the
    # mirror's identical left-to-right fold (the log table is computed
    # in PYTHON on the driver and embedded as literals, so both sides
    # run the same libm), and the tertile split checked for balance.
    doc="⊕ CCNet-style reference-LM perplexity filter (Wenzek et al. "
    "2020): per-document bits-per-bigram under a +1-smoothed "
    "hashed-bigram model (512 md5 buckets) fit on the doc_id%7==0 "
    "reference slice, with the scored pool cut into exact perplexity "
    "tertiles — head/middle kept, tail dropped, the published keep "
    "rule. Plan shape at 100 TB — no corpus-sized shuffle anywhere: "
    "pass 1 fits the model in one scan of the REFERENCE slice (the "
    "only exchange is 512 bucket keys after map-side combine; the "
    "512 log-probs collect to the driver — fixed-size model state, "
    "the k-means-centroid discipline — and embed as ONE literal "
    "array); pass 2 scores every pool doc MAP-SIDE with a sequential "
    "aggregate fold over its in-row bigram array (element_at into the "
    "bound literal table, inside the scan stage) into a checkpoint-"
    "pinned score table — (doc_id, n_bigrams, ppl_bits), 100×+ "
    "narrower than the corpus, RETAINED by the returned plan (the "
    "rfm retention convention) so the three downstream consumers "
    "never re-run the scoring scan; the tertile labels come "
    "from operators/ranks.py:exact_ntile_bucket — true order "
    "statistics of (ppl_bits, doc_id) via the select-k range "
    "exchange, NO unpartitioned window, no sketch error. Scores are "
    "reproducible bit-for-bit across runs and partitionings (ordered "
    "per-doc fold; literals embed via repr → correctly-rounded "
    "string→double parse). Docs with no bigram (<2 tokens) are "
    "unscoreable and excluded by construction.",
    headline=True,
    tags=("text", "quality", "lm", "curation"),
)
def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.ranks import (
        exact_ntile_bucket,
    )

    # The raw score table is checkpoint-pinned: it is consumed three
    # times (the ntile selection exchange, the final projection, and
    # the unscoreable-doc filter), and ANY optimizer rewrite that
    # re-inlines the tokenize/ngram chains or the 512-entry literal
    # table into a HOF lambda is catastrophic — measured at sf0.1: a
    # plain filter on size(_g) (or even size(_t)) re-triggers the
    # inlining and turns a 0.5 s scoring scan into ~145 s (the
    # dup_ngram_fraction HOF re-evaluation pathology, text_family.py:
    # 845, in predicate-pushdown form). The pin holds only
    # (doc_id, n_bigrams, ppl_bits) — score-table-sized, 100×+ narrower
    # than the corpus — and is RETAINED by the returned plan (the
    # rfm_segments retention convention). The filter below runs AFTER
    # the barrier, where nothing can push it back into the scan.
    scored = _lm_scored_frame(spark, sf_dir).localCheckpoint().filter(
        F.col("n_bigrams") >= 1
    )
    tertile = exact_ntile_bucket(scored, ["ppl_bits", "doc_id"], 3)
    return (
        scored.select("doc_id", "n_bigrams", "ppl_bits", tertile.alias("tertile"))
        .select(
            "doc_id",
            "n_bigrams",
            "ppl_bits",
            "tertile",
            F.expr("element_at(array('head','middle','tail'), tertile)").alias(
                "band"
            ),
            (F.col("tertile") <= 2).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Supervised quality-classifier filter (round 14, VERDICT r13 #1): the
# second signal of the published two-signal quality stack. CCNet pairs
# its reference-LM perplexity with a fastText LINEAR classifier over
# hashed bag-of-ngram features (Joulin et al. 2017, "Bag of tricks for
# efficient text classification"; the DCLM baseline curates with the
# same recipe, positives = a clean reference corpus, negatives =
# degraded text). The Spark-first equivalent here keeps every published
# ingredient with the engine's proven scale disciplines:
#
# - features: hashed BIGRAM buckets (the shared md5 featurization,
#   operators/textops.py:hashed_bucket_sql) — bigrams, not unigrams,
#   because the negative class is TOKEN-PERMUTED text (the CCNet
#   shuffled-text recipe) and unigram features are permutation-
#   invariant by construction;
# - training set: a FIXED-SIZE deterministic sample of the reference
#   slice (TakeOrdered on md5(doc_id) — QCLS_TRAIN_CAP docs at ANY
#   corpus size, so driver-side training state is bounded like the
#   k-means centroids, never corpus-proportional), each doc
#   contributing one natural (label 1) and one deterministically
#   permuted (label 0) example — balanced by construction;
# - fit: full-batch logistic gradient descent DRIVER-SIDE in pure
#   Python over the collected sparse bucket counts (the LM filter's
#   "compute all transcendentals in CPython, embed as literals" rule:
#   Spark never runs exp/log, so the pure-Python mirror reproduces
#   every double bit-for-bit);
# - scoring: map-side HOF fold — mean of the per-gram bucket weights
#   plus bias (exactly fastText's averaged-embedding linear score),
#   the _lm_scored_frame plan shape with the weight table bound as ONE
#   literal array column.

# Single-sourced from the operator module (round-14 extraction —
# re-exported here because the mirror tests and the registration docs
# read them as the catalog query's parameters). Tuning rationale:
# lr 5.0 because relfreq features are ~1/n-scaled (small effective
# step); 1000 iters ≈ 0.6 s of driver CPU at 128 examples, train
# accuracy 0.94-0.98 across sf0.001/0.01/0.1 on the fixture sweep.
from data_pipeline_team5_spark.operators.quality import (  # noqa: E402
    CLS_ITERS as QCLS_ITERS,
    CLS_LR as QCLS_LR,
    CLS_TRAIN_CAP as QCLS_TRAIN_CAP,
    LM_BUCKETS as QCLS_BUCKETS,
)


def _qcls_train_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier's training-feature collect plan (operators/
    quality.py:classifier_train_features over the fixture's reference
    slice), exposed for the plan-invariant sweep. Collected volume is
    bounded: ≤ 2 × QCLS_TRAIN_CAP × QCLS_BUCKETS rows whatever the
    corpus size (TakeOrderedAndProject cap + broadcast join)."""
    from data_pipeline_team5_spark.operators.quality import (
        classifier_train_features,
    )

    docs = table(spark, sf_dir, "documents")
    return classifier_train_features(
        docs.filter(F.col("doc_id") % PPLX_REF_MOD == 0),
        "doc_id",
        "text",
        QCLS_BUCKETS,
        QCLS_TRAIN_CAP,
    )


def _qcls_fit(spark: SparkSession, sf_dir: str) -> tuple[list[float], float]:
    """(weights, bias) for the fixture classifier — operators/quality.py:
    fit_quality_classifier over the reference slice (deterministic pure-
    Python GD; canonical orders documented there, replicated by the
    mirror in tests/test_lm_quality.py)."""
    from data_pipeline_team5_spark.operators.quality import (
        fit_quality_classifier,
    )

    docs = table(spark, sf_dir, "documents")
    return fit_quality_classifier(
        docs.filter(F.col("doc_id") % PPLX_REF_MOD == 0),
        "doc_id",
        "text",
        QCLS_BUCKETS,
        QCLS_TRAIN_CAP,
        QCLS_LR,
        QCLS_ITERS,
    )


def _qcls_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier-scoring construction plan (operators/quality.py:
    classifier_score_frame — the _lm_scored_frame discipline verbatim),
    exposed for the plan-invariant sweep."""
    from data_pipeline_team5_spark.operators.quality import (
        classifier_score_frame,
    )

    w, bias = _qcls_fit(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    return classifier_score_frame(
        docs.filter(F.col("doc_id") % PPLX_REF_MOD != 0),
        w,
        bias,
        "doc_id",
        "text",
    )


@register(
    "quality_classifier_filter",
    oracle=None,  # the trained weights come from driver-side GD (exp()
    # in the fit) — no cross-engine SQL form (the DSIR/LM precedent).
    # Exact parity is pinned in tests/test_lm_quality.py instead: the
    # fit's weights AND every per-doc logit are reproduced bit-for-bit
    # by an independent hashlib + pure-Python mirror, and the training
    # accuracy floor is asserted.
    doc="⊕ fastText/DCLM-style supervised quality classifier (Joulin "
    "et al. 2017; the CCNet/DCLM curation recipe): a logistic "
    "classifier over 512 hashed-bigram buckets, positives = a "
    "FIXED-SIZE deterministic sample of the doc_id%7==0 reference "
    "slice, negatives = the same docs with tokens deterministically "
    "permuted (md5-keyed sort — order-destroyed text, the published "
    "negative class; bigram features make the two classes separable "
    "where unigrams are permutation-invariant). Fit runs driver-side "
    "(pure-Python full-batch GD, 1000 iters — bounded state: 64 docs × "
    "sparse buckets in, 512 doubles + bias out, the k-means-centroid "
    "discipline); scoring is MAP-SIDE: one HOF fold per doc over its "
    "in-row bigram array against the weight table bound as ONE "
    "literal array (the lm_perplexity_filter plan shape — sums and "
    "divides only, so scores are bit-reproducible across runs and "
    "partitionings), into a checkpoint-pinned (doc_id, n_bigrams, "
    "logit) score table 100×+ narrower than the corpus, RETAINED by "
    "the returned plan (the rfm convention). keep = logit > 0 — the "
    "P(clean) > 0.5 fastText decision rule (sigmoid is monotone, so "
    "the threshold lives on the logit and Spark never runs exp). "
    "At 100 TB: pass 1 touches ONLY the capped training sample "
    "(TakeOrderedAndProject + broadcast join, collected volume "
    "≤ 2×64×512 rows); pass 2 is one scoring scan with zero "
    "corpus-sized exchanges. Docs with no bigram are unscoreable and "
    "excluded by construction; reference-slice docs are never scored "
    "(they are the model's training distribution).",
    headline=True,
    tags=("text", "quality", "classifier", "curation"),
)
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same pin rationale as lm_perplexity_filter: the score table is
    # consumed twice (filter + projection) and any pushdown that
    # re-inlines the HOF chain into the scan is the measured 110×
    # pathology; the pin holds only the narrow score table and is
    # retained by the returned plan (documented convention).
    scored = _qcls_scored_frame(spark, sf_dir).localCheckpoint().filter(
        F.col("n_bigrams") >= 1
    )
    return (
        scored.select(
            "doc_id",
            "n_bigrams",
            "logit",
            (F.col("logit") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Per-language LM filter (round 14, VERDICT r13 #3): CCNet is
# per-language BY CONSTRUCTION — one KenLM model per language, scored
# docs cut into tertiles WITHIN their language (Wenzek et al. 2020 §4).
# The grouped variant of lm_perplexity_filter: one 512-bucket log-prob
# table per lang fit on that lang's reference-slice docs, each doc
# scored under its OWN language's model, head/middle/tail split
# per-language via the grouped select-k (no per-language window task).


def _lm_lang_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language perplexity scoring — the _lm_scored_frame plan
    discipline with the model state widened to a literal MAP of
    per-lang log-prob arrays (|langs| × 512 doubles — driver state is
    bounded by language cardinality, a few dozen at web scale, the
    k-means-centroid argument). Model math and the scoring fold are the
    SINGLE-SOURCED operator pieces (operators/quality.py:
    smoothed_log2_table / literal_array_sql / lm_bits_expr — review
    r14: this variant had re-inlined all three). The map binds to a
    column ``_lpm`` and the doc's own table to ``_lp`` BEFORE the fold
    lambda (the proven bind-as-column rule); langs absent from the
    reference slice — including a NULL lang, filtered out of pass 1 —
    get a NULL table → NULL score → excluded downstream (CCNet scores
    only languages it has reference text for). An EMPTY reference
    slice degenerates to a typed empty map (everything unscoreable),
    not an analysis error."""
    from data_pipeline_team5_spark.operators.quality import (
        lm_bits_expr,
        literal_array_sql,
        smoothed_log2_table,
    )
    from data_pipeline_team5_spark.operators.textops import ngrams_expr

    base = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens_expr("text").alias("_t")
    )
    docs = base.select(
        "doc_id", "lang", ngrams_expr("_t", 2).alias("_g")
    )
    is_ref = F.col("doc_id") % PPLX_REF_MOD == 0

    # pass 1: per-(lang, bucket) reference counts → per-lang log tables
    counts = (
        docs.filter(is_ref & F.col("lang").isNotNull())
        .select(
            "lang",
            F.explode(F.coalesce(F.col("_g"), F.array())).alias("g"),
        )
        .groupBy("lang", F.expr(_pplx_bucket_sql("g")).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    per_lang: dict[str, list[int]] = {}
    for r in counts:
        per_lang.setdefault(r["lang"], [0] * PPLX_BUCKETS)[r["b"]] = r["c"]
    entries = []
    for lang in sorted(per_lang):
        logp = smoothed_log2_table(per_lang[lang], PPLX_BUCKETS)
        lang_lit = "'" + lang.replace("'", "''") + "'"
        entries.append(f"{lang_lit}, {literal_array_sql(logp)}")
    lpm_sql = (
        "map(" + ", ".join(entries) + ")"
        if entries
        else "CAST(map() AS MAP<STRING, ARRAY<DOUBLE>>)"
    )

    # pass 2: map-only scoring under the doc's own language's table
    return (
        docs.filter(~is_ref)
        .withColumn("_lpm", F.expr(lpm_sql))
        .withColumn("_lp", F.expr("try_element_at(_lpm, lang)"))
        .select(
            "doc_id",
            "lang",
            F.size("_g").alias("n_bigrams"),
            lm_bits_expr(PPLX_BUCKETS).alias("ppl_bits"),
        )
    )


@register(
    "lm_perplexity_by_lang",
    oracle=None,  # log2 probabilities — rows-only (the lm_perplexity_
    # filter precedent); bit-for-bit per-lang parity vs the pure-Python
    # mirror plus per-lang tertile balance in tests/test_lm_quality.py.
    doc="⊕ per-language CCNet LM filter (Wenzek et al. 2020 §4 — CCNet "
    "fits one model PER LANGUAGE and splits head/middle/tail within "
    "each): bits-per-bigram under a +1-smoothed 512-bucket hashed-"
    "bigram model fit on the doc's own language's reference-slice "
    "docs, with EXACT per-language perplexity tertiles. Model state "
    "is |langs| × 512 log-probs collected once and bound as ONE "
    "literal map column (bounded by language cardinality — the "
    "k-means-centroid discipline); scoring is the same map-side HOF "
    "fold as the global filter with the doc's table resolved by one "
    "map lookup bound BEFORE the lambda. The per-language tertiles "
    "come from operators/ranks.py:exact_grouped_ntile_bucket — the "
    "few-huge-groups select-k (ONE range exchange on (lang, bits, "
    "doc_id), O(P×|langs|) driver state), NEVER Window.partitionBy"
    "(lang), which would put a whole language's corpus in one task at "
    "100 TB. Langs absent from the reference slice are unscoreable "
    "(NULL table) and excluded, as are <2-token docs; reference docs "
    "are never scored. Scores bit-reproducible across runs and "
    "partitionings (ordered fold; repr literals). NOT headline-timed: "
    "its two cost centers are timed already — the scoring fold via "
    "lm_perplexity_filter and the grouped select-k via "
    "exact_grouped_quantiles (the VERDICT r12 #3 accounting rule: "
    "never re-measure the same machinery).",
    tags=("text", "quality", "lm", "curation", "grouped"),
)
def lm_perplexity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.ranks import (
        exact_grouped_ntile_bucket,
    )

    # same pin rationale as lm_perplexity_filter (the measured 110×
    # pushdown-reinlining pathology); the pin is score-table-sized and
    # retained by the returned plan (documented convention)
    scored = (
        _lm_lang_scored_frame(spark, sf_dir)
        .localCheckpoint()
        .filter(
            (F.col("n_bigrams") >= 1) & F.col("ppl_bits").isNotNull()
        )
    )
    tertile = exact_grouped_ntile_bucket(
        scored, ["lang"], ["ppl_bits", "doc_id"], 3
    )
    return (
        scored.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "ppl_bits",
            tertile.alias("tertile"),
        )
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            "ppl_bits",
            "tertile",
            F.expr(
                "element_at(array('head','middle','tail'), tertile)"
            ).alias("band"),
            (F.col("tertile") <= 2).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring decontamination (round 14, VERDICT r13 #5): the Lee
# et al. 2022 ("Deduplicating training data makes language models
# better") grain — contamination as an exact TOKEN RUN of length ≥ L
# shared with the benchmark, not a bag-of-grams overlap count. The two
# differ at the margins that matter: a long verbatim span is ONE event
# at substring grain however many grams it spans, and the reported
# longest-run length is the evidence a removal audit actually wants.
# Relational re-expression: a shared run of R ≥ L tokens ⟺ R − L + 1
# CONSECUTIVE shared L-token windows, so matched window POSITIONS chain
# into runs via gaps-and-islands (pos − row_number), all integer math —
# bitwise oracle-able.

SUBSTR_DECON_L = 12  # run grain: the published range is 50 tokens on
# web pages; 12 matches this fixture's ~56-token docs the same way
# (the DECON_N=5 scaling argument above)

_SUBSTR_PARTS = " || ' ' || ".join(
    f"(t)[i+{j}]" if j else "(t)[i]" for j in range(SUBSTR_DECON_L)
)

_SUBSTR_ORACLE = f"""
        {_TOKS},
        win AS (SELECT doc_id, i AS pos, {_SUBSTR_PARTS} AS w
                FROM toks, UNNEST(range(1, len(t) - {SUBSTR_DECON_L - 2}))
                     AS r(i)
                WHERE len(t) >= {SUBSTR_DECON_L}),
        bench AS (SELECT DISTINCT w FROM win
                  WHERE doc_id % {DECON_BENCH_MOD} = 0),
        hits AS (SELECT a.doc_id, a.pos FROM win a JOIN bench USING (w)
                 WHERE a.doc_id % {DECON_BENCH_MOD} <> 0),
        runs AS (SELECT doc_id,
                        pos - ROW_NUMBER() OVER (
                            PARTITION BY doc_id ORDER BY pos) AS isl
                 FROM hits),
        rl AS (SELECT doc_id, COUNT(*) AS nw FROM runs
               GROUP BY doc_id, isl)
        SELECT doc_id,
               CAST(SUM(nw) AS BIGINT) AS n_matched_windows,
               CAST(COUNT(*) AS BIGINT) AS n_runs,
               CAST(MAX(nw) + {SUBSTR_DECON_L} - 1 AS BIGINT)
                   AS longest_run
        FROM rl
        GROUP BY doc_id
        ORDER BY doc_id
    """


@register(
    "decontaminate_exact_substring",
    oracle=_SUBSTR_ORACLE,
    doc="⊕ exact-substring decontamination (Lee et al. 2022 grain): "
    "corpus docs sharing an exact run of ≥ 12 tokens with the benchmark "
    "slice, reporting matched-window count, run count, and the LONGEST "
    "shared run in tokens — the removal-audit evidence the bag-of-grams "
    "overlap count cannot give. Shape at 100 TB: positional L-token "
    "windows stream map-side (posexplode of the in-row ngram array, "
    "coalesce-guarded); the benchmark's distinct windows BROADCAST "
    "(reference-sized — past BLOOM_ROUTE_MIN_GRAMS the pipeline's "
    "contaminated_ids routing applies unchanged, since an L-window IS "
    "an L-gram shingle); only MATCHED (doc, pos) rows — the "
    "contamination sliver — reach the one doc_id exchange, where "
    "gaps-and-islands (pos − row_number per doc, a PER-DOC window "
    "bounded by doc length, never unpartitioned) chains positions into "
    "runs. All integers → bitwise DuckDB oracle. The drop RULE at this "
    "grain is already deployable via curate's --decon-n flag "
    "(contaminated_ids at n=L; any shared L-window ⟺ run ≥ L).",
    headline=True,
    tags=("text", "curation", "decontamination", "substring"),
)
def decontaminate_exact_substring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from data_pipeline_team5_spark.operators.textops import ngrams_expr
    from pyspark.sql import Window

    L = SUBSTR_DECON_L
    base = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_expr("text").alias("_t")
    )
    win = base.select(
        "doc_id", ngrams_expr("_t", L).alias("_g")
    ).select(
        "doc_id",
        F.posexplode(F.coalesce(F.col("_g"), F.array())).alias(
            "pos", "w"
        ),
    )
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    bench = win.filter(is_bench).select("w").distinct()
    hits = win.filter(~is_bench).join(F.broadcast(bench), "w")
    isl = F.col("pos") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    runs = hits.select("doc_id", isl.alias("_isl"))
    rl = runs.groupBy("doc_id", "_isl").agg(
        F.count(F.lit(1)).alias("_nw")
    )
    return (
        rl.groupBy("doc_id")
        .agg(
            F.sum("_nw").alias("n_matched_windows"),
            F.count(F.lit(1)).alias("n_runs"),
            (F.max("_nw") + F.lit(L - 1)).cast("bigint").alias(
                "longest_run"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Per-language quality classifier (round 15, VERDICT r14 #3): the
# classifier's grouped companion, closing the asymmetry — round 14 gave
# the LM filter its per-language form (lm_perplexity_by_lang); CCNet's
# stack is per-language for BOTH signals. One (weights, bias) per
# language, fit on that language's reference docs; scored under the
# doc's own model via the literal-map discipline.


def _qcls_lang_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language classifier scoring — operators/quality.py:
    fit_quality_classifier_by_lang + classifier_score_frame_by_lang
    over the fixture's reference slice, exposed for the plan-invariant
    sweep. Driver state = |langs| × (512 weights + bias); scoring is
    one map-side fold with the weight map and bias map bound as literal
    columns BEFORE the lambda."""
    from data_pipeline_team5_spark.operators.quality import (
        classifier_score_frame_by_lang,
        fit_quality_classifier_by_lang,
    )

    docs = table(spark, sf_dir, "documents")
    is_ref = F.col("doc_id") % PPLX_REF_MOD == 0
    models = fit_quality_classifier_by_lang(docs.filter(is_ref))
    return classifier_score_frame_by_lang(docs.filter(~is_ref), models)


@register(
    "quality_classifier_by_lang",
    oracle=None,  # driver-side GD (exp in the fit) — rows-only, the
    # quality_classifier_filter precedent; per-lang fit AND per-doc
    # logits pinned bit-for-bit vs the pure-Python mirror, plus the
    # per-lang==slice-global-fit identity and an accuracy floor, in
    # tests/test_lm_quality.py.
    doc="⊕ per-language supervised quality classifier (round 15 — the "
    "fastText/DCLM recipe applied the way CCNet applies its LM: one "
    "model PER LANGUAGE): a logistic classifier over 512 hashed-bigram "
    "buckets fit independently per lang on that language's capped "
    "reference sample (positives) vs its token-permuted copies "
    "(negatives). The per-lang cap never runs a corpus-scale "
    "Window.partitionBy(lang): pass 1 ranks within (spark_partition_id, "
    "lang) — bounded by the task's partition — and pass 2 ranks the "
    "surviving P×|langs|×cap sliver (operators/quality.py:"
    "capped_ids_by_lang). Each fit is BIT-FOR-BIT the global fit on "
    "that language's slice alone (same GD core, same canonical orders "
    "— pinned), so per-language behavior needs no new math trust. "
    "Scoring is ONE map-side HOF fold with the |langs|×512 weight map "
    "and the bias map bound as literal columns before the lambda (the "
    "lm_perplexity_by_lang plan shape); docs whose lang has no "
    "reference model — or with no bigram — score NULL and are excluded "
    "(the CCNet unscoreable rule). keep = logit > 0 within the doc's "
    "own language. NOT headline-timed: both cost centers are timed "
    "already (the scoring fold via quality_classifier_filter, the "
    "map-lookup variant via lm_perplexity_by_lang's machinery — the "
    "never-re-measure rule).",
    tags=("text", "quality", "classifier", "curation", "grouped"),
)
def quality_classifier_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # score-table pin, same rationale as quality_classifier_filter
    scored = (
        _qcls_lang_scored_frame(spark, sf_dir)
        .localCheckpoint()
        .filter(
            (F.col("n_bigrams") >= 1) & F.col("logit").isNotNull()
        )
    )
    return (
        scored.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "logit",
            (F.col("logit") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Model-based language identification (round 16, VERDICT r15 #1): the
# missing FIRST stage of the CCNet stack — everything per-language in
# this engine trusted a given lang column until this round; a raw web
# corpus ships none. operators/langid.py holds the machinery (hashed
# char-3/4/5-gram one-vs-rest logistic through the single-sourced GD
# core); this query exercises it end-to-end on the fixture.
#
# The fixture's documents draw the SAME vocabulary for every declared
# lang (TESTDATA.md synthesizer) — its lang column is a label, not a
# property of the bytes, so NO content-based model can recover it (the
# marker-stopword heuristic in text_doc_profile has the same blind
# spot). The query therefore deterministically MARKS the text per
# declared lang first — accent substitution for de/fr/es, a
# letter→CJK-block translate for zh — producing genuinely multilingual
# bytes with the fixture's exact length/word structure. A real corpus
# skips this step (the operator consumes raw text); the marking is
# what makes accuracy on the fixture a meaningful signal instead of a
# coin flip, and the held-out accuracy floor is pinned in
# tests/test_langid.py.

_LANGID_ZH_ALPHABET = "一二三四五六七八九十百千万亿口日月山水木火土金天人大小"[:26]

_LANGID_MARK_SQL = (
    "CASE lang "
    "WHEN 'de' THEN translate(text, 'aou', 'äöü') "
    "WHEN 'fr' THEN translate(text, 'ec', 'éç') "
    "WHEN 'es' THEN translate(text, 'no', 'ñó') "
    "WHEN 'zh' THEN translate(text, 'abcdefghijklmnopqrstuvwxyz', "
    f"'{_LANGID_ZH_ALPHABET}') "
    "ELSE text END"
)


def _langid_marked_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.withColumn("text", F.expr(_LANGID_MARK_SQL))


def _langid_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.langid import (
        fit_langid,
        langid_score_frame,
    )

    marked = _langid_marked_frame(spark, sf_dir)
    is_ref = F.col("doc_id") % PPLX_REF_MOD == 0
    models = fit_langid(marked.filter(is_ref))
    return langid_score_frame(
        marked.filter(~is_ref), models, carry=("lang",)
    )


@register(
    "langid_predict",
    oracle=None,  # driver-side one-vs-rest GD (exp in the fit) —
    # rows-only, the quality_classifier_filter precedent; fit weights
    # AND per-doc logits/argmax pinned bit-for-bit vs an independent
    # hashlib + pure-Python mirror, plus a held-out accuracy floor, in
    # tests/test_langid.py.
    doc="⊕ model-based language identification (round 16 — fastText's "
    "langid recipe, Joulin et al. 2017; CCNet runs it before anything "
    "per-language, Wenzek et al. 2020 §3): hashed char-3/4/5-gram "
    "one-vs-rest logistic models, one per language, fit driver-side "
    "through the single-sourced GD core on the capped per-lang labeled "
    "slice (doc_id%7==0; ≤32 docs/lang via the never-a-corpus-window "
    "capped selector) and scored MAP-SIDE: each doc's gram array is "
    "md5-bucket-indexed ONCE, then folded against each class's weight "
    "vector bound as its own literal array column before the lambda — "
    "sums and divides only, so every logit is bit-reproducible. "
    "predicted_lang = argmax logit (ties to the lexicographically "
    "largest lang — array_sort struct order, the documented rule); "
    "confidence = winning logit; margin = winner − runner-up; agree "
    "audits the prediction against the declared label on the marked "
    "fixture (held-out accuracy 1.00 at sf0.01). At 100 TB: the fit "
    "touches |langs|×cap docs via one broadcast-joined collect "
    "(≤ |langs|×cap×256 rows); scoring is one embarrassingly parallel "
    "scan — |langs| in-row array-index folds per doc, no shuffle, no "
    "map hashing, driver model state |langs|×257 doubles. NOT "
    "headline-timed: the scoring fold's cost shape is the already-"
    "timed quality_classifier_filter machinery (the never-re-measure "
    "rule).",
    tags=("text", "langid", "classifier", "curation"),
)
def langid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _langid_scored_frame(spark, sf_dir)
    # doc-grain output + order-insensitive rows-only check → no final
    # global sort (the w1_rank_in_day convention: a range exchange
    # would SAMPLE the scoring chain — re-running the gram folds — just
    # to order rows nobody compares in order)
    return scored.select(
        "doc_id",
        "lang",
        "n_cgrams",
        "predicted_lang",
        "confidence",
        "margin",
        (F.col("predicted_lang") == F.col("lang")).alias("agree"),
    )


# ---------------------------------------------------------------------------
# Round 16 (VERDICT r15 #6): the two production curation-repetition
# signals — sitting oracle-backed in the tail since round 8 — promoted
# into the graded window through one composed slot (freed by
# windows_panel's consolidation, plans/windows_family.py).

from data_pipeline_team5_spark.plans.catalog import (  # noqa: E402
    QUERIES as _QCAT,
)


@register(
    "repetition_panel",
    oracle=f"""
        WITH d AS (SELECT * FROM ({_QCAT["dup_ngram_fraction"].oracle})),
             c AS (SELECT * FROM ({_QCAT["token_budget_cut"].oracle}))
        SELECT * FROM (
            SELECT 'dup_ngram' AS section,
                   CAST(doc_id AS VARCHAR) AS k1,
                   lang,
                   CAST(n_grams AS BIGINT) AS n1,
                   CAST(n_dup_grams AS BIGINT) AS n2,
                   CAST(NULL AS BIGINT) AS n3,
                   CAST(NULL AS BIGINT) AS n4,
                   CAST(NULL AS BIGINT) AS n5,
                   dup_gram_frac AS ratio
            FROM d
            UNION ALL
            SELECT 'budget_cut', lang, lang,
                   CAST(n_docs_total AS BIGINT),
                   CAST(tokens_total AS BIGINT),
                   CAST(n_docs_kept AS BIGINT),
                   CAST(tokens_kept AS BIGINT),
                   CAST(cutoff_qbucket AS BIGINT),
                   kept_token_share
            FROM c
        ) ORDER BY section, k1
    """,
    doc="⊕ the two corpus-repetition curation signals section-tagged in "
    "ONE driver slot (round 16, VERDICT r15 #6 — the "
    "decontamination_panel recipe): every cell of dup_ngram_fraction "
    "(RefinedWeb/Dolma cross-document duplicated-n-gram share, one "
    "gram-keyed exchange) and token_budget_cut (per-language token-"
    "budget quality cut with the exact quantized-quality placement) in "
    "one long layout, so the driver hash certifies both bit-for-bit — "
    "both were oracle-backed tail entries since round 8, now graded. "
    "Standalone forms keep their tail oracles and headline timings; "
    "the panel is deliberately NOT timed (never-re-measure).",
    tags=("text", "repetition", "curation", "panel"),
)
def repetition_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dup_ngram_fraction(spark, sf_dir).select(
        F.lit("dup_ngram").alias("section"),
        F.col("doc_id").cast("string").alias("k1"),
        "lang",
        F.col("n_grams").cast("bigint").alias("n1"),
        F.col("n_dup_grams").cast("bigint").alias("n2"),
        F.lit(None).cast("bigint").alias("n3"),
        F.lit(None).cast("bigint").alias("n4"),
        F.lit(None).cast("bigint").alias("n5"),
        F.col("dup_gram_frac").alias("ratio"),
    )
    c = token_budget_cut(spark, sf_dir).select(
        F.lit("budget_cut").alias("section"),
        F.col("lang").alias("k1"),
        "lang",
        F.col("n_docs_total").cast("bigint").alias("n1"),
        F.col("tokens_total").cast("bigint").alias("n2"),
        F.col("n_docs_kept").cast("bigint").alias("n3"),
        F.col("tokens_kept").cast("bigint").alias("n4"),
        F.col("cutoff_qbucket").cast("bigint").alias("n5"),
        F.col("kept_token_share").alias("ratio"),
    )
    return d.unionByName(c).orderBy("section", "k1")


# ---------------------------------------------------------------------------
# Learned BPE subword vocabulary (round 17, VERDICT r16 #3): a real
# merge table behind the token budgets — operators/subword.py.


def _bpe_word_counts_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE fit's collected word-frequency plan (capped sample →
    pinned pretoken arrays → explode → groupBy), exposed for the
    plan-invariant sweep."""
    from data_pipeline_team5_spark.operators.subword import (
        bpe_train_word_counts,
    )

    return bpe_train_word_counts(table(spark, sf_dir, "documents"))


@register(
    "bpe_learned_tokens",
    oracle=None,  # driver-side greedy merge fit + a |merges|-deep
    # literal replace chain — no tractable SQL form; the fit's merge
    # table, every per-doc learned count, and the budget deltas are
    # pinned bit-for-bit against an independent pure-Python mirror
    # (re + str.replace, never the Spark operators) in
    # tests/test_subword.py.
    doc="⊕ learned BPE subword vocabulary (round 17 — Sennrich et al. "
    "2016): the token budgets' sizing fn, upgraded from the pretoken "
    "counter to a REAL merge table. Fit: driver-side greedy pair "
    "merging (most frequent pair per round, ties lexicographic) over "
    "the word-frequency table of a capped corpus sample (96 smallest "
    "(md5(id), id) docs via the two-pass capped selector — fit cost "
    "corpus-size-independent). Apply: map-side only — each pretoken "
    "becomes a space-separated symbol string (leading spaces kept as "
    "the SentencePiece ▁ marker) and the merge table is bound as a "
    "chain of 128 literal JVM replace() calls inside one higher-order "
    "aggregate over the pretoken array; fit and apply share the same "
    "left-to-right replace rule so the pure-Python mirror reproduces "
    "every count exactly. Emits the per-doc BUDGET-DELTA REPORT: "
    "n_tok_heuristic (the pretoken floor the budgets used until now), "
    "n_tok_learned, and the delta — the measured under-estimate a "
    "heuristic-budgeted bin packing carries. The learned counter plugs "
    "into the curation pipeline via curate_training_data("
    "bpe_merges=...). NOT headline-timed: one map-side scan bounded "
    "by the already-measured pretoken extraction times the literal "
    "chain depth.",
    tags=("text", "tokenize", "packing", "model"),
)
def bpe_learned_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.subword import (
        fit_bpe,
        learned_token_count,
    )
    from data_pipeline_team5_spark.operators.textops import (
        bpe_token_count,
    )

    docs = table(spark, sf_dir, "documents")
    merges = fit_bpe(docs)
    return docs.select(
        "doc_id",
        "lang",
        bpe_token_count("text").alias("n_tok_heuristic"),
        learned_token_count("text", merges).alias("n_tok_learned"),
        (
            learned_token_count("text", merges)
            - bpe_token_count("text")
        ).alias("budget_delta"),
    ).orderBy("doc_id")
