"""Text-analysis operators for LLM training-data pipelines (north star ⊕).

The reference stores documents only as VARCHAR columns (SURVEY.md §1.2); a
100 TB training-data pipeline additionally needs per-document language ID,
quality scoring, token statistics, and fingerprints (BASELINE.json north
star). Everything here is JVM-side ``pyspark.sql.functions`` — tokenization
via ``split``, set ops via ``array_distinct``/``filter``, hashes via
``md5``/``aggregate`` folds — so the hot path never leaves whole-stage
codegen, and every operator has a DuckDB-expressible oracle (the ``*_SQL``
fragments kept adjacent).

Scale notes:
- all operators are embarrassingly row-parallel (no shuffle at all): at
  100 TB they run map-side inside the parquet scan stage.
- per-doc dedup of tokens/shingles uses ``array_distinct`` (in-memory,
  per-row) — never ``.distinct()`` (a shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import norm_text, norm_text_sql

# Marker stopwords per language for the n-gram/marker language-ID heuristic.
# Order = deterministic argmax tiebreak order (first wins on equal counts).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "in", "to", "is"]),
    ("de", ["der", "die", "das", "und", "ist", "ein"]),
    ("fr", ["le", "la", "les", "et", "est", "une"]),
    ("es", ["el", "los", "las", "y", "es", "una"]),
]

# Chinese (VERDICT r4 next-round #5): zh text is not whitespace-tokenized,
# so token-EQUALITY markers can never fire — a zh "token" is a whole run of
# characters. Markers are therefore the most common zh function-word
# CHARACTERS, matched INSIDE tokens with an (unanchored) regex char class;
# Java regex and DuckDB's RE2 both treat the literal UTF-8 class
# identically. These chars don't join the quality stop list (token-equality
# there — they would be dead entries), so quality/stop_ratio are unchanged.
ZH_MARKERS = ["的", "了", "是", "在", "我", "有", "和", "不", "人", "这"]
ZH_MARKER_CLASS = "[" + "".join(ZH_MARKERS) + "]"
# zh goes LAST in the tiebreak chain: a genuinely zh doc has CJK in nearly
# every token (count ≈ n_tokens, dwarfing any latin marker count), while a
# latin doc quoting one zh word must not flip wholesale to zh on a tie.
LANG_ID_ORDER = [lang for lang, _ in LANG_MARKERS] + ["zh"]

MOD = 1_000_000_007  # rolling-hash modulus (fits BIGINT with 31x steps)


def tokens_expr(col: str | Column) -> Column:
    """Whitespace tokens of the normalized text (single-space separated)."""
    return F.split(norm_text(col), " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({norm_text_sql(expr)}, ' ')"


def token_count(col: str | Column) -> Column:
    """Token count over normalized text — the BPE-free budget estimator."""
    return F.size(tokens_expr(col))


def shingles_expr(tokens: Column | str, n: int = 3) -> Column:
    """Distinct n-gram shingles of a token array (per-row, no shuffle).

    Docs shorter than ``n`` tokens contribute their whole text as the single
    shingle so no document silently drops out of dedup.

    Pass the token column NAME (not a Column) on hot construction paths:
    the string form builds the whole expression with ONE JVM-side
    ``F.expr`` parse instead of ~40 Py4J round-trips (the round-9 profile
    found plan CONSTRUCTION, not execution, dominating the LSH family's
    wall time locally). Both forms produce the same values.
    """
    if isinstance(tokens, str):
        t = f"`{tokens}`"
        gram_parts = ", ".join(
            f"element_at({t}, i + {j})" for j in range(n)
        )
        return F.expr(
            f"array_distinct(CASE WHEN size({t}) >= {n} THEN "
            f"transform(sequence(1, size({t}) - {n - 1}), "
            f"i -> concat_ws(' ', {gram_parts})) "
            f"ELSE array(concat_ws(' ', {t})) END)"
        )
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(n)]
        ),
    )
    whole = F.array(F.concat_ws(" ", tokens))
    return F.array_distinct(F.when(F.size(tokens) >= n, gram).otherwise(whole))


def shingles_sql(tok: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`shingles_expr` (1-indexed lists, range is
    end-exclusive so ``range(1, len+1-(n-1))`` visits the same positions)."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    parts = parts.replace("t[i+0]", "t[i]")
    return (
        f"list_distinct(CASE WHEN len({tok}) >= {n} THEN "
        f"list_transform(range(1, len({tok}) - {n - 2}), "
        f"i -> {parts.replace('t[', f'({tok})[')}) "
        f"ELSE [array_to_string({tok}, ' ')] END)"
    )


def ngrams_expr(tokens: Column, n: int) -> Column:
    """NON-distinct word n-grams (per-row, no shuffle) — the multiset the
    repetition metrics count over, unlike :func:`shingles_expr` which
    dedups per doc and falls back to whole-text for short docs. Docs
    shorter than ``n`` tokens contribute an EMPTY array (a 1-token doc has
    no bigram; a whole-text fallback would score it top_bigram_frac = 1.0
    and flag it repetitive).

    As with :func:`shingles_expr`, pass the column NAME on hot paths for
    single-parse construction.
    """
    if isinstance(tokens, str):
        t = f"`{tokens}`"
        gram_parts = ", ".join(
            f"element_at({t}, i + {j})" for j in range(n)
        )
        return F.expr(
            f"CASE WHEN size({t}) >= {n} THEN "
            f"transform(sequence(1, size({t}) - {n - 1}), "
            f"i -> concat_ws(' ', {gram_parts})) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(n)]
        ),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(tokens) >= n, gram).otherwise(empty)


def ngrams_sql(tok: str, n: int) -> str:
    """DuckDB mirror of :func:`ngrams_expr`."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    parts = parts.replace("t[i+0]", "t[i]")
    return (
        f"CASE WHEN len({tok}) >= {n} THEN "
        f"list_transform(range(1, len({tok}) - {n - 2}), "
        f"i -> {parts.replace('t[', f'({tok})[')}) "
        f"ELSE [] END"
    )


def max_run_freq(arr: Column) -> Column:
    """Highest element frequency in a string array, computed per-row as the
    longest run in the sorted array (``array_sort`` + ``aggregate`` fold) —
    an O(L log L) in-row pass instead of the textbook explode → groupBy(doc,
    gram) → max, whose TWO shuffles move one row per gram instance (at
    100 TB that is the corpus itself, several times over). 0 for empty.

    The initial ``prev = ''`` is safe even though normalized token arrays
    can contain ``''`` (empty text → ``['']``): the first element's run is
    ``0 + 1 = 1`` whether or not it equals the initial ``prev``.
    """
    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["mx"], run).alias("mx"),
        )

    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("mx")
    )
    return F.aggregate(F.array_sort(arr), init, step, lambda a: a["mx"])


def quality_exprs(tokens: Column) -> dict[str, Column]:
    """Quality-signal columns: token count, uniqueness, stopword ratio, and
    a fixed linear score. One arithmetic sequence, mirrored textually by
    :func:`quality_sql`, so both engines produce bit-identical doubles.
    """
    all_stops = sorted({w for _, ws in LANG_MARKERS for w in ws})
    n_tok = F.size(tokens)
    n_uniq = F.size(F.array_distinct(tokens))
    n_stop = F.size(F.filter(tokens, lambda t: t.isin(*all_stops)))
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    uniq_ratio = n_uniq.cast("double") / n_tok.cast("double")
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    quality = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * uniq_ratio
    )
    return {
        "n_tokens": n_tok,
        "uniq_ratio": uniq_ratio,
        "stop_ratio": stop_ratio,
        "quality": quality,
    }


def quality_sql(tok: str) -> dict[str, str]:
    all_stops = sorted({w for _, ws in LANG_MARKERS for w in ws})
    inlist = ", ".join(f"'{w}'" for w in all_stops)
    n_tok = f"len({tok})"
    n_uniq = f"len(list_distinct({tok}))"
    n_stop = f"len(list_filter({tok}, t -> t IN ({inlist})))"
    stop_ratio = f"(CAST({n_stop} AS DOUBLE) / CAST({n_tok} AS DOUBLE))"
    uniq_ratio = f"(CAST({n_uniq} AS DOUBLE) / CAST({n_tok} AS DOUBLE))"
    len_score = f"least(CAST({n_tok} AS DOUBLE) / 100.0, 1.0)"
    quality = (
        f"(0.4 * {len_score} + 0.3 * (1.0 - {stop_ratio})"
        f" + 0.3 * {uniq_ratio})"
    )
    return {
        "n_tokens": n_tok,
        "uniq_ratio": uniq_ratio,
        "stop_ratio": stop_ratio,
        "quality": quality,
    }


def lang_id_expr(tokens: Column) -> Column:
    """Marker language ID: count each language's marker hits, take the
    first language (in ``LANG_ID_ORDER``) with the (weakly) highest
    non-zero count, else 'und'. Latin languages count token-equality
    marker-word hits; zh counts tokens CONTAINING a zh function-word
    character (``ZH_MARKER_CLASS`` — see its comment for why equality
    can't work without a zh tokenizer). The when-chain order IS the
    tiebreak — mirrored in :func:`lang_id_sql`.
    """
    # NB: F.filter lambdas must be unary — a second (defaulted) parameter
    # makes PySpark pass the element *index* into it.
    def marker_count(ws: list[str]) -> Column:
        return F.size(F.filter(tokens, lambda t: t.isin(*ws)))

    counts = {lang: marker_count(ws) for lang, ws in LANG_MARKERS}
    counts["zh"] = F.size(
        F.filter(tokens, lambda t: t.rlike(ZH_MARKER_CLASS))
    )
    expr = F.lit("und")
    # Build the chain back-to-front so the first language wins ties.
    for lang in reversed(LANG_ID_ORDER):
        cond = counts[lang] > 0
        for other in LANG_ID_ORDER:
            if other != lang:
                cond = cond & (counts[lang] >= counts[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(tok: str) -> str:
    def cnt(ws: list[str]) -> str:
        inlist = ", ".join(f"'{w}'" for w in ws)
        return f"len(list_filter({tok}, t -> t IN ({inlist})))"

    counts = {lang: cnt(ws) for lang, ws in LANG_MARKERS}
    counts["zh"] = (
        f"len(list_filter({tok}, t -> "
        f"regexp_matches(t, '{ZH_MARKER_CLASS}')))"
    )
    whens = []
    for lang in LANG_ID_ORDER:
        conds = [f"{counts[lang]} > 0"] + [
            f"{counts[lang]} >= {counts[o]}"
            for o in LANG_ID_ORDER
            if o != lang
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"(CASE {' '.join(whens)} ELSE 'und' END)"


def fingerprint_md5(col: str | Column) -> Column:
    """Content fingerprint: md5 hex of the normalized text (exact-dup key)."""
    return F.md5(norm_text(col))


def fingerprint_md5_sql(expr: str) -> str:
    return f"md5({norm_text_sql(expr)})"


def hashed_bucket_sql(expr: str, buckets: int) -> str:
    """Spark-SQL hashed-feature bucket of a string expression: first 8
    md5 hex chars → bigint → pmod. md5 (not xxhash64) so pure-Python
    mirrors reproduce it exactly with hashlib (the DSIR rule —
    xxhash64's seed/variant has no stdlib twin). Single source for the
    DSIR and LM-perplexity featurizations (self-review r13 round 4: two
    verbatim copies had to be kept in sync or a hashing change would
    silently break one family's mirror parity)."""
    return (
        f"CAST(pmod(CAST(conv(substring(md5({expr}), 1, 8), 16, 10) "
        f"AS BIGINT), {buckets}) AS INT)"
    )


def rolling_hash(tokens: Column) -> Column:
    """Order-sensitive rolling hash over the token stream:
    ``acc' = (acc * 31 + len(tok) * 17 + ascii(tok[0])) % 1e9+7``.

    A left-to-right fold (``F.aggregate``) seeded with 0 — the DuckDB mirror
    prepends the seed so ``list_reduce`` performs the identical sequence
    (ADVICE round 1: never rely on list_reduce's first-element seeding).
    """
    vals = F.transform(
        tokens,
        lambda t: (F.length(t) * F.lit(17) + F.ascii(t)).cast("long"),
    )
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(MOD),
    )


def rolling_hash_sql(tok: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tok}, t -> CAST(length(t) * 17 + ascii(t) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {MOD})"
    )


# GPT-2-style pretokenizer, simplified to the syntax Java regex and RE2
# (DuckDB) share: contraction suffixes, space-prefixed letter runs, digit
# runs, ONE pretoken per CJK ideograph, punctuation runs. This is the
# "BPE-ish" token counter — it matches the segmentation a byte-pair
# tokenizer starts from, so its counts track LLM token budgets far better
# than whitespace counts do. The per-char CJK branch (VERDICT r5 #2) is
# what real tokenizers converge to for zh (~1-2 tokens per ideograph):
# without it a 5,000-char zh doc counted as ONE pretoken and sequence
# packing overstuffed zh bins ~100x. \x{...} hex classes parse identically
# in Java regex and RE2 (pinned three-way — Spark regexp_count vs Spark
# extract vs DuckDB — over zh/kana/hangul/mixed/empty rows in
# tests/test_dedup_text.py::test_bpe_token_count_cross_engine_on_cjk); the
# final catch-all excludes the CJK range so mixed runs still split per
# ideograph. Kana/hangul stay run-tokenized — ja/ko are not in
# _KEEP_LANGS; extend the class when they are.
BPE_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[\x{4e00}-\x{9fff}]| ?[^A-Za-z0-9\s'\x{4e00}-\x{9fff}]+"
)


def bpe_tokens_expr(col: str | Column) -> Column:
    """BPE-ish pretokens of the raw text (group 0: whole-match extraction)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: str | Column) -> Column:
    # regexp_count, not size(regexp_extract_all(...)): counting must not
    # materialize every pretoken into a per-row array first — same value
    # (verified equal over the fixture corpus), no allocation churn.
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def bpe_count_sql(expr: str) -> str:
    """DuckDB mirror; RE2 handles the same pattern text identically."""
    escaped = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{escaped}', 0))"


# Minimal valence lexicons (hand-picked common English sentiment words) —
# the M6 "sentiment via text analysis" surface. A production run swaps in a
# full lexicon (VADER-style) behind the same expressions; the Spark shape
# (per-row array_filter counts, no UDF, no shuffle) is what matters here.
POS_WORDS = sorted(
    {
        "good", "great", "excellent", "best", "love", "happy", "wonderful",
        "amazing", "positive", "success", "win", "beautiful", "enjoy",
        "perfect", "favorite", "nice", "superb", "brilliant",
    }
)
NEG_WORDS = sorted(
    {
        "bad", "terrible", "worst", "hate", "awful", "sad", "horrible",
        "negative", "failure", "lose", "ugly", "poor", "wrong", "broken",
        "disappointing", "boring", "annoying", "painful",
    }
)


def sentiment_exprs(tokens: Column) -> dict[str, Column]:
    """Lexicon sentiment: positive/negative hit counts and the polarity
    score (pos − neg) / tokens ∈ [−1, 1]; one double division, mirrored
    textually by :func:`sentiment_sql` for bitwise oracle parity."""
    n_tok = F.size(tokens)
    n_pos = F.size(F.filter(tokens, lambda t: t.isin(*POS_WORDS)))
    n_neg = F.size(F.filter(tokens, lambda t: t.isin(*NEG_WORDS)))
    polarity = (n_pos - n_neg).cast("double") / n_tok.cast("double")
    return {"n_pos": n_pos, "n_neg": n_neg, "polarity": polarity}


def sentiment_sql(tok: str) -> dict[str, str]:
    pos = ", ".join(f"'{w}'" for w in POS_WORDS)
    neg = ", ".join(f"'{w}'" for w in NEG_WORDS)
    n_pos = f"len(list_filter({tok}, t -> t IN ({pos})))"
    n_neg = f"len(list_filter({tok}, t -> t IN ({neg})))"
    polarity = (
        f"(CAST({n_pos} - {n_neg} AS DOUBLE) / CAST(len({tok}) AS DOUBLE))"
    )
    return {"n_pos": n_pos, "n_neg": n_neg, "polarity": polarity}
