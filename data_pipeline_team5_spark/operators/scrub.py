"""Content scrubbing for LLM training-data pipelines (north star ⊕):
PII redaction and line-level boilerplate removal — the two REWRITE
operators a curation pipeline runs between quality filtering and dedup.
The reference stores raw VARCHAR text untouched (SURVEY.md §1.2); public
web-scale recipes (CCNet, RefinedWeb, Dolma) all scrub before training.

Everything is JVM-side ``pyspark.sql.functions`` — chained
``regexp_replace`` for redaction, one-pass ``regexp_extract_all`` line
chunking,
``posexplode`` + one line-key aggregation for cross-document line
frequencies — with DuckDB SQL mirrors kept adjacent (the ``*_sql``
twins) so every query built on them gets a bitwise oracle.

Regex dialect: intersection of Java regex (Spark) and RE2 (DuckDB) —
character classes, ``\\b`` word boundaries, bounded repetition; no
lookaround, no backreferences — so both engines match identically.

Scale notes (100 TB):
- PII scrubbing is embarrassingly row-parallel (zero shuffle): it runs
  map-side inside the parquet scan stage, inside whole-stage codegen.
- line-frequency counting shuffles once on the line key with map-side
  partial aggregation; the resulting boilerplate set (lines repeated in
  ≥ ``min_docs`` documents) is header/footer/nav vocabulary — orders of
  magnitude smaller than the corpus — so the removal anti-join
  broadcasts it instead of shuffling the corpus a second time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII patterns. Public, standard shapes: RFC-5322-lite emails, Korean-style
# dashed phone numbers (the reference's locale — KOFIC, `0XX-XXXX-XXXX`),
# dotted-quad IPv4, 16-digit dashed payment cards. Redaction order is
# email → card → phone → ip (the card pattern must not be eaten first by
# a narrower digit pattern). Per-type counts are matches on the ORIGINAL
# text — an UPPER BOUND on the replacements each redaction step performs,
# not always equal: the email local part ([A-Za-z0-9._%+-]+) can absorb an
# adjacent digit run, e.g. '010-1234-5678@x.com' counts as one phone AND
# redacts as a single <EMAIL>, so n_phone can overstate on adversarial
# text (ADVICE r7 #4). Redaction safety and the machine-checked
# zero-residual guarantee are unaffected — only the count metrics are
# approximate in that corner.
# ---------------------------------------------------------------------------
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("card", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b"),
    ("phone", r"\b0\d{1,2}-\d{3,4}-\d{4}\b"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def _col(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count_exprs(col: str | Column) -> dict[str, Column]:
    """Per-type PII match counts (``regexp_count`` — no array
    materialization, same discipline as textops.bpe_token_count)."""
    c = _col(col)
    return {
        f"n_{name}": F.regexp_count(c, F.lit(pat))
        for name, pat in PII_PATTERNS
    }


def pii_count_sql(expr: str) -> dict[str, str]:
    return {
        f"n_{name}": f"len(regexp_extract_all({expr}, '{pat}', 0))"
        for name, pat in PII_PATTERNS
    }


def scrub_pii(col: str | Column) -> Column:
    """Redact every PII match with its ``<TYPE>`` placeholder, in the
    fixed ``PII_PATTERNS`` order. Pure per-row projection — no shuffle."""
    out = _col(col)
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def scrub_pii_sql(expr: str) -> str:
    out = expr
    for name, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '<{name.upper()}>', 'g')"
    return out


def pii_residual_expr(col: str | Column) -> Column:
    """Matches of ANY PII pattern remaining in (already-scrubbed) text —
    the machine-checked guarantee that redaction missed nothing. The
    placeholder tokens themselves contain no digits/@, so they can never
    re-trigger a pattern."""
    c = _col(col)
    out = F.lit(0)
    for _, pat in PII_PATTERNS:
        out = out + F.regexp_count(c, F.lit(pat))
    return out


def pii_residual_sql(expr: str) -> str:
    return " + ".join(
        f"len(regexp_extract_all({expr}, '{pat}', 0))"
        for _, pat in PII_PATTERNS
    )


# ---------------------------------------------------------------------------
# Deterministic PII decoration of the synthetic fixture corpus. The
# fixture's documents are digit-free word soup (TESTDATA.md), so — exactly
# like multimodal.attach_bmp_blob packs them into real BMPs — the scrub
# query first APPENDS synthetic PII as a deterministic function of
# (doc_id, lang), mirrored bit-for-bit in SQL. Variation matters: some
# docs get 0, 1, or 2 emails, phones on a different modulus, etc., so the
# per-type counts actually exercise the patterns instead of being a
# constant column.
# ---------------------------------------------------------------------------


def decorate_pii(doc_id: str | Column, lang: str | Column, text: str | Column) -> Column:
    d = _col(doc_id)
    ds = d.cast("string")
    lg = _col(lang)
    email = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" contact user"), ds, F.lit("@example.com")),
        )
        .when(
            d % 3 == 1,
            F.concat(
                F.lit(" mail admin@"),
                lg,
                F.lit(".example.org and user"),
                ds,
                F.lit("@example.com"),
            ),
        )
        .otherwise(F.lit(""))
    )
    phone = F.when(
        d % 4 < 2,
        F.concat(
            F.lit(" call 010-"),
            F.lpad(((d * 7919) % 10000).cast("string"), 4, "0"),
            F.lit("-"),
            F.lpad(((d * 104729) % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 5 == 0,
        F.concat(
            F.lit(" host 10."),
            (d % 256).cast("string"),
            F.lit("."),
            ((d * 13) % 256).cast("string"),
            F.lit("."),
            ((d * 29) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    card = F.when(
        d % 7 == 0,
        F.concat(
            F.lit(" card 4111-1111-1111-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(_col(text), email, phone, ip, card)


def decorate_pii_sql(doc_id: str, lang: str, text: str) -> str:
    ds = f"CAST({doc_id} AS VARCHAR)"
    email = (
        f"CASE WHEN {doc_id} % 3 = 0 THEN"
        f" ' contact user' || {ds} || '@example.com'"
        f" WHEN {doc_id} % 3 = 1 THEN"
        f" ' mail admin@' || {lang} || '.example.org and user' || {ds}"
        f" || '@example.com'"
        f" ELSE '' END"
    )
    phone = (
        f"CASE WHEN {doc_id} % 4 < 2 THEN"
        f" ' call 010-' || lpad(CAST(({doc_id} * 7919) % 10000 AS VARCHAR), 4, '0')"
        f" || '-' || lpad(CAST(({doc_id} * 104729) % 10000 AS VARCHAR), 4, '0')"
        f" ELSE '' END"
    )
    ip = (
        f"CASE WHEN {doc_id} % 5 = 0 THEN"
        f" ' host 10.' || CAST({doc_id} % 256 AS VARCHAR)"
        f" || '.' || CAST(({doc_id} * 13) % 256 AS VARCHAR)"
        f" || '.' || CAST(({doc_id} * 29) % 256 AS VARCHAR)"
        f" ELSE '' END"
    )
    card = (
        f"CASE WHEN {doc_id} % 7 = 0 THEN"
        f" ' card 4111-1111-1111-' || lpad(CAST({doc_id} % 10000 AS VARCHAR), 4, '0')"
        f" ELSE '' END"
    )
    return f"{text} || {email} || {phone} || {ip} || {card}"


# ---------------------------------------------------------------------------
# Line-level boilerplate removal. "Lines" are fixed-width token chunks of
# the normalized text (the fixture corpus carries no newlines; a corpus
# with real newlines passes width=None semantics by pre-splitting — the
# frequency/removal machinery below is line-definition-agnostic).
# ---------------------------------------------------------------------------
LINE_WIDTH = 8


def _chunk_pattern(width: int) -> str:
    # Greedy bounded repetition consumes exactly `width` tokens per
    # non-overlapping match (fewer for the tail) — Java regex and RE2
    # agree on this dialect subset.
    return rf"[^ ]+( [^ ]+){{0,{width - 1}}}"


def lines_expr(norm: Column, width: int = LINE_WIDTH) -> Column:
    """Normalized single-space text → array of width-``width``-token
    chunk strings (per-row, no shuffle). One ``regexp_extract_all`` pass
    — measured 4.5× faster than the array slice/transform equivalent
    (2.67 → 0.60 s on sf0.1's single-partition scan; verified
    element-identical over the corpus). Empty text yields an EMPTY array
    (no matches), i.e. zero lines."""
    return F.regexp_extract_all(norm, F.lit(_chunk_pattern(width)), 0)


def lines_sql(norm: str, width: int = LINE_WIDTH) -> str:
    """DuckDB mirror; RE2 applies the identical pattern text."""
    return f"regexp_extract_all({norm}, '{_chunk_pattern(width)}', 0)"


def line_frequency(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Cross-document frequency of each distinct line: (line, df) where
    ``df`` = number of DISTINCT documents containing the line. One shuffle
    on the line key; the per-doc ``distinct`` collapses within-doc repeats
    map-side first so a doc repeating its own footer 1000× still counts 1.
    """
    return (
        lines.select(line_col, "doc_id")
        .distinct()
        .groupBy(line_col)
        .agg(F.count("*").alias("df"))
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    min_docs: int = 2,
    width: int = LINE_WIDTH,
) -> DataFrame:
    """CCNet/RefinedWeb-style line-level dedup: drop every line that
    appears in ≥ ``min_docs`` distinct documents, rebuild each document
    from its surviving lines in original order.

    Returns one row per input document:
    ``doc_id, n_lines, n_kept, n_dropped, clean_fp`` (md5 of the kept
    lines joined by newline; docs whose every line was boilerplate keep a
    row with ``n_kept = 0`` and ``clean_fp = md5('')``).

    Plan shape: scan → per-row chunking, materialized ONCE with
    localCheckpoint (three consumers — the frequency count's build side,
    the removal join's probe side, and the per-doc totals — would
    otherwise each re-run the normalize+chunk pass; with the one-pass
    regexp chunker the combined fix measured 12.7 → 4.3 s at sf0.1, and
    a real 100 TB run materializes this layer anyway, the same
    discipline as curate_training_data's curated layer) → posexplode
    → (line, doc) distinct + count [one line-key shuffle, partial agg] →
    the small boilerplate set broadcasts into a left-anti join [no second
    corpus shuffle] → one doc_id aggregation rebuilds the text. At 100 TB
    the boilerplate set is bounded by repeated header/footer vocabulary
    (~10⁵-10⁶ lines), far under the broadcast threshold; if a corpus
    breaks that assumption, drop the broadcast hint and AQE falls back to
    a shuffled anti-join with the same semantics.
    """
    from data_pipeline_team5_spark.functions.scalars import norm_text

    base = docs.select(
        "doc_id", lines_expr(norm_text(text_col), width).alias("ls")
    ).localCheckpoint()
    exploded = base.select(
        "doc_id", F.posexplode("ls").alias("line_no", "line")
    )
    boiler = line_frequency(exploded).filter(F.col("df") >= min_docs)
    kept = exploded.join(
        F.broadcast(boiler.select("line")), "line", "left_anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "line"))
                    ),
                    lambda s: s.line,
                ),
                "\n",
            )
        ).alias("clean_fp"),
    )
    totals = base.select("doc_id", F.size("ls").alias("n_lines"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_dropped"
            ),
            F.coalesce("clean_fp", F.md5(F.lit(""))).alias("clean_fp"),
        )
    )
