"""Sampling family (north star ⊕): reproducible corpus sampling and
train/val/test splitting over ``documents``.

The decisions derive from md5-of-key buckets (operators/sampling.py), not
Spark's partition-seeded RNG — so the oracle is bitwise and, more
importantly, so a rerun / repartition / engine switch never reassigns a
document. Both queries are shuffle-free map work until the tiny final
rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import norm_text_sql
from data_pipeline_team5_spark.operators.textops import tokens_sql
from data_pipeline_team5_spark.operators.sampling import (
    BUCKETS,
    inspect_key_sql,
    frac_to_buckets,
    hash_bucket,
    hash_bucket_sql,
    pack_bins,
    split_assign,
)
from data_pipeline_team5_spark.plans.catalog import register, table

SAMPLE_FRAC = 0.10
VAL_FRAC = 0.05
TEST_FRAC = 0.05


@register(
    "sample_split_report",
    oracle=f"""
        SELECT CASE
                 WHEN {hash_bucket_sql('doc_id')} < {frac_to_buckets(VAL_FRAC)}
                   THEN 'val'
                 WHEN {hash_bucket_sql('doc_id')}
                      < {frac_to_buckets(VAL_FRAC) + frac_to_buckets(TEST_FRAC)}
                   THEN 'test'
                 ELSE 'train'
               END AS split,
               lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE
                   {hash_bucket_sql('doc_id')}
                   < {frac_to_buckets(SAMPLE_FRAC)}) AS BIGINT) AS n_sampled,
               CAST(SUM(doc_id) FILTER (WHERE
                   {hash_bucket_sql('doc_id')}
                   < {frac_to_buckets(SAMPLE_FRAC)}) AS BIGINT)
                   AS sampled_id_checksum
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
    doc="⊕ the corpus sampling report, ONE scan (round-4 consolidation of "
    "sample_stratified_counts + split_train_val_test, VERDICT r2 #1): "
    "train/val/test assignment (90/5/5) rolled up per (split, lang), with "
    "the reproducible 10% sample's membership count and doc_id checksum "
    "per cell (the checksum proves the exact same documents were chosen). "
    "Both decisions derive from md5-of-key buckets, NOT sample()'s "
    "partition-seeded RNG — a rerun, repartition, or engine switch never "
    "reassigns a document, which is what keeps a 100 TB corpus's eval "
    "sets stable across ingestion runs (operators/sampling.py:"
    "split_assign, deterministic_sample). A NULL checksum is the honest "
    "value for a cell with no sampled docs (both engines agree).",
    tags=("sampling", "reproducible", "split"),
)
def sample_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    assigned = split_assign(
        docs, "doc_id", val_frac=VAL_FRAC, test_frac=TEST_FRAC
    )
    in_sample = hash_bucket("doc_id") < frac_to_buckets(SAMPLE_FRAC)
    return (
        assigned.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(in_sample.cast("long")).alias("n_sampled"),
            F.sum(F.when(in_sample, F.col("doc_id"))).alias(
                "sampled_id_checksum"
            ),
        )
        .orderBy("split", "lang")
    )


# Target training-mixture weights per language (round 7): the domain
# reweighting every multilingual training run applies (Pile/ROOTS-style
# fixed mixture). Weights must sum to 1; languages absent from the map are
# excluded from the sample.
TARGET_MIX: dict[str, float] = {
    "en": 0.5,
    "de": 0.125,
    "fr": 0.125,
    "es": 0.125,
    "zh": 0.125,
}

_MIX_VALUES = ", ".join(
    f"('{lang}', CAST({w} AS DOUBLE))" for lang, w in sorted(TARGET_MIX.items())
)


@register(
    "domain_mixture_sample",
    oracle=f"""
        WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_avail
                   FROM documents GROUP BY lang),
        w(lang, w) AS (VALUES {_MIX_VALUES}),
        cw AS (SELECT c.lang, n_avail, w FROM c JOIN w USING (lang)),
        t AS (SELECT MIN(CAST(n_avail AS DOUBLE) / w) AS cap FROM cw),
        r AS (SELECT lang, n_avail, w,
                     cap * w / CAST(n_avail AS DOUBLE) AS keep_rate
              FROM cw, t)
        SELECT d.lang,
               ANY_VALUE(r.n_avail) AS n_avail,
               ANY_VALUE(r.keep_rate) AS keep_rate,
               CAST(COUNT(*) FILTER (WHERE {hash_bucket_sql('doc_id')}
                    < r.keep_rate * {BUCKETS}) AS BIGINT) AS n_kept,
               CAST(SUM(doc_id) FILTER (WHERE {hash_bucket_sql('doc_id')}
                    < r.keep_rate * {BUCKETS}) AS BIGINT)
                   AS kept_id_checksum
        FROM documents d JOIN r USING (lang)
        GROUP BY d.lang
        ORDER BY d.lang
    """,
    doc="⊕ domain-mixture sampling: draw the LARGEST corpus subsample whose "
    "language shares match a target mixture (Pile/ROOTS-style reweighting). "
    "cap = min over languages of n_avail/weight is the classic waterline — "
    "the bottleneck language keeps 100% and every other language is "
    "down-sampled to target_share × cap docs. Membership derives from the "
    "same md5-of-key buckets as sample_split_report, so the drawn set is "
    "stable across reruns/repartitions/engines, and the per-lang checksum "
    "proves the exact same documents were chosen. Spark shape for 100 TB: "
    "the per-lang rate table is a ~100-row aggregate, broadcast back onto "
    "the corpus scan — the big side never shuffles for the sampling "
    "decision, only the tiny per-lang rollup exchanges. keep_rate is one "
    "shared double expression (cap*w/n_avail, identical operation order in "
    "both engines) so the bucket comparison is bitwise.",
    tags=("sampling", "mixture", "reproducible"),
)
def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.sampling import mixture_rates

    docs = table(spark, sf_dir, "documents")
    rates = mixture_rates(docs, TARGET_MIX)
    kept = hash_bucket("doc_id") < F.col("keep_rate") * F.lit(BUCKETS)
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.any_value("n_avail").alias("n_avail"),
            F.any_value("keep_rate").alias("keep_rate"),
            F.coalesce(F.sum(kept.cast("long")), F.lit(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id"))).alias("kept_id_checksum"),
        )
        .orderBy("lang")
    )


def _split_case_sql(expr: str) -> str:
    """DuckDB mirror of :func:`_split_expr` (sample_split_report's CASE,
    parameterized on the key expression)."""
    v = frac_to_buckets(VAL_FRAC)
    t = v + frac_to_buckets(TEST_FRAC)
    h = hash_bucket_sql(expr)
    return (
        f"CASE WHEN {h} < {v} THEN 'val' "
        f"WHEN {h} < {t} THEN 'test' ELSE 'train' END"
    )


def _split_expr(c: Column) -> Column:
    b = hash_bucket(c)
    v = frac_to_buckets(VAL_FRAC)
    t = v + frac_to_buckets(TEST_FRAC)
    return F.when(b < v, "val").when(b < t, "test").otherwise("train")


def _leakage_oracle() -> str:
    # Import here, not at module top, purely for readability of the shared
    # fragment's origin; dedup_family loads before this module in
    # catalog._load_families, so registration order is unaffected.
    from data_pipeline_team5_spark.plans.dedup_family import (
        _SHINGLES,
        JACCARD_T,
    )

    return f"""
        {_SHINGLES},
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM shing a JOIN shing b
              ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        jp AS (
            SELECT doc_a, doc_b,
                   CAST(inter AS DOUBLE)
                       / CAST((sa.n + sb.n - inter) AS DOUBLE) AS jaccard
            FROM pairs
            JOIN sizes sa ON pairs.doc_a = sa.doc_id
            JOIN sizes sb ON pairs.doc_b = sb.doc_id
            WHERE CAST(inter AS DOUBLE)
                  / CAST((sa.n + sb.n - inter) AS DOUBLE) >= {JACCARD_T}
        ),
        sp AS (
            SELECT jaccard,
                   {_split_case_sql('doc_a')} AS split_a,
                   {_split_case_sql('doc_b')} AS split_b
            FROM jp
        )
        SELECT LEAST(split_a, split_b) AS split_lo,
               GREATEST(split_a, split_b) AS split_hi,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               MAX(jaccard) AS max_jaccard
        FROM sp
        WHERE split_a <> split_b
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


@register(
    "split_leakage_audit",
    oracle=_leakage_oracle(),
    doc="⊕ train/eval LEAKAGE audit: near-duplicate pairs (the dedup "
    "family's exact ≥0.6 Jaccard set) that CROSS a train/val/test "
    "boundary, rolled up per split pair with the worst similarity — the "
    "number a data card must report, and the complement of "
    "decontaminate_ngram_overlap (external benchmark) for the corpus's "
    "OWN eval splits. Splits are computed as expressions on the pair "
    "endpoints (the same md5-bucket CASE as sample_split_report) — no "
    "join against a corpus-sized assignment table, so beyond the pair "
    "generation itself the audit adds only a tiny rollup. Runs on the "
    "post-dedup corpus in production (pairs surviving curation ARE the "
    "leakage); here over raw documents so the oracle shares "
    "dedup_family's exact pair CTE.",
    tags=("sampling", "dedup", "audit", "leakage"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
    )
    from data_pipeline_team5_spark.plans.dedup_family import JACCARD_T

    docs = table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(doc_shingles(docs, "doc_id", "text"), JACCARD_T)
    sp = pairs.select(
        "jaccard",
        _split_expr(F.col("doc_a")).alias("split_a"),
        _split_expr(F.col("doc_b")).alias("split_b"),
    )
    return (
        sp.filter(F.col("split_a") != F.col("split_b"))
        .select(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
            "jaccard",
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("split_lo", "split_hi")
    )


# ---------------------------------------------------------------------------
# Training-shard manifest (round 9): the LAST step of a curation pipeline —
# deal the retained corpus into N equal output shards in a deterministic
# global shuffle order, and audit the balance. shard = md5(doc_id) bits,
# intra-shard order = DIFFERENT bits of the same digest — so the "shuffle"
# is reproducible across runs/partitionings/engines (no partition-seeded
# RNG), yet uncorrelated with doc_id order (adjacent docs scatter).

N_SHARDS = 16


@register(
    "shard_manifest",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, n_chars,
                   CAST(len(string_split(
                       {norm_text_sql('text')}, ' ')) AS BIGINT) AS n_tok,
                   md5(CAST(doc_id AS VARCHAR)) AS d
            FROM documents
        ),
        s AS (
            SELECT doc_id, n_chars, n_tok,
                   CAST(('0x' || substr(d, 17, 8))::UBIGINT
                        % {N_SHARDS} AS BIGINT) AS shard_id,
                   substr(d, 9, 8) || ':'
                       || CAST(doc_id AS VARCHAR) AS sort_key
            FROM h
        )
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               MIN(sort_key) AS first_sort_key
        FROM s
        GROUP BY shard_id
        ORDER BY shard_id
    """,
    doc="⊕ training-shard manifest: the corpus dealt into 16 output shards "
    "by md5(doc_id) bits, with a deterministic intra-shard shuffle order "
    "(hex chars 9-16 of the SAME digest — independent bits, so shard and "
    "order are uncorrelated with each other and with ingestion order) and "
    "per-shard balance stats (docs, chars, tokens, id checksum, first sort "
    "key). This is the step that turns a curated corpus into the files a "
    "training run actually reads: shard_id is the output partition, "
    "sort_key the within-shard order, and the manifest is the audit that "
    "every rerun produced byte-identical shards (checksums match ⇔ same "
    "docs, first_sort_key matches ⇔ same order). No partition-seeded RNG "
    "anywhere — a repartition, cluster resize, or engine switch never "
    "re-deals a document. Spark shape at 100 TB: shard+key are map-side "
    "projections inside the scan stage; the manifest is a 16-key rollup "
    "(map-side combine, O(shards) exchange); the writer twin "
    "(sources/writers.py:write_training_shards) is repartition(shard) + "
    "sortWithinPartitions(sort_key) — exactly one shuffle to produce the "
    "physical shards.",
    headline=True,
    tags=("sampling", "sharding", "reproducible", "writer"),
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.sampling import shard_assign

    docs = table(spark, sf_dir, "documents")
    from data_pipeline_team5_spark.operators.textops import token_count

    dealt = shard_assign(docs, "doc_id", N_SHARDS)
    return (
        dealt.select(
            "shard_id",
            "sort_key",
            "doc_id",
            "n_chars",
            token_count("text").cast("long").alias("n_tok"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("n_tok").alias("sum_tokens"),
            F.sum("doc_id").alias("id_checksum"),
            F.min("sort_key").alias("first_sort_key"),
        )
        .orderBy("shard_id")
    )


TOKEN_BUDGET = 2048


@register(
    "pack_training_sequences",
    oracle=f"""
        WITH sized AS (
            SELECT lang, doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tok
            FROM documents
        ),
        placed AS (
            SELECT lang, doc_id, n_tok,
                   CAST(COALESCE(SUM(n_tok) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // {TOKEN_BUDGET} AS BIGINT) AS bin_id
            FROM sized
        )
        SELECT lang, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
        FROM placed
        GROUP BY lang, bin_id
        ORDER BY lang, bin_id
    """,
    doc="⊕ sequence packing: documents concatenated into ~2048-token "
    "training bins per language — linear packing by running token count "
    "(a doc goes to the bin where its start offset falls), deterministic "
    "doc_id order so bins are reproducible run-over-run. The prefix sum is "
    "the TWO-LEVEL form (operators/sampling.py:pack_bins, VERDICT r2 #4): "
    "cumsum per (lang, doc_id-range shard) in parallel, then a tiny "
    "per-shard offset table broadcast back — no single task ever sorts a "
    "whole language, which is what survives an 80%-English 100 TB corpus "
    "where the naive per-lang window serializes most of the data through "
    "one reducer. Bit-identical to the single-window form (pinned in "
    "tests/test_properties.py).",
    headline=True,
    tags=("sampling", "packing"),
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok")
    sized = docs.select("lang", "doc_id", n_tok)
    placed = pack_bins(
        sized, order_key="doc_id", size_col="n_tok", budget=TOKEN_BUDGET
    )
    return (
        placed.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("lang", "bin_id")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (round 9): Data Selection via Importance
# Resampling (Xie et al. 2023, NeurIPS — arXiv:2302.03169). The published
# recipe: featurize documents as hashed n-gram counts, fit bag-of-words
# distributions over the hash buckets for the TARGET domain and the RAW
# pool, and weight each raw document by its log-likelihood ratio
# log p_target(doc) − log p_raw(doc) = Σ_tokens λ[bucket(token)]; resample
# by those weights. Here the selection rule is the deterministic core
# (weight > 0 ⇔ the doc is more target-like than pool-like); the paper's
# Gumbel-top-k draw is one extra column of seeded noise over these same
# weights.

DSIR_BUCKETS = 256  # hashed-unigram feature dim (paper: 10k; fixture: 256)
DSIR_TARGET_MOD = 3  # with DSIR_TARGET_TERM: the in-query target slice
DSIR_TARGET_TERM = "stream"  # topical marker defining the target domain


def _dsir_bucket_sql(tok: str) -> str:
    """DSIR's hashed-feature bucket — the shared md5 featurization
    (operators/textops.py:hashed_bucket_sql) at DSIR_BUCKETS width."""
    from data_pipeline_team5_spark.operators.textops import (
        hashed_bucket_sql,
    )

    return hashed_bucket_sql(tok, DSIR_BUCKETS)


@register(
    "dsir_importance_weights",
    oracle=None,  # log-likelihood ratios need ln(): JVM Math.log and
    # DuckDB's libm need not agree in the last ulp, so no bitwise SQL
    # oracle is possible. Exact-parity checks live in tests/test_dsir.py:
    # bucket counts and totals are integer-exact against a pure-Python
    # mirror (hashlib md5), weights match the mirror's identical
    # left-to-right fold to 1e-9 relative.
    doc="⊕ DSIR importance weighting (Xie et al. 2023): per-document "
    "log-likelihood ratio between a target-domain and a raw-pool hashed "
    "unigram distribution (+1-smoothed over 256 md5 buckets), with "
    "selected = weight > 0. The target set is the id%3==0 documents "
    "containing 'stream' — a TOPICAL slice, the in-query stand-in for a "
    "distributionally distinct curated target corpus (the fixture's "
    "lang labels are synthetic — every language shares one vocabulary — "
    "so language cannot carry content signal, and a target drawn i.i.d. "
    "from the pool would make every LLR negative and the selection rule "
    "vacuous; the mirror test guards both). Pool docs sharing the "
    "target's topical vocabulary surface with the highest weights. Plan shape at 100 TB — two passes, "
    "no corpus-sized shuffle: pass 1 aggregates bucket counts for both "
    "sides in ONE scan (the only exchange is 256 bucket keys after "
    "map-side combine), the 256 λ values collect to the driver (k-means "
    "centroid discipline: fixed-size model state, never corpus rows) and "
    "embed as ONE literal array; pass 2 scores every doc MAP-SIDE with a "
    "sequential aggregate fold over its token array — element_at into "
    "the broadcast-literal λ — inside the scan stage, zero shuffle. "
    "Weights are reproducible bit-for-bit across runs and partitionings "
    "(the fold is per-doc left-to-right in token order; λ literals embed "
    "via repr → correctly-rounded string→double parse).",
    headline=True,
    tags=("sampling", "curation", "dsir", "importance"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from data_pipeline_team5_spark.operators.textops import tokens_expr

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", tokens_expr("text").alias("_t")
    )
    is_target = (F.col("doc_id") % DSIR_TARGET_MOD == 0) & F.col(
        "text"
    ).contains(DSIR_TARGET_TERM)

    # pass 1: hashed-unigram bucket counts, both sides from one scan
    ex = docs.select(is_target.alias("tgt"), F.explode("_t").alias("tok"))
    counts = (
        ex.groupBy(F.expr(_dsir_bucket_sql("tok")).alias("b"))
        .agg(
            F.count(F.when(F.col("tgt"), F.lit(1))).alias("ct"),
            F.count(F.when(~F.col("tgt"), F.lit(1))).alias("cr"),
        )
        .collect()
    )
    ct = [0] * DSIR_BUCKETS
    cr = [0] * DSIR_BUCKETS
    for r in counts:
        ct[r["b"]] = r["ct"]
        cr[r["b"]] = r["cr"]
    tot_t = sum(ct) + DSIR_BUCKETS  # +1 smoothing mass
    tot_r = sum(cr) + DSIR_BUCKETS
    lam = [
        math.log((ct[b] + 1) / tot_t) - math.log((cr[b] + 1) / tot_r)
        for b in range(DSIR_BUCKETS)
    ]

    # pass 2: map-only scoring — λ as one literal array, per-doc fold
    lam_sql = "array(" + ",".join(
        f"CAST('{float(v)!r}' AS DOUBLE)" for v in lam
    ) + ")"
    weight = F.expr(
        f"aggregate(transform(_t, t -> element_at({lam_sql}, "
        f"{_dsir_bucket_sql('t')} + 1)), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )
    return (
        docs.filter(~is_target)
        .select(
            "doc_id",
            F.size("_t").alias("n_tokens"),
            weight.alias("weight"),
        )
        .withColumn("selected", F.col("weight") > F.lit(0.0))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Context-window chunking (round 9): the step BEFORE pack_training_sequences
# for documents longer than the model context — split each doc's token
# stream into fixed-size training chunks with a stride overlap (the
# standard HF/LM-pretraining sliding window), so no text is silently
# truncated and boundary context is preserved across chunk edges.

CHUNK_TOKENS = 48  # chunk length in whitespace tokens (fixture-sized:
# docs span ~10-99 tokens, so 48/32 exercises 1..4-chunk docs; production
# would use e.g. 2048/1792)
CHUNK_STRIDE = 32  # step between chunk starts; overlap = 48 - 32 = 16


@register(
    "chunk_for_context_window",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_id,
                   list_slice(t, u.k * {CHUNK_STRIDE} + 1,
                              u.k * {CHUNK_STRIDE} + {CHUNK_TOKENS}) AS c
            FROM toks, UNNEST(range(0, 1 + CAST(GREATEST(0,
                 CEIL((len(t) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0))
                 AS BIGINT))) AS u(k)
        )
        SELECT doc_id, chunk_id,
               CAST(len(c) AS INT) AS n_tok,
               array_to_string(c, ' ') AS chunk
        FROM chunks
        ORDER BY doc_id, chunk_id
    """,
    doc="⊕ context-window chunking: each document's whitespace-token "
    "stream sliced into 48-token training chunks every 32 tokens "
    "(16-token overlap, the sliding-window pre-packing step for docs "
    "longer than the model context; short docs yield exactly one chunk). "
    "Pure map-side array work — slice boundaries come from a per-row "
    "sequence over ceil((n−chunk)/stride), the explode multiplies rows "
    "only by each doc's own chunk count, and NOTHING shuffles (the only "
    "exchange is the output ORDER BY, dropped in production where the "
    "chunks stream straight into the packer). Text moves because text "
    "is the product here — this op EMITS training data; at 100 TB it "
    "runs inside the scan stage and writes behind a partitioned sink. "
    "Bitwise oracle: token slicing and the space re-join are exact "
    "string ops on both engines.",
    headline=True,
    tags=("sampling", "packing", "chunking"),
)
def chunk_for_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_t")
    )
    chunk = F.expr(
        f"explode(transform(sequence(0, int(greatest(0, "
        f"ceil((size(_t) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0)))), "
        f"k -> named_struct('chunk_id', CAST(k AS BIGINT), "
        f"'c', slice(_t, k * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS}))))"
    )
    return (
        docs.select("doc_id", chunk.alias("ck"))
        .select(
            "doc_id",
            F.col("ck.chunk_id").alias("chunk_id"),
            F.size("ck.c").alias("n_tok"),
            F.concat_ws(" ", "ck.c").alias("chunk"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# Inspection sample (round 9 continued): the human-review draw — K docs per
# source, the same K docs on every run. Every data-quality loop needs one
# (spot-check a source before trusting its volume; re-pull the SAME docs
# after a pipeline change to diff behavior), and partition-seeded
# sample()/ORDER BY rand() can't provide the rerun stability.

INSPECT_K = 5


@register(
    "inspection_sample",
    oracle=f"""
        WITH r AS (
            SELECT source, doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {inspect_key_sql('doc_id')}, doc_id
                   ) AS pick_rank
            FROM documents
        )
        SELECT source, CAST(pick_rank AS INT) AS pick_rank,
               doc_id, lang, n_chars
        FROM r
        WHERE pick_rank <= {INSPECT_K}
        ORDER BY source, pick_rank
    """,
    doc="⊕ deterministic inspection sample: the 5 smallest-salted-digest "
    "docs per source — the human-review draw every quality loop needs, "
    "stable across reruns/partitionings/engines so a reviewer can diff "
    "the SAME documents before and after a pipeline change (sample()/"
    "ORDER BY rand() reshuffle on every run). The digest is salted "
    "('inspect:' prefix) because unsalted md5(doc_id) prefix bits ARE the "
    "split-assignment bits — a smallest-raw-digest draw would review "
    "mostly val-split docs. Spark shape at 100 TB (operators/sampling.py:"
    "inspection_sample): NOT one window over the corpus — a prefix-of-the-"
    "rank-key threshold (sized from the smallest group, one tiny count "
    "agg) shrinks the window input to ~safety·K·|groups| candidate rows, "
    "with a per-group verification count and an exact per-group fallback "
    "as the correctness net (two-phase top-K-per-group; the single-window "
    "form is the oracle and the equivalence is pinned in tests/"
    "test_shard_vocab.py, including a forced-fallback run).",
    headline=True,
    tags=("sampling", "inspection", "reproducible"),
)
def inspection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.sampling import (
        inspection_sample as _inspect,
    )

    docs = table(spark, sf_dir, "documents").select(
        "source", "doc_id", "lang", "n_chars"
    )
    return (
        _inspect(docs, "source", "doc_id", INSPECT_K)
        .select("source", "pick_rank", "doc_id", "lang", "n_chars")
        .orderBy("source", "pick_rank")
    )


# ---------------------------------------------------------------------------
# Packed-sequence materialization (round 9 continued): pack_training_
# sequences AUDITS the bin layout; this op EMITS the product — each bin's
# documents concatenated in deterministic doc_id order with an explicit
# separator token, plus the per-bin doc/token counts a loader sanity-checks
# against the audit. Text moves because text is the product here (the same
# contract as chunk_for_context_window).

PACK_SEP = " <|eos|> "


@register(
    "pack_emit_sequences",
    oracle=f"""
        WITH sized AS (
            SELECT lang, doc_id, text,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tok
            FROM documents
        ),
        placed AS (
            SELECT lang, doc_id, text, n_tok,
                   CAST(COALESCE(SUM(n_tok) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // {TOKEN_BUDGET} AS BIGINT) AS bin_id
            FROM sized
        )
        SELECT lang, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
               STRING_AGG(text, '{PACK_SEP}' ORDER BY doc_id) AS seq
        FROM placed
        GROUP BY lang, bin_id
        ORDER BY lang, bin_id
    """,
    doc="⊕ packed-sequence emission: the materialization step after "
    "pack_training_sequences' layout audit — each (lang, bin) becomes ONE "
    "training sequence, documents concatenated in doc_id order with an "
    "explicit separator token, alongside the same doc/token counts the "
    "audit reports (a loader cross-checks the two). Placement reuses "
    "pack_bins' two-level prefix sum (no per-language serial sort); the "
    "emission itself is one (lang, bin_id) exchange whose value payload "
    "is each doc's text moving to its bin writer — unavoidable and "
    "final, text is the product (same contract as chunking). In-bin "
    "order is pinned by sorting the collected (doc_id, text) structs, "
    "not by shuffle arrival order, so the emitted sequence is bitwise "
    "reproducible across partitionings and matches STRING_AGG ... ORDER "
    "BY exactly. Bin token sums stay BIGINT end to end.",
    headline=True,
    tags=("sampling", "packing", "emit"),
)
def pack_emit_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok")
    sized = docs.select("lang", "doc_id", "text", n_tok)
    placed = pack_bins(
        sized, order_key="doc_id", size_col="n_tok", budget=TOKEN_BUDGET
    )
    seq = F.concat_ws(
        PACK_SEP,
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "text"))
            ),
            lambda s: s.text,
        ),
    )
    return (
        placed.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("bin_tokens"),
            seq.alias("seq"),
        )
        .orderBy("lang", "bin_id")
    )


# ---------------------------------------------------------------------------
# Round 17 (VERDICT r16 #6): the sampling family's graded-panel rotation
# — dsir_importance_weights + inspection_sample have been tail-resident
# production curation signals since round 9. The panel composes every
# SQL-EXPRESSIBLE cell of both under one composed oracle: the full
# inspection draw, plus the DSIR fit's sufficient statistics (per-bucket
# target/raw counts, their totals, and every pool doc's token size) —
# everything the weights are a deterministic driver-side ln() away from.
# The ln() transform itself stays rows-only in the tail (no bitwise SQL
# form), so this panel puts the ENTIRE Spark-side computation of the
# DSIR estimator under the driver's hash check.


@register(
    "sampling_panel",
    oracle=f"""
        WITH r AS (
            SELECT source, doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {inspect_key_sql('doc_id')}, doc_id
                   ) AS pick_rank
            FROM documents
        ),
        toks AS (
            SELECT doc_id,
                   (doc_id % {DSIR_TARGET_MOD} = 0
                    AND contains(text, '{DSIR_TARGET_TERM}')) AS tgt,
                   {tokens_sql('text')} AS t
            FROM documents
        ),
        ex AS (
            SELECT tgt, u.tok AS tok FROM toks, UNNEST(t) AS u(tok)
        ),
        bkt AS (
            SELECT CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                        % {DSIR_BUCKETS} AS BIGINT) AS b,
                   CAST(COUNT(CASE WHEN tgt THEN 1 END) AS BIGINT) AS ct,
                   CAST(COUNT(CASE WHEN NOT tgt THEN 1 END) AS BIGINT)
                       AS cr
            FROM ex GROUP BY 1
        )
        SELECT 'inspect' AS section, source AS k1,
               CAST(pick_rank AS BIGINT) AS k2,
               CAST(doc_id AS BIGINT) AS n1,
               CAST(n_chars AS BIGINT) AS n2, lang AS k3
        FROM r WHERE pick_rank <= {INSPECT_K}
        UNION ALL
        SELECT 'dsir_bucket', CAST(NULL AS VARCHAR), b, ct, cr,
               CAST(NULL AS VARCHAR)
        FROM bkt
        UNION ALL
        SELECT 'dsir_total', CAST(NULL AS VARCHAR),
               CAST(NULL AS BIGINT), CAST(SUM(ct) AS BIGINT),
               CAST(SUM(cr) AS BIGINT), CAST(NULL AS VARCHAR)
        FROM bkt
        UNION ALL
        SELECT 'dsir_doc', CAST(NULL AS VARCHAR),
               CAST(doc_id AS BIGINT), CAST(len(t) AS BIGINT),
               CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
        FROM toks WHERE NOT tgt
        ORDER BY section, k1, k2
    """,
    doc="⊕ sampling-family panel (round 17, VERDICT r16 #6 — the "
    "windows_panel recipe, in the slot freed by folding d3_top10_sales "
    "into dash_movie_panel): every SQL-expressible cell of the two "
    "tail-resident production curation signals in one section-tagged "
    "layout. 'inspect' — the full deterministic inspection draw (5 "
    "smallest salted-digest docs per source, the two-phase top-K-per-"
    "group operator). 'dsir_bucket'/'dsir_total' — the DSIR fit's "
    "sufficient statistics: per-md5-bucket target/raw unigram counts "
    "over one shared scan (exactly the pass-1 aggregation "
    "dsir_importance_weights collects; a wrong tokenizer, bucket hash, "
    "target slice, or count here breaks the driver hash). 'dsir_doc' "
    "— each pool doc's token size, the weights query's n_tokens cell. "
    "Only the driver-side ln() transform of these statistics stays "
    "rows-only (tail, mirror-pinned in tests/test_dsir.py). Plan: the "
    "inspection two-phase draw + one explode-agg over the shared scan "
    "+ a map-side size projection; the 256-row bucket table is "
    "checkpoint-pinned for its two consumers (rows + totals). NOT "
    "headline-timed: both constituents keep their standalone timings "
    "(never-re-measure rule).",
    tags=("sampling", "inspection", "dsir", "curation", "panel"),
)
def sampling_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.sampling import (
        inspection_sample as _inspect,
    )
    from data_pipeline_team5_spark.operators.textops import tokens_expr

    docs = table(spark, sf_dir, "documents")
    insp = (
        _inspect(
            docs.select("source", "doc_id", "lang", "n_chars"),
            "source", "doc_id", INSPECT_K,
        )
        .select(
            F.lit("inspect").alias("section"),
            F.col("source").alias("k1"),
            F.col("pick_rank").cast("bigint").alias("k2"),
            F.col("doc_id").cast("bigint").alias("n1"),
            F.col("n_chars").cast("bigint").alias("n2"),
            F.col("lang").alias("k3"),
        )
    )
    d = docs.select(
        "doc_id", "text", tokens_expr("text").alias("_t")
    )
    is_target = (F.col("doc_id") % DSIR_TARGET_MOD == 0) & F.col(
        "text"
    ).contains(DSIR_TARGET_TERM)
    ex = d.select(is_target.alias("tgt"), F.explode("_t").alias("tok"))
    # 256-row sufficient-statistics table, pinned for its two consumers
    # (bucket rows + the totals row) — the dash_movie_panel grid idiom
    bkt = (
        ex.groupBy(F.expr(_dsir_bucket_sql("tok")).alias("b"))
        .agg(
            F.count(F.when(F.col("tgt"), F.lit(1))).alias("ct"),
            F.count(F.when(~F.col("tgt"), F.lit(1))).alias("cr"),
        )
        .localCheckpoint()
    )
    bucket_rows = bkt.select(
        F.lit("dsir_bucket").alias("section"),
        F.lit(None).cast("string").alias("k1"),
        F.col("b").cast("bigint").alias("k2"),
        F.col("ct").alias("n1"),
        F.col("cr").alias("n2"),
        F.lit(None).cast("string").alias("k3"),
    )
    total_row = bkt.agg(
        F.sum("ct").alias("_st"), F.sum("cr").alias("_sr")
    ).select(
        F.lit("dsir_total").alias("section"),
        F.lit(None).cast("string").alias("k1"),
        F.lit(None).cast("bigint").alias("k2"),
        F.col("_st").alias("n1"),
        F.col("_sr").alias("n2"),
        F.lit(None).cast("string").alias("k3"),
    )
    doc_rows = d.filter(~is_target).select(
        F.lit("dsir_doc").alias("section"),
        F.lit(None).cast("string").alias("k1"),
        F.col("doc_id").cast("bigint").alias("k2"),
        F.size("_t").cast("bigint").alias("n1"),
        F.lit(None).cast("bigint").alias("n2"),
        F.lit(None).cast("string").alias("k3"),
    )
    return (
        insp.unionByName(bucket_rows)
        .unionByName(total_row)
        .unionByName(doc_rows)
        .orderBy("section", "k1", "k2")
    )
