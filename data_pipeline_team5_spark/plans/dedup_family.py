"""Dedup family (north star ⊕; completes reference README.md:88,101,133's
claimed-but-unimplemented staging dedup): exact survivor selection plus the
near-dup ladder (exact n-gram Jaccard, MinHash-LSH, SimHash) over
``documents``.

Oracle strategy: every query here has a bitwise DuckDB oracle.

- exact dedup / inverted-index Jaccard / components: directly expressible.
- MinHash-LSH: the pipeline ENDS in exact-Jaccard verification, so its
  output is the exact ≥-threshold pair set restricted to LSH candidates;
  with full recall (pigeonhole-free but pinned empirically — see the
  recall == 1.0 test in tests/test_dedup_text.py) that equals the plain
  exact-Jaccard pair set, so the ngram oracle is ALSO the LSH oracle. The
  oracle thereby doubles as a recall gate: a banding miss at driver scale
  flips the row red instead of hiding in a rows-only check.
- SimHash: the published output (hamming distances) depends on the shingle
  hash, so the catalog query runs the sketch on an md5-derived 48-bit hash
  DuckDB reproduces bit-for-bit (operators/dedup.py:md5_hash48) and the
  oracle recomputes the whole sketch in SQL — a true bitwise check at any
  SF. Production presets keep the cheaper xxhash64 (hash choice doesn't
  change the operator's semantics, only the exact pair sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import norm_text, norm_text_sql
from data_pipeline_team5_spark.functions.vectors import cosine_sql
from data_pipeline_team5_spark.operators.dedup import (
    PRODUCTION_MAX_BUCKET,
    PRODUCTION_MAX_CELL,
    cosine_cell_pairs,
    dedup_exact,
    doc_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    md5_hash48,
    minhash_signatures,
    simhash,
    simhash_pairs,
    verify_jaccard,
)
from data_pipeline_team5_spark.operators.textops import shingles_sql
from data_pipeline_team5_spark.plans.catalog import register, table

JACCARD_T = 0.6

# Shared oracle CTE: per-doc distinct 3-gram shingle table (inverted index).
_SHINGLES = f"""
WITH toks AS (
    SELECT doc_id, string_split({norm_text_sql('text')}, ' ') AS t
    FROM documents
),
shing AS (
    SELECT doc_id, s
    FROM toks, UNNEST({shingles_sql('t')}) AS u(s)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shing GROUP BY doc_id)
"""


@register(
    "dedup_exact_survivor",
    oracle=f"""
        SELECT doc_id, lang, source, n_chars FROM (
            SELECT doc_id, lang, source, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY md5(substr({norm_text_sql('text')}, 1, 40))
                       ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
        ORDER BY doc_id
    """,
    doc="Exact dedup with deterministic survivor (min doc_id per key), the "
    "operator the reference's staging layer claims (README.md:88,101). Key "
    "here = md5 of the 40-char normalized prefix (prefix fingerprinting — "
    "catches boilerplate-headed duplicates). One shuffle on the key "
    "(operators/dedup.py:dedup_exact).",
    headline=True,
    tags=("dedup", "exact"),
)
def dedup_exact_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.substring(norm_text("text"), 1, 40))
    out = dedup_exact(docs.withColumn("_key", key), ["_key"], "doc_id")
    # survivor-grain output (~corpus size): no final global sort
    return out.select("doc_id", "lang", "source", "n_chars")


# The exact ≥-threshold Jaccard pair set. Oracle for ngram_jaccard_neardup
# AND minhash_lsh_neardup: LSH verification ends in exact Jaccard over
# candidates, so with full recall the two queries' outputs are equal sets.
def _jaccard_pairs_sql(extra_where: str = "") -> str:
    """Exact ≥-threshold Jaccard pair SQL; ``extra_where`` narrows the pair
    set (e.g. the incremental query's touching-new restriction)."""
    return f"""
    {_SHINGLES},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shing a JOIN shing b
          ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST((sa.n + sb.n - inter) AS DOUBLE)
               AS jaccard
    FROM pairs
    JOIN sizes sa ON pairs.doc_a = sa.doc_id
    JOIN sizes sb ON pairs.doc_b = sb.doc_id
    WHERE CAST(inter AS DOUBLE) / CAST((sa.n + sb.n - inter) AS DOUBLE)
          >= {JACCARD_T}
          {extra_where}
    ORDER BY doc_a, doc_b
"""


_JACCARD_PAIRS_SQL = _jaccard_pairs_sql()


@register(
    "ngram_jaccard_neardup",
    oracle=_JACCARD_PAIRS_SQL,
    doc="⊕ exact n-gram (3-shingle) Jaccard near-dup pairs via an inverted "
    "shingle index — candidates share ≥1 shingle (bucket join), never "
    "all-pairs (operators/dedup.py:jaccard_pairs). Left unguarded here for "
    "oracle exactness; production runs pass operators/dedup.py:"
    "production_max_doc_freq (1e-5 of corpus, floored at 64) — "
    "tests/test_dedup_guards.py pins guarded ≡ unguarded at fixture scale "
    "and that the guard really filters when forced.",
    headline=True,
    tags=("dedup", "neardup", "jaccard"),
)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    return jaccard_pairs(sh, JACCARD_T).orderBy("doc_a", "doc_b")


@register(
    "minhash_lsh_neardup",
    # Exact oracle: the pipeline's last stage is exact-Jaccard verification,
    # so its output is deterministic and — with full LSH recall, pinned in
    # tests/test_dedup_text.py — equals the plain exact-Jaccard pair set.
    # The driver row therefore ALSO gates recall: a banding miss at driver
    # SF shows up as a red row, not a hidden rows-only pass.
    oracle=_JACCARD_PAIRS_SQL,
    doc="⊕ MinHash(32 perms) + LSH(8 bands × 4 rows) near-dup pairs, "
    "verified with exact Jaccard ≥ 0.6 over candidates only — the 100 TB "
    "scale path: signature cost is one pass, pairing touches same-bucket "
    "docs only, degenerate buckets capped at PRODUCTION_MAX_BUCKET, and "
    "the verify stage shingles only docs appearing in a candidate pair "
    "(candidate_docs semi-join — the corpus pays its regex pass once, for "
    "signatures) "
    "(operators/dedup.py:minhash_signatures/lsh_candidate_pairs). pytest "
    "checks recall == 1.0 vs the exact-Jaccard oracle pairs at this scale.",
    tags=("dedup", "neardup", "lsh"),
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.dedup import candidate_docs

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    sig = minhash_signatures(sh, num_perm=32, seed=42)
    # PRODUCTION_MAX_BUCKET (not a literal): the catalog query and the
    # tested production preset must tune together (ADVICE r4).
    cand = lsh_candidate_pairs(
        sig, num_perm=32, bands=8, max_bucket=PRODUCTION_MAX_BUCKET
    ).localCheckpoint()
    ver_sh = doc_shingles(
        candidate_docs(cand, docs.select("doc_id", "text")), "doc_id", "text"
    )
    return verify_jaccard(cand, ver_sh, JACCARD_T).orderBy("doc_a", "doc_b")


@register(
    "neardup_incremental",
    # Exact oracle by the same argument as minhash_lsh_neardup (recall==1
    # at driver SF + exact verification): the incremental pair set equals
    # the full exact-Jaccard pairs RESTRICTED to pairs touching the "new"
    # batch (doc_id % 3 = 0). A banding or probe miss flips the row red.
    oracle=_jaccard_pairs_sql(
        "AND (doc_a % 3 = 0 OR doc_b % 3 = 0)"
    ),
    doc="⊕ incremental (daily-ingest) near-dup: the newest third of the "
    "corpus (doc_id % 3 = 0) probed against the other two thirds as the "
    "indexed corpus — new-vs-index bucket joins plus new-vs-new banding, "
    "never index-vs-index (operators/dedup.py:incremental_lsh_candidates; "
    "combined-membership bucket cap at PRODUCTION_MAX_BUCKET), then exact-"
    "Jaccard verification over CANDIDATE DOCS ONLY (the corpus is left-"
    "semi-joined to the candidate ids before shingling — verification is "
    "candidate-linear, VERDICT r5 #1). At 100 TB the index side is a "
    "stored signature table (pipeline.build_signature_index) and daily "
    "cost is O(batch + candidates); full ≡ within(index) ∪ incremental is "
    "property-tested in tests/test_properties.py.",
    tags=("dedup", "neardup", "incremental"),
)
def neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.pipeline import neardup_incremental_pairs

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return neardup_incremental_pairs(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
        threshold=JACCARD_T,
        max_bucket=PRODUCTION_MAX_BUCKET,
    ).orderBy("doc_a", "doc_b")


COSINE_T = 0.35  # upper tail of the fixture's near-random vectors; a real
# corpus puts true near-dups at >= 0.9 and this query's shape is unchanged.


@register(
    "embedding_cosine_neardup",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        )
        SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
               {cosine_sql('a.v', 'b.v')} AS cosine
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {cosine_sql('a.v', 'b.v')} >= {COSINE_T}
        ORDER BY a.label, vec_a, vec_b
    """,
    doc="⊕ embedding-cosine near-dup pairs, the fifth north-star dedup "
    "method: candidates are blocked on the coarse-quantizer cell (the "
    "fixture's `label`, i.e. a precomputed IVF assignment) so the "
    "self-join is per-cell, never all-pairs — and cells past "
    "PRODUCTION_MAX_CELL are sub-quantized with axis-aligned sign bits "
    "(operators/dedup.py:cosine_cell_candidates, VERDICT r4 #2 — the "
    "embedding analogue of lsh_candidate_pairs' max_bucket), so a skewed "
    "junk cluster can never make one task materialize ~n²/2 pairs at "
    "100 TB. Fixture cells sit far below the cap at every SF (pinned in "
    "tests/test_dedup_guards.py), so the exact DuckDB oracle is provably "
    "unaffected. Norms are projected once per row before the join; cosines "
    "use the sequential-fold policy (functions/vectors.py) so the oracle "
    "matches bitwise.",
    tags=("dedup", "neardup", "embedding"),
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").alias("cell"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return (
        cosine_cell_pairs(emb, COSINE_T, max_cell=PRODUCTION_MAX_CELL)
        .select(
            F.col("cell").alias("label"), "vec_a", "vec_b", "cosine"
        )
        .orderBy("label", "vec_a", "vec_b")
    )


# SQL twin of operators/dedup.py:simhash over the md5-derived 48-bit hash
# (md5_hash48): per-bit ±1 vote sums, sign-packed, then brute all-pairs
# Hamming in the oracle (the Spark side is block-joined, but pigeonhole
# completeness at Hamming ≤ 7 makes the two pair sets provably equal).
_SIM_BITS = 48
_SIM_H48_SQL = "CAST(('0x' || substr(md5(s), 21, 12)) AS BIGINT)"
_SIM_VOTES = ",\n               ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(_SIM_BITS)
)
_SIM_PACK = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIM_BITS)
)


@register(
    "simhash_neardup",
    oracle=f"""
        {_SHINGLES},
        hs AS (
            SELECT doc_id, {_SIM_H48_SQL} AS h FROM shing
        ),
        votes AS (
            SELECT doc_id,
               {_SIM_VOTES}
            FROM hs GROUP BY doc_id
        ),
        sim AS (
            SELECT doc_id, CAST({_SIM_PACK} AS BIGINT) AS sh FROM votes
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 7
        ORDER BY doc_a, doc_b
    """,
    doc="⊕ 48-bit SimHash near-dup pairs, Hamming ≤ 7, blocked on 8 × "
    "6-bit chunks (pigeonhole guarantees full recall at Hamming ≤ 7 — "
    "no missed pairs at this threshold). One shuffle for the "
    "signature, one equi-join for pairing (operators/dedup.py:simhash*). "
    "This catalog instance runs the sketch on the md5-derived hash both "
    "engines compute identically, so the oracle re-derives the ENTIRE "
    "sketch in SQL and checks it bitwise; production presets keep "
    "xxhash64 (hash choice changes only the sample, not the semantics).",
    tags=("dedup", "neardup", "simhash"),
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    sim = simhash(sh, hash_expr=md5_hash48("s"))
    return simhash_pairs(sim, max_hamming=7).orderBy("doc_a", "doc_b")


@register(
    "dedup_components",
    oracle=f"""
        {_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)},
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM shing a
            JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
            JOIN sizes sa ON a.doc_id = sa.doc_id
            JOIN sizes sb ON b.doc_id = sb.doc_id
            GROUP BY 1, 2
            HAVING CAST(COUNT(*) AS DOUBLE) /
                   CAST((MIN(sa.n) + MIN(sb.n) - COUNT(*)) AS DOUBLE)
                   >= {JACCARD_T}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, lab) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON r.node = e.a
        )
        SELECT node AS doc_id,
               MIN(lab) AS group_id,
               (node = MIN(lab)) AS is_survivor
        FROM reach
        GROUP BY node
        ORDER BY doc_id
    """,
    doc="⊕ pairs → dedup GROUPS: connected components of the exact-Jaccard "
    "near-dup graph via large-star/small-star edge rewriting "
    "(operators/components.py — O(log² n) rounds, per-round parquet "
    "materialization; the prompt-level 'iterative "
    "algorithm' case). group_id = the component's minimum doc_id; "
    "is_survivor marks the one document kept per group — the row a "
    "training-data pipeline actually filters on. Oracle = transitive "
    "closure by recursive CTE over the same pair set.",
    tags=("dedup", "components", "iterative"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    pairs = jaccard_pairs(sh, JACCARD_T).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("group_id"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )  # doc-grain output: no final global sort


# Exact-substring window dedup (round 7): W = 10 tokens ≈ the 50-char scale
# published exact-substring dedup uses, sized to this fixture's ~56-token
# docs the way 50 BPE tokens fit web pages.
SUBSTR_W = 10

_SHINGLES_W10 = f"""
WITH toks AS (
    SELECT doc_id, string_split({norm_text_sql('text')}, ' ') AS t
    FROM documents
),
shing AS (
    SELECT doc_id, s
    FROM toks, UNNEST({shingles_sql('t', SUBSTR_W)}) AS u(s)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shing GROUP BY doc_id)
"""


@register(
    "exact_substring_neardup",
    oracle=f"""
        {_SHINGLES_W10},
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_shared
            FROM shing a JOIN shing b
              ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(n_shared AS BIGINT) AS n_shared,
               CAST(n_shared AS DOUBLE)
                   / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
        FROM pairs
        JOIN sizes sa ON pairs.doc_a = sa.doc_id
        JOIN sizes sb ON pairs.doc_b = sb.doc_id
        ORDER BY doc_a, doc_b
    """,
    doc="⊕ exact-substring near-dup pairs: docs sharing ≥1 exact 10-token "
    "window, with shared-window count and Broder containment "
    "inter/min(na,nb) — the window form of exact-substring training-data "
    "dedup (Lee et al. 2022's published method, re-expressed relationally: "
    "a shared run of ≥W tokens leaves ≥1 shared window, and containment "
    "catches the short-doc-inside-long-doc case that DILUTES Jaccard "
    "below any threshold — the one shape the rest of the dedup ladder is "
    "blind to). Same inverted-index bucket-join scale shape as "
    "ngram_jaccard_neardup, W=10 windows instead of 3-gram shingles — "
    "longer windows mean rarer buckets, so the unguarded pair stream is "
    "SMALLER than the 3-gram query's; production passes max_doc_freq to "
    "drop boilerplate stop-windows (operators/dedup.py:"
    "shared_window_pairs).",
    headline=True,
    tags=("dedup", "neardup", "substring"),
)
def exact_substring_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.dedup import shared_window_pairs

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text", n=SUBSTR_W)
    return shared_window_pairs(sh, min_shared=1).orderBy("doc_a", "doc_b")


@register(
    "dedup_quality_survivor",
    oracle=f"""
        {_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)},
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM shing a
            JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
            JOIN sizes sa ON a.doc_id = sa.doc_id
            JOIN sizes sb ON b.doc_id = sb.doc_id
            GROUP BY 1, 2
            HAVING CAST(COUNT(*) AS DOUBLE) /
                   CAST((MIN(sa.n) + MIN(sb.n) - COUNT(*)) AS DOUBLE)
                   >= {JACCARD_T}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, lab) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON r.node = e.a
        ),
        comp AS (
            SELECT node AS doc_id, MIN(lab) AS group_id
            FROM reach GROUP BY node
        ),
        scored AS (
            SELECT c.doc_id, c.group_id,
                   (0.4 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0) + 0.3 * (1.0 - (CAST(len(list_filter(t, t -> t IN ('a', 'and', 'das', 'der', 'die', 'ein', 'el', 'es', 'est', 'et', 'in', 'is', 'ist', 'la', 'las', 'le', 'les', 'los', 'of', 'the', 'to', 'una', 'und', 'une', 'y'))) AS DOUBLE) / CAST(len(t) AS DOUBLE))) + 0.3 * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE))) AS quality
            FROM comp c JOIN toks USING (doc_id)
        )
        SELECT doc_id, group_id, quality,
               ROW_NUMBER() OVER (
                   PARTITION BY group_id
                   ORDER BY quality DESC, doc_id
               ) = 1 AS keep
        FROM scored
        ORDER BY doc_id
    """,
    doc="⊕ QUALITY-AWARE dedup survivor selection (round 9): per near-dup "
    "component, keep the HIGHEST-QUALITY member (the text-profile linear "
    "score; ties break to the smaller doc_id) instead of "
    "dedup_components' min-id convention — the retention policy "
    "production pipelines actually want, where the canonical copy should "
    "be the cleanest one, not the first-crawled one. Composition: the "
    "same exact-Jaccard component set (large-star/small-star rewriting; "
    "recursive-CTE oracle), one shuffle-free quality projection over the "
    "docs scan, and a row_number window on the component grain — one "
    "extra group_id exchange over dedup_components, carrying (id, group, "
    "double) rows, never text. Quality doubles are the bitwise-matched "
    "text_doc_profile arithmetic, so the DESC comparison and therefore "
    "the survivor choice are engine-identical.",
    tags=("dedup", "components", "quality", "curation"),
)
def dedup_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )
    from data_pipeline_team5_spark.operators.textops import (
        quality_exprs,
        tokens_expr,
    )

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    pairs = jaccard_pairs(sh, JACCARD_T).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )
    q = quality_exprs(tokens_expr("text"))["quality"]
    scored = (
        docs.select("doc_id", q.alias("quality"))
        .join(comp, comp.id == F.col("doc_id"))
        .select("doc_id", F.col("component").alias("group_id"), "quality")
    )
    w = Window.partitionBy("group_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return scored.select(
        "doc_id",
        "group_id",
        "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    ).orderBy("doc_id")


@register(
    "dedup_cluster_size_report",
    oracle=f"""
        {_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)},
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM shing a
            JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
            JOIN sizes sa ON a.doc_id = sa.doc_id
            JOIN sizes sb ON b.doc_id = sb.doc_id
            GROUP BY 1, 2
            HAVING CAST(COUNT(*) AS DOUBLE) /
                   CAST((MIN(sa.n) + MIN(sb.n) - COUNT(*)) AS DOUBLE)
                   >= {JACCARD_T}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, lab) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON r.node = e.a
        ),
        comp AS (
            SELECT node AS doc_id, MIN(lab) AS group_id
            FROM reach GROUP BY node
        ),
        per_cluster AS (
            SELECT group_id, COUNT(*) AS cluster_size
            FROM comp GROUP BY group_id
        )
        SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
               CAST(SUM(cluster_size) - COUNT(*) AS BIGINT) AS n_dropped,
               CAST(SUM(cluster_size) - COUNT(*) AS DOUBLE)
                   / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                   AS drop_frac
        FROM per_cluster
        GROUP BY cluster_size
        ORDER BY cluster_size
    """,
    doc="⊕ dedup cluster-size report (round 9): the observability table a "
    "data team reads after a dedup run — how many near-dup clusters of "
    "each size exist, how many documents they hold, how many a "
    "one-survivor-per-cluster policy drops, and each size's share of "
    "the corpus. Size-1 rows are the untouched singletons; a sudden "
    "mass at large sizes is the signature of template spam or a "
    "crawler loop. Composition: the SAME exact-Jaccard component set "
    "as dedup_components (recursive-CTE oracle), then two tiny "
    "aggregations — component grain → cluster sizes → size histogram — "
    "so beyond the pair stage the report adds two exchanges over "
    "component-count rows, never documents. drop_frac's denominator "
    "rides in as a broadcast one-row aggregate (no driver collect).",
    tags=("dedup", "components", "report", "observability"),
)
def dedup_cluster_size_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    pairs = jaccard_pairs(sh, JACCARD_T).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )
    per_cluster = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    n_total = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    return (
        per_cluster.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
            (F.sum("cluster_size") - F.count(F.lit(1))).alias("n_dropped"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            "n_dropped",
            (F.col("n_dropped").cast("double") / F.col("_n")).alias(
                "drop_frac"
            ),
        )
        .orderBy("cluster_size")
    )
