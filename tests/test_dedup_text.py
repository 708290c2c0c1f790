"""Dedup + text family invariants beyond the oracle gate:

- MinHash-LSH recall vs the exact-Jaccard pair set (the property that makes
  the sketch trustworthy as the 100 TB replacement for the exact join);
- SimHash places truly-near pairs within the Hamming threshold;
- exact dedup survivor determinism (min doc_id, idempotence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.dedup import (
    dedup_exact,
    doc_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    simhash_pairs,
    verify_jaccard,
)
from data_pipeline_team5_spark.plans.catalog import table
from tests.conftest import SF_MEDIUM


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_lsh_recall_vs_exact(spark):
    docs = table(spark, SF_MEDIUM, "documents")
    sh = doc_shingles(docs, "doc_id", "text").cache()
    exact = _pairs(jaccard_pairs(sh, 0.6))
    assert exact, "fixture should contain planted near-dup pairs"
    sig = minhash_signatures(sh, num_perm=32, seed=42)
    cand = lsh_candidate_pairs(sig, num_perm=32, bands=8, max_bucket=50)
    lsh = _pairs(verify_jaccard(cand, sh, 0.6))
    # Verification makes precision exact; recall must be total here (pairs
    # at Jaccard ≈ 0.99 collide in ≥1 of 8 bands with near-certainty).
    assert lsh == exact
    sh.unpersist()


def test_simhash_separates_near_from_far(spark):
    docs = table(spark, SF_MEDIUM, "documents")
    sh = doc_shingles(docs, "doc_id", "text").cache()
    near = _pairs(jaccard_pairs(sh, 0.6))
    sim_pairs = _pairs(simhash_pairs(simhash(sh), max_hamming=7))
    # every truly-near pair lands within the Hamming threshold...
    assert near <= sim_pairs
    # ...and the sketch is discriminative, not a pass-everything filter
    n_docs = docs.count()
    assert len(sim_pairs) < n_docs * (n_docs - 1) / 20
    sh.unpersist()


def test_simhash_combo_blocking_matches_single_block(spark):
    """VERDICT r5 #7: the 100 TB combo-key blocking (C(blocks, combo) keys
    per doc, combo-concatenated values — 2^(combo·width) buckets instead of
    2^width) must produce the IDENTICAL pair set: both schemes have the
    pigeonhole recall guarantee at max_hamming ≤ blocks − combo and the
    final Hamming filter is exact."""
    import pytest

    docs = table(spark, SF_MEDIUM, "documents")
    sim = simhash(doc_shingles(docs, "doc_id", "text")).cache()
    single = _pairs(simhash_pairs(sim, max_hamming=7))
    combo = _pairs(
        simhash_pairs(sim, max_hamming=7, blocks=12, combo=2)
    )
    assert combo == single and single
    # the guarantee boundary is enforced, not silently dropped
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(sim, max_hamming=8, blocks=8, combo=1)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(sim, max_hamming=11, blocks=12, combo=2)
    sim.unpersist()


def test_dedup_exact_survivor_is_min_and_idempotent(spark):
    docs = table(spark, SF_MEDIUM, "documents")
    key = F.md5(F.substring(F.col("text"), 1, 40))
    keyed = docs.withColumn("_key", key)
    out = dedup_exact(keyed, ["_key"], "doc_id").cache()
    # survivor = min doc_id per key
    expect = keyed.groupBy("_key").agg(F.min("doc_id").alias("doc_id"))
    assert out.select("_key", "doc_id").exceptAll(expect).count() == 0
    assert out.count() == expect.count()
    # idempotent: dedup of the dedup'd table is a no-op
    assert dedup_exact(out, ["_key"], "doc_id").count() == out.count()
    out.unpersist()


def test_components_raise_on_non_convergence(spark):
    import pytest

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    # a 5-node chain has diameter 4 > max_iter=2
    verts = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["src", "dst"]
    )
    # small_graph_max=0 forces the distributed star rounds — the round
    # budget is meaningless on the local fast path
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iter=2, small_graph_max=0)
    done = connected_components(
        verts, edges, max_iter=10, small_graph_max=0
    )
    assert {r.component for r in done.collect()} == {0}


def test_lsh_rejects_indivisible_bands(spark):
    import pytest

    from data_pipeline_team5_spark.operators.dedup import lsh_candidate_pairs

    with pytest.raises(ValueError, match="divisible"):
        lsh_candidate_pairs(None, num_perm=32, bands=5)


def test_components_reject_nonpositive_max_iter(spark):
    import pytest

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    verts = spark.createDataFrame([(1,)], ["id"])
    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(verts, edges, max_iter=0)


# --- zh support (round 5) ---------------------------------------------------
# Real Chinese is not whitespace-tokenized; these pin that (a) normalization
# PRESERVES CJK instead of blanking the document, (b) the marker-char
# language ID detects zh, and (c) the Spark expressions and their DuckDB SQL
# mirrors agree on non-ASCII inputs too (the oracle gate only ever feeds
# them ASCII fixtures).

_ZH_TEXTS = [
    ("z1", "我有一个梦想。这是一个关于自由的梦想!"),  # real zh, no spaces
    ("z2", "the cat sat on the mat and the dog is here"),  # plain en
    ("z3", "der Hund und die Katze ist ein Tier"),  # plain de
    ("z4", "data 的 pipeline 了 spark 是 training 在"),  # zh-function-word mix
]


def test_norm_text_preserves_cjk_and_zh_lang_id(spark, duck):
    from data_pipeline_team5_spark.functions.scalars import (
        norm_text,
        norm_text_sql,
    )
    from data_pipeline_team5_spark.operators.textops import (
        lang_id_expr,
        lang_id_sql,
        tokens_expr,
    )

    df = spark.createDataFrame(_ZH_TEXTS, "doc_id STRING, text STRING")
    got = {
        r.doc_id: (r.norm, r.pred)
        for r in df.select(
            "doc_id",
            norm_text("text").alias("norm"),
            lang_id_expr(tokens_expr("text")).alias("pred"),
        ).collect()
    }
    # CJK content survives normalization (punctuation still stripped)
    assert got["z1"][0] != ""
    assert "梦想" in got["z1"][0]
    assert got["z1"][1] == "zh"
    assert got["z2"][1] == "en"
    assert got["z3"][1] == "de"
    assert got["z4"][1] == "zh"

    # DuckDB mirror agrees on every row, non-ASCII included
    con = duck("/root/testdata/sf0.001")
    values = ", ".join(
        "('" + d + "', '" + t.replace("'", "''") + "')"
        for d, t in _ZH_TEXTS
    )
    sql = f"""
        SELECT doc_id, {norm_text_sql('text')} AS norm,
               {lang_id_sql(f"string_split({norm_text_sql('text')}, ' ')")}
                   AS pred
        FROM (VALUES {values}) AS v(doc_id, text)
    """
    for row in con.sql(sql).fetchall():
        assert got[row[0]] == (row[1], row[2]), row


# BPE_PATTERN edge inputs: the \x{...} CJK classes must parse and match
# identically in Java regex (Spark) and RE2 (DuckDB) — kana/hangul stay
# run-tokenized (not in the CJK-ideograph class), empty is 0 everywhere.
_BPE_EDGE_TEXTS = _ZH_TEXTS + [
    ("k1", "カタカナとひらがなのテキストです"),  # kana run, no spaces
    ("k2", "한국어 텍스트 예시입니다"),  # hangul runs
    ("e1", ""),  # empty
    ("m1", "mixed 中文 and English 123 with 日本語のかな too"),
    ("a1", "it's we've they'll don't 'quoted' x9y10"),  # contractions
]


def test_bpe_token_count_cross_engine_on_cjk(spark, duck):
    """ADVICE r6 #3: the textops comment claims Java-vs-RE2 agreement on
    the CJK classes is pinned here — this is that test. Three-way check
    over zh/kana/hangul/mixed/empty rows: Spark regexp_count == Spark
    size(regexp_extract_all) == DuckDB len(regexp_extract_all), plus the
    per-ideograph property that motivated the CJK branch."""
    from data_pipeline_team5_spark.operators.textops import (
        bpe_count_sql,
        bpe_token_count,
        bpe_tokens_expr,
    )

    df = spark.createDataFrame(_BPE_EDGE_TEXTS, "doc_id STRING, text STRING")
    got = {
        r.doc_id: (r.n, r.n_arr)
        for r in df.select(
            "doc_id",
            bpe_token_count("text").alias("n"),
            F.size(bpe_tokens_expr("text")).alias("n_arr"),
        ).collect()
    }
    # the count path (regexp_count) never materializes the array — it must
    # still equal the extraction path
    for doc_id, (n, n_arr) in got.items():
        assert n == n_arr, (doc_id, n, n_arr)
    assert got["e1"][0] == 0
    # per-ideograph: z1 has 17 CJK chars → at least 17 pretokens; the kana
    # run (not in the ideograph class) must NOT explode per-char
    assert got["z1"][0] >= 17
    assert got["k1"][0] < len("カタカナとひらがなのテキストです")

    con = duck("/root/testdata/sf0.001")
    values = ", ".join(
        "('" + d + "', '" + t.replace("'", "''") + "')"
        for d, t in _BPE_EDGE_TEXTS
    )
    sql = f"""
        SELECT doc_id, {bpe_count_sql('text')} AS n
        FROM (VALUES {values}) AS v(doc_id, text)
    """
    for doc_id, n in con.sql(sql).fetchall():
        assert got[doc_id][0] == n, (doc_id, got[doc_id][0], n)


def test_source_dup_report_semantics(spark, tmp_path):
    """source_dup_report on a constructed corpus with known dup structure:
    within-source dups, cross-source syndication, and a clean source —
    independent of whether the shipped fixtures contain exact dups
    (sf0.01 has none; sf0.1 has 8, all cross-source)."""
    import os

    from data_pipeline_team5_spark.plans.catalog import QUERIES

    rows = [
        # srcA: 3 docs, one internal dup pair → n_unique=2, dup_rate=1/3
        (0, "alpha beta gamma", "en", "srcA"),
        (1, "alpha beta gamma", "en", "srcA"),
        (2, "unique to a", "en", "srcA"),
        # srcB: 2 docs; one syndicates srcA's dup text → cross-source
        (3, "alpha  beta   gamma", "en", "srcB"),  # ws-normalized equal
        (4, "unique to b", "en", "srcB"),
        # srcC: clean
        (5, "unique to c", "en", "srcC"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r["source"]: r.asDict()
        for r in QUERIES["source_dup_report"].fn(spark, sf).collect()
    }
    a, b, c = got["srcA"], got["srcB"], got["srcC"]
    assert (a["n_docs"], a["n_unique"]) == (3, 2)
    assert abs(a["dup_rate"] - (1 - 2 / 3)) < 1e-15
    # the duplicated fingerprint also lives in srcB → syndicated in BOTH
    assert (a["n_syndicated"], b["n_syndicated"]) == (1, 1)
    assert b["dup_rate"] == 0.0  # srcB has no within-source dup
    assert (c["n_syndicated"], c["dup_rate"]) == (0, 0.0)
