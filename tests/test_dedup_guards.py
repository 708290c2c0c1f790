"""Production near-dup guard presets (VERDICT r2 #7).

The catalog's exact-oracle queries run `jaccard_pairs` unguarded (the oracle
requires no dropped shingles) and `minhash_lsh_neardup` runs with
`max_bucket=50`. Production runs set BOTH guards; these tests pin that at
fixture scale the guarded and unguarded pipelines agree exactly (no
stop-shingles / degenerate buckets exist at this SF, so the guards must be
no-ops), and that the guard code paths actually filter when forced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.dedup import (
    MIN_STOP_SHINGLE_DF,
    PRODUCTION_MAX_BUCKET,
    PRODUCTION_MAX_CELL,
    cosine_cell_candidates,
    cosine_cell_pairs,
    doc_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    production_max_doc_freq,
)
from data_pipeline_team5_spark.plans.catalog import table
from data_pipeline_team5_spark.plans.dedup_family import COSINE_T, JACCARD_T
from tests.conftest import SF_SMALL


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_production_max_doc_freq_floor_and_scale():
    assert production_max_doc_freq(100) == MIN_STOP_SHINGLE_DF
    assert production_max_doc_freq(10_000_000) == 100
    assert production_max_doc_freq(10**10) == 10**5


def test_guarded_jaccard_equals_unguarded_at_fixture_scale(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    guard = production_max_doc_freq(docs.count())
    guarded = jaccard_pairs(sh, JACCARD_T, max_doc_freq=guard)
    unguarded = jaccard_pairs(sh, JACCARD_T)
    assert _pairs(guarded) == _pairs(unguarded)
    # the fixture precondition that makes equality meaningful: the guard
    # threshold really is above every shingle's document frequency
    max_df = (
        sh.groupBy("s").agg(F.count("*").alias("df")).agg(F.max("df"))
    ).collect()[0][0]
    assert max_df <= guard


def test_max_doc_freq_guard_actually_filters_when_forced(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    # max_doc_freq=1 keeps only shingles unique to one doc — no shared
    # shingles survive, so no candidate pairs at all
    assert jaccard_pairs(sh, 0.0, max_doc_freq=1).count() == 0
    assert jaccard_pairs(sh, 0.0).count() > 0


def test_guarded_lsh_candidates_equal_unguarded_at_fixture_scale(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    sig = minhash_signatures(sh, num_perm=32, seed=42)
    guarded = lsh_candidate_pairs(
        sig, num_perm=32, bands=8, max_bucket=PRODUCTION_MAX_BUCKET
    )
    unguarded = lsh_candidate_pairs(sig, num_perm=32, bands=8)
    assert _pairs(guarded) == _pairs(unguarded)


def test_max_bucket_guard_actually_filters_when_forced(spark):
    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text")
    sig = minhash_signatures(sh, num_perm=32, seed=42)
    all_cand = lsh_candidate_pairs(sig, num_perm=32, bands=8)
    # max_bucket=1 forbids any doc from sharing a bucket — zero candidates
    assert (
        lsh_candidate_pairs(sig, num_perm=32, bands=8, max_bucket=1).count()
        == 0
    )
    assert all_cand.count() > 0


def _emb(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.col("label").alias("cell"),
        F.col("embedding").cast("array<double>").alias("v"),
    )


def _vpairs(df):
    return {(r.vec_a, r.vec_b) for r in df.collect()}


def test_guarded_cosine_cells_equal_unguarded_at_fixture_scale(spark):
    emb = _emb(spark, SF_SMALL)
    guarded = cosine_cell_pairs(emb, COSINE_T, max_cell=PRODUCTION_MAX_CELL)
    unguarded = cosine_cell_pairs(emb, COSINE_T)
    assert _vpairs(guarded) == _vpairs(unguarded)
    # precondition that makes equality meaningful: every cell is under the
    # cap, so the sub-quantizer provably never engages
    max_cn = (
        emb.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_cn <= PRODUCTION_MAX_CELL


def test_max_cell_guard_bounds_pair_count_on_forced_hot_cell(spark):
    # One degenerate cell: every fixture vector assigned to cell 0 — the
    # "junk cluster" failure VERDICT r4 #2 describes.
    hot = _emb(spark, SF_SMALL).withColumn("cell", F.lit(0))
    n = hot.count()
    unguarded = cosine_cell_candidates(hot).count()
    assert unguarded == n * (n - 1) // 2  # quadratic without the guard
    capped = cosine_cell_candidates(hot, max_cell=32).count()
    # ceil(log2(n/32)) sign bits split the cell ~2^bits ways; even granting
    # 4x sign imbalance the candidate count must fall far below quadratic
    assert capped < unguarded / 2
    # the guard narrows candidates, never invents them — and every verified
    # survivor is a true >= threshold pair from the unguarded set
    full = _vpairs(cosine_cell_pairs(hot, COSINE_T))
    assert _vpairs(cosine_cell_pairs(hot, COSINE_T, max_cell=32)) <= full


def test_max_cell_guard_is_noop_when_cells_fit(spark):
    emb = _emb(spark, SF_SMALL)
    # cap exactly at the largest real cell: bits = ceil(log2(cn/cap)) = 0
    # for every cell, so candidates must be identical to the unguarded run
    max_cn = (
        emb.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    assert (
        cosine_cell_candidates(emb, max_cell=max_cn).count()
        == cosine_cell_candidates(emb).count()
    )


def test_production_preset_matches_catalog_twins_at_fixture_scale(spark):
    """The shipped preset (pipeline.neardup_production_pairs) must equal its
    unguarded oracle-shaped catalog twins wherever the guards are no-ops —
    the property that makes the preset oracle-grade while carrying the
    100 TB guards (VERDICT r4 #4)."""
    from data_pipeline_team5_spark.pipeline import neardup_production_pairs
    from data_pipeline_team5_spark.plans.catalog import QUERIES

    docs = table(spark, SF_SMALL, "documents")
    for method, twin in (
        ("jaccard", "ngram_jaccard_neardup"),
        ("lsh", "minhash_lsh_neardup"),
    ):
        preset = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in neardup_production_pairs(
                docs, threshold=JACCARD_T, method=method
            ).collect()
        }
        catalog = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in QUERIES[twin].fn(spark, SF_SMALL).collect()
        }
        assert preset == catalog, method


def test_production_preset_rejects_unknown_method(spark):
    import pytest

    from data_pipeline_team5_spark.pipeline import neardup_production_pairs

    docs = table(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError, match="unknown near-dup method"):
        neardup_production_pairs(docs, method="bogus")


def test_shared_window_guard_noop_at_fixture_scale_and_filters_when_forced(
    spark,
):
    from data_pipeline_team5_spark.operators.dedup import shared_window_pairs
    from data_pipeline_team5_spark.plans.dedup_family import SUBSTR_W

    docs = table(spark, SF_SMALL, "documents")
    sh = doc_shingles(docs, "doc_id", "text", n=SUBSTR_W)
    guard = production_max_doc_freq(docs.count())
    guarded = shared_window_pairs(sh, min_shared=1, max_doc_freq=guard)
    unguarded = shared_window_pairs(sh, min_shared=1)
    assert _pairs(guarded) == _pairs(unguarded)
    assert len(_pairs(unguarded)) > 0  # the fixture really has matches
    # forcing max_doc_freq=1 drops every window shared by 2+ docs — the
    # guard path must then produce NO pairs (every pair needs a shared
    # window, and every shared window has df >= 2)
    forced = shared_window_pairs(sh, min_shared=1, max_doc_freq=1)
    assert _pairs(forced) == set()


def test_shared_window_containment_catches_jaccard_blind_containment(spark):
    """A short doc fully contained in a long doc: Jaccard dilutes with the
    long doc's size, but containment is 1.0 — the case the operator
    exists for."""
    from data_pipeline_team5_spark.operators.dedup import shared_window_pairs

    short = " ".join(f"w{i}" for i in range(12))
    long_ = short + " " + " ".join(f"x{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    sh = doc_shingles(df, "doc_id", "text", n=10)
    rows = shared_window_pairs(sh, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment == 1.0  # all 3 of the short doc's windows shared
    # and the Jaccard twin really is blind here
    jac = jaccard_pairs(sh, 0.6).collect()
    assert jac == []


def test_connected_components_long_shuffled_path(spark):
    """A 300-node path whose ids are shuffled forces many propagate+jump
    rounds (the regression class that crashed semantic_dedup at sf0.1:
    long chains exceeding the round budget, and per-cycle cost compounding
    under checkpoint-based materialization). Every node must label to the
    path's global minimum, at flat per-cycle cost."""
    import random

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(11)
    ids = list(range(300))
    perm = ids[:]
    rng.shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(len(perm) - 1)]
    v = spark.createDataFrame([(i,) for i in ids], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    # small_graph_max=0: this test pins the DISTRIBUTED star rounds (the
    # default gate would take the local fast path on 299 edges)
    out = connected_components(v, e, small_graph_max=0).collect()
    assert len(out) == 300
    assert all(r.component == 0 for r in out)


@pytest.mark.parametrize("small_graph_max", [0, 200_000])
def test_connected_components_matches_union_find(spark, small_graph_max):
    """Random-graph cross-check against an independent union-find: same
    partition into components AND the min-id representative convention —
    the full contract BOTH implementations must keep (parametrized over
    the distributed star rounds, small_graph_max=0, and the round-8
    local fast path, which this graph falls under by default)."""
    import random

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(5)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    v = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.id: r.component
        for r in connected_components(
            v, e, small_graph_max=small_graph_max
        ).collect()
    }

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, set[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), set()).add(i)
    expect = {min(g): g for g in groups.values()}
    mine: dict[int, set[int]] = {}
    for i, c in got.items():
        mine.setdefault(c, set()).add(i)
    assert mine == expect


def test_connected_components_scratch_conf_and_cleanup(spark, tmp_path):
    """Scratch lifecycle contract (ADVICE r7 #1): with the session conf
    set, the operator materializes under a unique subdir of that root,
    deletes the per-round edge lists on success, and keeps ONLY the
    labels parquet — which must stay readable because the returned
    DataFrame is backed by it. Forced onto the DISTRIBUTED path
    (small_graph_max=0): since round 9 the local fast path returns the
    labels LAZILY (its star list is driver-local, nothing to keep
    file-backed) and leaves scratch empty — asserted by the explicit-dir
    test below."""
    import os

    from data_pipeline_team5_spark.operators.components import (
        SCRATCH_CONF_KEY,
        connected_components,
    )

    root = str(tmp_path / "cc_scratch")
    os.makedirs(root)
    spark.conf.set(SCRATCH_CONF_KEY, root)
    try:
        v = spark.createDataFrame([(i,) for i in range(6)], ["id"])
        e = spark.createDataFrame(
            [(0, 1), (1, 2), (4, 5)], ["src", "dst"]
        )
        out = connected_components(v, e, small_graph_max=0)
        got = {r.id: r.component for r in out.collect()}
    finally:
        spark.conf.unset(SCRATCH_CONF_KEY)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    subdirs = os.listdir(root)
    assert len(subdirs) == 1 and subdirs[0].startswith("cc_")
    inner = os.listdir(os.path.join(root, subdirs[0]))
    # edge intermediates deleted; exactly the labels dir survives
    assert len(inner) == 1 and inner[0].startswith("labels_"), inner
    # the returned DataFrame still reads after cleanup (file-backed)
    assert out.count() == 6


def test_connected_components_explicit_scratch_dir(spark, tmp_path):
    """An explicit scratch_dir wins over the conf and gets the same
    edge-list cleanup. On the LOCAL fast path (this tiny graph) nothing
    survives in scratch — the round-9 lazy-labels contract: the result
    depends only on the driver-local star list and the vertices source,
    so no labels file is needed (and it must still read correctly after
    the edge files are gone)."""
    import os

    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    d = str(tmp_path / "explicit")
    v = spark.createDataFrame([(1,), (2,)], ["id"])
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    out = connected_components(v, e, scratch_dir=d)
    assert {r.id: r.component for r in out.collect()} == {1: 1, 2: 1}
    inner = [p for p in os.listdir(d) if not p.startswith(".")]
    assert inner == [], inner
    # re-execution after cleanup still works (lazy plan, local stars)
    assert out.count() == 2


def test_connected_components_gate_routes_by_edge_count(spark):
    """The small_graph_max gate must actually route: a graph OVER the
    gate takes the distributed star rounds (observable: a 1-round budget
    on a diameter-4 chain raises), the same graph UNDER the gate takes
    the local union-find (the budget is irrelevant there)."""
    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    v = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["src", "dst"]
    )
    # 4 edges > gate(3) → distributed; chain diameter defeats max_iter=1
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(v, e, max_iter=1, small_graph_max=3)
    # 4 edges ≤ gate(100) → local fast path; max_iter never consulted
    out = connected_components(v, e, max_iter=1, small_graph_max=100)
    assert {r.component for r in out.collect()} == {0}


def test_connected_components_string_ids_both_paths(spark):
    """Ids are not always numeric (near-dup over content-hash keys, user
    ids): both the local union-find and the star rounds must honor the
    same min-id (lexicographic for strings) representative convention."""
    from data_pipeline_team5_spark.operators.components import (
        connected_components,
    )

    v = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], ["id"]
    )
    e = spark.createDataFrame(
        [("c", "b"), ("b", "a"), ("e", "d")], ["src", "dst"]
    )
    expect = {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
    for gate in (0, 100):
        got = {
            r.id: r.component
            for r in connected_components(
                v, e, small_graph_max=gate
            ).collect()
        }
        assert got == expect, f"gate={gate}"


def test_quality_survivor_policy_differs_from_min_id(spark):
    """dedup_quality_survivor must actually exercise its retention
    policy on the fixture: exactly one keeper per group, and at least
    one multi-doc group whose highest-quality member is NOT the min-id
    doc (otherwise the query would be indistinguishable from
    dedup_components and the policy untested)."""
    from data_pipeline_team5_spark.plans.catalog import QUERIES
    from tests.conftest import SF_SMALL

    rows = QUERIES["dedup_quality_survivor"].fn(spark, SF_SMALL).collect()
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r["group_id"], []).append(r)
    for g, members in groups.items():
        assert sum(r["keep"] for r in members) == 1, g
        keeper = next(r for r in members if r["keep"])
        best = max(members, key=lambda r: (r["quality"], -r["doc_id"]))
        assert keeper["doc_id"] == best["doc_id"], g
    multi = [v for v in groups.values() if len(v) > 1]
    assert multi, "fixture has no multi-doc dedup groups"
    assert any(
        next(r["doc_id"] for r in v if r["keep"])
        != min(r["doc_id"] for r in v)
        for v in multi
    ), "quality survivor never diverged from the min-id policy"
