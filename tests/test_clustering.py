"""k-means (operators/similarity.py:kmeans_fit) — exact parity against an
independent pure-Python Lloyd's implementation, plus the convergence and
determinism properties the catalog docstring claims.

The engine's k-means is deterministic BY CONSTRUCTION (smallest-id init,
first-wins tie-break, floor-1e7 integer-quantized centroid sums), so the
strongest possible test is bitwise: a from-scratch reimplementation that
follows the same IEEE operation ORDER (sequential folds, left-to-right)
must land on identical assignments, centroids, and quantized inertia.
That catches wrong-algorithm bugs a property test can't (e.g. assignment
off-by-one, a stale-centroid iteration) because any drift anywhere
cascades into different clusters.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from data_pipeline_team5_spark.operators.similarity import (
    kmeans_assign,
    kmeans_fit,
)
from data_pipeline_team5_spark.plans.catalog import QUERIES, table
from tests.conftest import SF_SMALL

K, ITERS = 4, 3


def _load_vectors(sf_dir: str) -> dict[int, list[float]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet("
        f"'{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    return {vid: [float(x) for x in vec] for vid, vec in rows}


def _sqdist(a: list[float], b: list[float]) -> float:
    # Sequential left-to-right fold — the exact op order of
    # functions/vectors.py:sqdist_expr.
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc = acc + d * d
    return acc


def _py_kmeans(
    vecs: dict[int, list[float]], k: int, iters: int
) -> tuple[dict[int, tuple[int, float]], list[list[float]]]:
    cents = [vecs[vid] for vid in sorted(vecs)[:k]]

    def assign() -> dict[int, tuple[int, float]]:
        out = {}
        for vid, v in vecs.items():
            dists = [_sqdist(v, c) for c in cents]
            best = min(dists)
            # first-wins on exact ties, like the engine's when-chain
            cl = next(i for i, d in enumerate(dists) if d == best)
            out[vid] = (cl, best)
        return out

    for _ in range(iters):
        a = assign()
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for vid, (cl, _) in a.items():
            qs = [math.floor(x * 1e7) for x in vecs[vid]]
            if cl not in sums:
                sums[cl] = qs
                counts[cl] = 1
            else:
                sums[cl] = [s + q for s, q in zip(sums[cl], qs)]
                counts[cl] += 1
        cents = [
            [float(s) / 1e7 / counts[cl] for s in sums[cl]]
            if cl in sums
            else cents[cl]
            for cl in range(k)
        ]
    return assign(), cents


def test_kmeans_matches_pure_python_bitwise(spark):
    vecs = _load_vectors(SF_SMALL)
    emb = table(spark, SF_SMALL, "embeddings")
    assigned, cents = kmeans_fit(emb, k=K, iters=ITERS)
    got = {
        r["vec_id"]: (r["cluster"], r["_sqd"]) for r in assigned.collect()
    }
    want, want_cents = _py_kmeans(vecs, K, ITERS)
    assert got == want  # cluster ids AND winning distances, bitwise
    for c_spark, c_py in zip(cents, want_cents):
        assert list(c_spark) == c_py


def test_kmeans_inertia_non_increasing(spark):
    """Lloyd's invariant: total inertia after each update+reassign step
    never rises (quantized centroids perturb the textbook proof by <1e-7
    per dimension, far below the fixture's inter-point distances)."""
    emb = table(spark, SF_SMALL, "embeddings")

    def inertia(iters: int) -> float:
        assigned, _ = kmeans_fit(emb, k=K, iters=iters)
        return assigned.groupBy().sum("_sqd").collect()[0][0]

    vals = [inertia(i) for i in range(3)]
    assert vals[0] >= vals[1] >= vals[2]
    assert vals[2] < vals[0]  # and it actually moved on this fixture


def test_kmeans_rerun_is_bit_identical(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    a1, c1 = kmeans_fit(emb, k=K, iters=2)
    a2, c2 = kmeans_fit(emb, k=K, iters=2)
    assert [list(c) for c in c1] == [list(c) for c in c2]
    assert sorted(map(tuple, a1.collect())) == sorted(
        map(tuple, a2.collect())
    )


def test_kmeans_assign_ties_break_to_smaller_cluster(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # two identical centroids: exact tie — the when-chain must pick 0
    out = kmeans_assign(df, [[1.0, 0.0], [1.0, 0.0]]).collect()[0]
    assert out["cluster"] == 0


def test_embedding_kmeans_catalog_query(spark):
    q = QUERIES["embedding_kmeans"]
    rows = q.fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 8
    assert sum(r["n_vecs"] for r in rows) == 500
    assert all(r["inertia"] >= 0.0 for r in rows)


def test_kmeans_k_exceeding_corpus_degrades_gracefully(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 4.0]), (2, [9.0, 9.0])],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = kmeans_fit(df, k=8, iters=2)
    assert len(cents) == 3  # one centroid per vector, not an IndexError
    assert assigned.select("cluster").distinct().count() == 3
    assert assigned.agg({"_sqd": "sum"}).collect()[0][0] == 0.0


def test_kmeans_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no vectors"):
        kmeans_fit(df, k=4, iters=1)


def test_pq_blocks_match_pure_python_bitwise(spark):
    """Each PQ block's codes must equal an independent pure-Python
    Lloyd's run on that block's sub-vectors (same smallest-id init and
    quantized-mean update) — per-block exact parity, the same contract
    embedding_kmeans carries for the full vectors."""
    from data_pipeline_team5_spark.operators.similarity import pq_fit
    from data_pipeline_team5_spark.plans.similarity_family import (
        PQ_BLOCKS,
        PQ_CODES,
        PQ_ITERS,
    )

    vecs = _load_vectors(SF_SMALL)
    dim = len(next(iter(vecs.values())))
    step = dim // PQ_BLOCKS

    from pyspark.sql import functions as F

    emb = table(spark, SF_SMALL, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    codes, books = pq_fit(
        emb, m_blocks=PQ_BLOCKS, k=PQ_CODES, iters=PQ_ITERS
    )
    got = {
        (r["vec_id"], r["block"]): r["code"] for r in codes.collect()
    }
    assert len(books) == PQ_BLOCKS

    for b in range(PQ_BLOCKS):
        sub = {
            vid: v[b * step : (b + 1) * step] for vid, v in vecs.items()
        }
        assign, cents = _py_kmeans(sub, k=PQ_CODES, iters=PQ_ITERS)
        for vid, (cl, _) in assign.items():
            assert got[(vid, b)] == cl, (b, vid)
        assert books[b] == cents

    # every vector carries exactly one code per block
    from collections import Counter

    per_vec = Counter(vid for vid, _ in got)
    assert set(per_vec.values()) == {PQ_BLOCKS}
