"""semantic_dedup (plans/quality_family.py) — exact parity against an
independent pure-Python SemDeDup mirror, plus the structural invariants
the docstring claims.

The engine path is deterministic by construction (seedless k-means →
within-cluster sequential-fold cosine pairs → min-label components), so
the strongest test is bitwise: a from-scratch Python implementation that
follows the same IEEE op order must land on identical clusters, semantic
groups, and survivor sets. Reuses test_clustering's pure-Python Lloyd's
mirror so the two parity tests can never drift apart on k-means semantics.
"""

from __future__ import annotations

from data_pipeline_team5_spark.plans.catalog import QUERIES
from data_pipeline_team5_spark.plans.dedup_family import COSINE_T
from data_pipeline_team5_spark.plans.similarity_family import (
    KMEANS_ITERS,
    KMEANS_K,
)
from tests.conftest import SF_SMALL
from tests.test_clustering import _load_vectors, _py_kmeans


def _cosine(a: list[float], b: list[float]) -> float:
    # Exact op order of operators/dedup.py:cosine_cell_candidates:
    # sequential-fold dot and norms, then dot / (na * nb).
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    return dot / ((na ** 0.5) * (nb ** 0.5))


def _py_semantic_dedup(
    vecs: dict[int, list[float]]
) -> dict[int, tuple[int, int, bool]]:
    assign, _ = _py_kmeans(vecs, KMEANS_K, KMEANS_ITERS)
    by_cluster: dict[int, list[int]] = {}
    for vid, (cl, _) in assign.items():
        by_cluster.setdefault(cl, []).append(vid)
    parent = {vid: vid for vid in vecs}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in by_cluster.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                if _cosine(vecs[a], vecs[b]) >= COSINE_T:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        # union by min id keeps component = min member
                        lo, hi = min(ra, rb), max(ra, rb)
                        parent[hi] = lo
    return {
        vid: (assign[vid][0], find(vid), find(vid) == vid) for vid in vecs
    }


def test_semantic_dedup_matches_python_mirror(spark):
    vecs = _load_vectors(SF_SMALL)
    py = _py_semantic_dedup(vecs)
    rows = QUERIES["semantic_dedup"].fn(spark, SF_SMALL).collect()
    assert len(rows) == len(py)
    for r in rows:
        cl, grp, keep = py[r["vec_id"]]
        assert (r["cluster"], r["sem_group"], r["keep"]) == (cl, grp, keep), (
            f"vec {r['vec_id']}: engine "
            f"{(r['cluster'], r['sem_group'], r['keep'])} != mirror "
            f"{(cl, grp, keep)}"
        )
    # the fixture must actually exercise dedup: some group > 1 member
    assert any(not k for _, _, k in py.values())


def test_semantic_dedup_invariants(spark):
    rows = QUERIES["semantic_dedup"].fn(spark, SF_SMALL).collect()
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["sem_group"], []).append(r)
    for grp, members in by_group.items():
        # survivor is exactly the min vec_id of its group
        assert grp == min(m["vec_id"] for m in members)
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1 and keeps[0]["vec_id"] == grp
        # semantic groups never span k-means cells (edges are within-cell)
        assert len({m["cluster"] for m in members}) == 1
