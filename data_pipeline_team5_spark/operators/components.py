"""Connected components over near-dup pair graphs — pairs → dedup groups.

Near-dup detection (operators/dedup.py) emits PAIRS; the pipeline step
that actually deduplicates needs GROUPS: the transitive closure of the
pair relation, one survivor kept per component. Implemented with the
**large-star / small-star** algorithm (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii, "Connected Components in MapReduce and Beyond",
SoCC 2014): alternately rewrite the EDGE list —

- *large-star*: every node connects its strictly-larger neighbors to the
  minimum of its closed neighborhood;
- *small-star*: orient every edge toward the smaller endpoint, then every
  node connects its not-larger neighbors (and itself) to that minimum —

until the edge set reaches a fixed point, which is exactly the set of
stars centered at each component's minimum id. Label propagation
variants were tried first and REJECTED with measurements: min-label
propagation (with or without pointer-jump compression, shortcut-edge
augmentation, or quotient contraction) is Θ(n) rounds on chain-shaped
graphs — a 300-node shuffled path blew a 50-round budget every time —
while star rewriting contracts the GRAPH itself and is provably
O(log² n) rounds (a handful in practice: 8 for that same path, 6
for the sf0.1 cosine graph — measured, incl. the final fixed-point
confirmation round).

**Materialization (hard-won):** each round MUST rebuild the edge list
from files (parquet write + read), not from ``localCheckpoint``/
``checkpoint``. In this Spark build a checkpointed Dataset's plan still
embeds copies of its predecessor's plan, and a loop whose step references
its input N times compounds that N× per round — cost is flat for
~log_N(10⁶) rounds and then doubles every round (measured for
localCheckpoint AND reliable checkpoint, AQE on or off; the parquet
roundtrip is flat at 25+ rounds). File-backed iteration is also what a
100 TB run wants anyway: each round's edge list is a restart point, and
the list SHRINKS geometrically as components contract to stars.

Scale notes: each round is two groupBy-min aggregations over the current
edge list plus a distinct — all distributed, no driver data; the driver
loop reads only scalar counts from the just-written files. The initial
edge write doubles as the one-shot cut of the upstream pair-generation
pipeline (shingling + banding + verification runs exactly once into the
first file — at 100 TB re-running it per round would be K full corpus
passes instead of one).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star rewrite of an edge list.

    ``edges`` is (a, b); large-star treats it as symmetric (the caller
    maintains both directions implicitly by feeding each undirected edge
    once — this helper symmetrizes), small-star first orients every edge
    (larger → smaller). Output is a DISTINCT undirected edge list stored
    once per pair, (x, m) with m < x, self-loops removed.
    """
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    if large:
        # m(u) = min of closed neighborhood; connect v ∈ N(u), v > u to m
        m = (
            sym.groupBy("a")
            .agg(F.min("b").alias("_mb"))
            .select("a", F.least("a", "_mb").alias("m"))
        )
        out = (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("x"), F.col("m"))
        )
    else:
        # orient toward the smaller endpoint, then connect N(u) ∪ {u}
        # (all ≤ u) to the neighborhood minimum
        oriented = sym.filter(F.col("b") < F.col("a"))
        m = oriented.groupBy("a").agg(F.min("b").alias("m"))
        nbrs = oriented.join(m, "a").select(
            F.col("b").alias("x"), F.col("m")
        )
        selfs = m.select(F.col("a").alias("x"), F.col("m"))
        out = nbrs.unionByName(selfs)
    return (
        out.filter(F.col("x") != F.col("m"))
        .select(F.col("x").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(id) + (src, dst) undirected edges → (id, component) with component
    = min id in the connected component. Isolated vertices map to
    themselves.

    ``scratch_dir``: where per-round edge lists are materialized
    (alternating subdirectories; the final labels are also written there,
    so the directory must outlive downstream consumption). Defaults to a
    fresh local temp dir — fine for local mode; on a cluster pass a
    shared-filesystem path.

    ``max_iter`` bounds large+small-star rounds; the algorithm needs
    O(log² n) and in practice converges in a handful (measured: 8 on a 300-node
    shuffled path, 6 on the sf0.1 cosine graph). Running out raises —
    never silent partial components.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    spark = vertices.sparkSession
    root = scratch_dir or tempfile.mkdtemp(prefix="cc_edges_")

    writes = [0]

    def materialize(df: DataFrame, what: str) -> DataFrame:
        path = f"{root}/{what}_{writes[0] % 2}"
        writes[0] += 1
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    # normalize each edge to (larger, smaller), drop self-loops and
    # duplicates; the file write below is itself the one-shot cut of the
    # upstream pair pipeline (executed exactly once, then read from disk)
    e0 = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .select(
            F.greatest("s", "d").alias("a"), F.least("s", "d").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    cur = materialize(e0, "edges")

    converged = False
    for _ in range(max_iter):
        nxt = materialize(
            _star_round(_star_round(cur, large=True), large=False),
            "edges",
        )
        # fixed point ⇔ the two file-backed edge sets are identical;
        # both sides are distinct (x, m) lists so exceptAll is exact
        if (
            nxt.exceptAll(cur).limit(1).count() == 0
            and cur.exceptAll(nxt).limit(1).count() == 0
        ):
            cur = nxt
            converged = True
            break
        cur = nxt
    if not converged:
        # Silent partial components would split one group into several,
        # each with its own false survivor — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large+small-star rounds (O(log² n) expected) — raise "
            "max_iter"
        )
    # fixed point = stars (leaf, center): leaf's component is the center,
    # every other vertex (centers, isolated) is its own component
    labels = (
        vertices.select(F.col(id_col).alias("id"))
        .join(cur, F.col("id") == cur.a, "left")
        .select(
            "id", F.coalesce(cur.b, F.col("id")).alias("component")
        )
    )
    return materialize(labels, "labels")
