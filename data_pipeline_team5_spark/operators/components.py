"""Connected components over near-dup pair graphs — pairs → dedup groups.

Near-dup detection (operators/dedup.py) emits PAIRS; the pipeline step that
actually deduplicates needs GROUPS: the transitive closure of the pair
relation, one survivor kept per component. This is the canonical iterative
Spark algorithm: min-label propagation — every node repeatedly adopts the
smallest label among itself and its neighbors; when no label changes, labels
ARE the component ids (the component's minimum doc_id).

Scale notes: each iteration is one join + one aggregation on the edge list
(distributed); the driver loop only counts changed labels (a scalar per
iteration) and runs O(diameter) times — near-dup graphs are
small-diameter, so convergence is a handful of rounds. ``localCheckpoint``
every iteration truncates the otherwise exponentially-growing lineage (the
standard pattern for iterative DataFrame algorithms). For planet-scale
graphs swap in the large-star/small-star variant; the loop shape is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id) + (src, dst) undirected edges → (id, component) with component
    = min id in the connected component. Isolated vertices map to
    themselves."""
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    # localCheckpoint BOTH iteration inputs, not just labels: the edge list
    # is re-joined every iteration, and without cutting its lineage each
    # pass re-executes the whole upstream pair-generation pipeline (for
    # near-dup edges that is shingling + banding + verification — measured
    # 9.5 s → 3.9 s on the sf0.1 curation preset; at 100 TB it would be
    # K full corpus passes instead of one).
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_chg"),
            )
            .localCheckpoint()
        )
        n_changed = updated.filter(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if n_changed == 0:
            return labels
    # Silent partial labels would split one component into several
    # "groups", each with its own false survivor — fail loudly instead.
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        f"({n_changed} labels still changing) — the graph diameter exceeds "
        "max_iter; raise max_iter or switch to the large-star/small-star "
        "variant for long-chain graphs"
    )
