"""Vector math over ARRAY<FLOAT> embedding columns, JVM-side.

Dot products / cosines are computed as a left-to-right fold in DOUBLE via
``F.aggregate`` + ``F.zip_with`` — higher-order functions that run inside
whole-stage codegen (no Python). The sequential fold is deliberate: DuckDB's
``list_reduce`` performs the identical IEEE operation sequence, so oracle
comparisons are exact. At cluster scale the same expressions vectorize fine;
for very hot paths a pandas_udf with numpy BLAS is the drop-in alternative
(see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in DOUBLE: fold(zip_with(a,b,*), +)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    """Euclidean norm via the same sequential fold."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; both operands folded left-to-right in DOUBLE."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# Oracle-side fragments (DuckDB lambdas) kept adjacent for review parity.
# The seed 0.0 is prepended so list_reduce performs exactly the fold
# F.aggregate does (seed + x1 + x2 + …): without it DuckDB seeds with the
# first element (different op sequence, and an error on empty lists).
def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip("
        f"CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), p -> p[1] * p[2])),"
        f" (acc, x) -> acc + x)"
    )


def norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(CAST({a} AS DOUBLE[]), x -> x * x)),"
        f" (acc, x) -> acc + x))"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def sqdist_expr(a: Column, b: Column) -> Column:
    """Squared Euclidean distance, same sequential-fold discipline as
    :func:`dot_expr` — (x−y)² accumulated left-to-right in DOUBLE, so any
    independent reimplementation that folds in order (the pure-Python
    k-means mirror in tests/test_clustering.py) reproduces it bitwise."""
    diffs = F.zip_with(
        a, b, lambda x, y: x.cast("double") - y.cast("double")
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v)


def sqdist_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip("
        f"CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2]))),"
        f" (acc, x) -> acc + x)"
    )


def sqdist_sql_spark(vec: str, centroid: list[float]) -> str:
    """SPARK-dialect twin of :func:`sqdist_expr` against a LITERAL
    centroid, for single-parse ``F.expr`` construction (the Column route
    costs ~1 s of Py4J round-trips per call at k=8 × dim=64 — see
    ``kmeans_assign``). Exactly the same Catalyst fold as
    :func:`sqdist_expr`: zip_with diff in DOUBLE, then a left-to-right
    (x−y)² accumulate. Doubles are embedded as ``CAST('<repr>' AS
    DOUBLE)`` — Python ``repr`` round-trips the shortest decimal and
    Java's string→double parse is correctly rounded, so the JVM literal
    is bit-identical to the Python float."""
    lit = "array(" + ",".join(
        f"CAST('{float(x)!r}' AS DOUBLE)" for x in centroid
    ) + ")"
    return (
        f"aggregate(zip_with({vec}, {lit}, "
        f"(x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, w) -> acc + w * w)"
    )
