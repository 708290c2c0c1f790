"""Deterministic scalar/vector helper expressions shared by operators.

Everything here exists to make Spark results *bitwise* comparable with an
ANSI-SQL oracle (DuckDB) while staying JVM-side / codegen-friendly:

- money/quantity aggregates go through exact DECIMAL arithmetic (order-
  independent), then cast to DOUBLE once at the end;
- hashing uses MD5 (identical hex output in every engine) rather than
  engine-specific hash functions;
- vector math folds arrays left-to-right in DOUBLE so both engines perform
  the identical IEEE operation sequence.
"""

from data_pipeline_team5_spark.functions.scalars import (
    dsum,
    davg,
    norm_text,
    to_day,
)
from data_pipeline_team5_spark.functions.vectors import cosine_expr, dot_expr

__all__ = [
    "dsum",
    "davg",
    "norm_text",
    "to_day",
    "cosine_expr",
    "dot_expr",
]
