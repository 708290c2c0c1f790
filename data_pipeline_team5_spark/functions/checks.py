"""Data-quality checks — the dbt tests the reference *claimed* but never
shipped (README.md:144-148 "dbt의 테스트 기능을 활용하여 데이터 무결성을 자동으로
확인" — aspirational; its tests/ dir holds only .gitkeep, SURVEY.md §5).

Each check is one aggregate job returning the violation count, composed into
``run_checks`` for a dbt-`schema.yml`-like declarative suite. At scale these
are partial-aggregated scans — the cheapest possible verification shape; run
them post-write on the day's partition, not the whole table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_nulls(df: DataFrame, cols: Sequence[str]) -> dict[str, int]:
    """dbt ``not_null``: violations per column, one job for all columns."""
    row = df.agg(
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(c)
            for c in cols
        ]
    ).collect()[0]
    return row.asDict()


def count_duplicate_keys(df: DataFrame, key_cols: Sequence[str]) -> int:
    """dbt ``unique`` (composite): number of keys appearing more than once."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )


def count_unaccepted(
    df: DataFrame, col: str, accepted: Sequence[str], allow_null: bool = True
) -> int:
    """dbt ``accepted_values``: rows outside the accepted set."""
    cond = ~F.col(col).isin(list(accepted))
    if allow_null:
        cond = cond & F.col(col).isNotNull()
    else:
        cond = cond | F.col(col).isNull()
    return df.filter(cond).count()


def count_orphans(
    df: DataFrame, col: str, parent: DataFrame, parent_col: str
) -> int:
    """dbt ``relationships``: non-null FK values with no matching parent row.

    Left-anti join on the key — Spark broadcasts the smaller side; at scale
    project the parent to its key column first (as callers here do) so the
    build side is key-only.
    """
    child = df.select(F.col(col).alias("_fk")).filter(
        F.col("_fk").isNotNull()
    )
    keys = parent.select(F.col(parent_col).alias("_fk")).distinct()
    return child.join(keys, "_fk", "left_anti").count()


def run_checks(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    accepted_values: dict[str, Sequence[str]] | None = None,
    relationships: Sequence[tuple[str, DataFrame, str]] = (),
) -> dict[str, int]:
    """Declarative suite: returns {check_name: violation_count}; all zeros
    means the table passes its schema contract. ``relationships`` entries
    are (fk_col, parent_df, parent_col) — dbt's fourth built-in test."""
    out: dict[str, int] = {}
    if not_null:
        for c, n in count_nulls(df, not_null).items():
            out[f"not_null:{c}"] = n
    for keys in unique:
        out[f"unique:{','.join(keys)}"] = count_duplicate_keys(df, keys)
    for c, vals in (accepted_values or {}).items():
        out[f"accepted_values:{c}"] = count_unaccepted(df, c, vals)
    for fk, parent, pcol in relationships:
        out[f"relationships:{fk}->{pcol}"] = count_orphans(
            df, fk, parent, pcol
        )
    return out


def check_freshness(
    df: DataFrame, ts_col: str, max_lag_days: int, as_of: str
) -> int:
    """dbt source-freshness: days the newest row lags behind ``as_of``
    beyond the allowed window (0 = fresh). The reference's clock-coupled
    DAGs had no freshness gate at all — dbt ran at 00:05 hoping the 00:00
    ingest had landed (SURVEY.md §3.2); this is the data-dependent check
    that replaces that hope. One MAX aggregate — map-side at any scale."""
    # cast at the source: string/timestamp ts columns all surface as DATE
    row = df.agg(F.max(F.col(ts_col).cast("date")).alias("mx")).collect()[0]
    if row["mx"] is None:
        return max_lag_days + 1  # empty source: maximally stale
    import datetime

    newest = row["mx"]
    lag = (datetime.date.fromisoformat(as_of) - newest).days
    return max(0, lag - max_lag_days)
