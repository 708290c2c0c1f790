"""Top-K operators (SURVEY.md §2.6 O2/O4).

The reference's top-10s come pre-limited from the API (every raw table is a
top-10 snapshot, daily_csv_pipeline.py:28-38) or drawn in dashboards
(README.md:174-177); the engine *derives* them.

Scale notes:
- ``global_topk`` is orderBy+limit, which Catalyst plans as
  ``TakeOrderedAndProject``: each task keeps a k-row heap, the driver merges
  #tasks × k rows — no global sort ever materializes, safe at any input
  size for small k.
- ``grouped_topk`` is one shuffle on the group key; the rank filter is
  applied streaming inside each window partition, so only k rows per group
  survive the stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_topk(
    df: DataFrame, order_by: Column | str, k: int, tiebreak: str | None = None
) -> DataFrame:
    """O2: global top-k → ``TakeOrderedAndProject`` (no full sort).

    Pass ``tiebreak`` whenever ties at the k boundary are possible: without
    it, which tied row survives depends on partition arrival order — the
    nondeterminism the repo's oracle policy forbids everywhere else."""
    col = F.col(order_by) if isinstance(order_by, str) else order_by
    order = [col.desc()] + ([F.asc(tiebreak)] if tiebreak else [])
    return df.orderBy(*order).limit(k)


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    out: str = "rank_num",
    dense: bool = False,
) -> DataFrame:
    """O4: per-group top-k via rank ≤ k (ties kept — matching the daily
    chart semantics where rank 10 ties are all charted)."""
    # rank() ties share a rank (all rank-10 ties chart), so no tiebreak is
    # needed for determinism of the SET; add one to order_cols if a
    # deterministic ORDER also matters downstream.
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col))
    rank_fn = F.dense_rank() if dense else F.rank()
    return (
        df.withColumn(out, rank_fn.over(w))
        .filter(F.col(out) <= k)
    )
