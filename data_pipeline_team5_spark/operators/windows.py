"""Window operators: the derived-field semantics of the reference's API.

The KOFIC API hands over precomputed window results that the reference merely
stores (daily_csv_pipeline.py:71-87: ``rank``, ``rankInten``, ``rankOldAndNew``,
``salesInten``, ``salesChange``, ``salesAcc``, ``audiAcc``); the engine must be
able to *derive* them from raw facts (SURVEY.md §2.5 W1-W6). Everything here
is plain ``pyspark.sql.Window`` — JVM-side, whole-stage-codegen friendly, and
at scale a single shuffle on the partition key per window spec (Catalyst
reuses one Exchange for window specs sharing a partitioning).

Scale notes:
- day-partition windows (W1) shuffle on ``show_range`` — high fan-out,
  low per-key cardinality (≤ #movies per day), never skewed.
- entity-timeline windows (W2-W5) shuffle on the entity key (``p_brand`` here,
  movie code in the reference) — bounded state per key, safe at 100 TB.
- running/cumulative sums are computed over DECIMAL and cast to DOUBLE at the
  end so the prefix sums are exact and order-independent (the oracle's window
  sum then matches bitwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import MONEY, dec_to_double


def day_rank_window(day_col: str, metric_col: str) -> WindowSpec:
    """W1: ranking within one day's chart, best metric first."""
    return Window.partitionBy(day_col).orderBy(F.desc(metric_col))


def timeline_window(key_col: str, day_col: str) -> WindowSpec:
    """W2-W5: one entity's day-ordered timeline."""
    return Window.partitionBy(key_col).orderBy(day_col)


def rank_in_day(df: DataFrame, day_col: str, metric_col: str,
                out: str = "rank_num") -> DataFrame:
    """W1 — ``rank`` (daily_csv_pipeline.py:72): chart position per day."""
    return df.withColumn(
        out, F.rank().over(day_rank_window(day_col, metric_col))
    )


def rank_change(df: DataFrame, key_col: str, day_col: str,
                rank_col: str = "rank_num",
                out: str = "rank_inten") -> DataFrame:
    """W2 — ``rankInten``: today's rank minus the previous charted day's.

    NULL on an entity's first appearance (the API reports 0 there only
    because it never re-derives; NULL is the honest derivation).
    """
    w = timeline_window(key_col, day_col)
    return df.withColumn(
        out, F.col(rank_col) - F.lag(rank_col).over(w)
    )


def new_old_flag(df: DataFrame, key_col: str, day_col: str,
                 out: str = "rank_old_and_new") -> DataFrame:
    """W3 — ``rankOldAndNew``: NEW on first chart appearance, OLD after."""
    w = timeline_window(key_col, day_col)
    return df.withColumn(
        out,
        F.when(F.lag(day_col).over(w).isNull(), F.lit("NEW")).otherwise(
            F.lit("OLD")
        ),
    )


def day_over_day(df: DataFrame, key_col: str, day_col: str, metric_col: str,
                 delta_out: str = "sales_inten",
                 pct_out: str = "sales_change") -> DataFrame:
    """W4 — ``salesInten``/``salesChange``: delta and % vs previous day.

    The % is one double division over exact inputs — both engines perform
    the identical IEEE op, so the oracle matches bitwise.
    """
    w = timeline_window(key_col, day_col)
    prev = F.lag(metric_col).over(w)
    return df.withColumn(delta_out, F.col(metric_col) - prev).withColumn(
        pct_out, F.lit(100.0) * (F.col(metric_col) - prev) / prev
    )


def cumulative(df: DataFrame, key_col: str, day_col: str, metric_col: str,
               out: str = "sales_acc", typ: str = MONEY) -> DataFrame:
    """W5 — ``salesAcc``/``audiAcc``: running total over the entity timeline.

    Summed in DECIMAL (exact, order-independent) and emitted via
    ``dec_to_double``'s string route. NOTE the cost model: window output
    is per-INPUT-row, so unlike the group-grain aggregates this pays the
    format+parse once per fact row — measured ~200 ns/row, +17% on the
    whole window pipeline at sf0.1 (SCALING.md round-9). Kept anyway:
    running money totals cross 2^53, where direct decimal→double casts
    round differently per engine and break bitwise parity. Swap
    ``dec_to_double`` for a plain ``.cast("double")`` here (and in
    ``moving_frame``) if bitwise-reproducible doubles aren't required.
    """
    w = (
        timeline_window(key_col, day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out, dec_to_double(F.sum(F.col(metric_col).cast(typ)).over(w))
    )


def moving_frame(df: DataFrame, key_col: str, day_col: str, metric_col: str,
                 n_rows: int = 7, out: str = "sales_7d",
                 typ: str = MONEY) -> Column | DataFrame:
    """W6 — trendline frame agg (README.md:193-196): last-N charted days."""
    w = (
        timeline_window(key_col, day_col)
        .rowsBetween(-(n_rows - 1), Window.currentRow)
    )
    return df.withColumn(
        out, dec_to_double(F.sum(F.col(metric_col).cast(typ)).over(w))
    )
