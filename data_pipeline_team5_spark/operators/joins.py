"""Join operators (SURVEY.md §2.3): standard joins + the as-of join.

The reference computes exactly one join-shaped thing — the pivot's N-way
full-outer alignment (box_office_data.sql:1-32, covered by
operators/pivoting.py) — but the engine ships the standard join surface the
dashboards/fixtures exercise (inner/left/semi/anti with broadcast hints) plus
an as-of join, the one temporal operator Spark lacks as a built-in.

As-of join, two implementations with identical semantics (cross-checked in
tests/test_relational.py):

1. ``asof_join`` — composition of built-in ops: UNION the left ("query") and
   right ("quote") streams, sort within each key partition by (ts, side,
   tiebreak), and carry the latest right-side row forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding frame. 100%
   JVM-side, one shuffle on the key, whole-stage codegen — this is the scale
   path and the default.
2. ``asof_join_pandas`` — cogrouped ``applyInPandas`` running
   ``pd.merge_asof`` per key group (SURVEY.md §2.10's vectorized-UDF
   surface). Arrow-batched; state is one key group at a time, so executor
   memory is bounded by the largest single key — fine when keys are users,
   dangerous when one key dominates (then: salt or fall back to 1).

Both are deterministic under timestamp ties: the right side is ordered by
(ts, tiebreak_col) and the match takes the greatest such pair ≤ the left ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right/quote rows, 1 = left/query rows


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    right_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` in the same key group (exact-ts matches allowed).

    Returns all left columns plus ``prefix+c`` for each c in right_cols
    (NULL when no prior right row exists).
    """
    from pyspark.sql import types as T

    lcols = left.columns
    payload = [c for c in right_cols if c not in (key,)]
    # An unknown-time right row can never be "the most recent prior quote";
    # unfiltered it would sort NULLS FIRST and leak into every match.
    right = right.filter(F.col(ts).isNotNull())
    # The whole right payload travels as ONE struct: filling each column
    # independently with last(ignorenulls) would back-fill a NULL field of
    # the matched row from an OLDER right row, stitching a composite row
    # that never existed (and diverging from merge_asof semantics).
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    tb_t = right.schema[tiebreak].dataType

    shared = {key, ts}  # columns both sides contribute to the union spine
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in payload]).alias("__r_payload"),
        F.col(tiebreak).alias("__r_tb"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in shared
        ],
    )
    l = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_t).alias("__r_payload"),
        F.lit(None).cast(tb_t).alias("__r_tb"),
        *[F.col(c) for c in lcols if c not in shared],
    )
    # Order: at an identical timestamp the right row sorts first (side 0),
    # so an exact-ts right row is visible to the left row — merge_asof's
    # allow_exact_matches=True semantics. __r_tb breaks right-side ts ties
    # deterministically (greatest wins, being last in the frame).
    w = (
        Window.partitionBy(key)
        .orderBy(ts, _SIDE, "__r_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).select(
        "*",
        F.last("__r_payload", ignorenulls=True).over(w).alias("__match"),
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        key,
        *[c for c in lcols if c != key],
        *[
            F.col(f"__match.{c}").alias(f"{prefix}{c}")
            for c in payload
        ],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    right_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Same semantics as :func:`asof_join` via cogrouped applyInPandas +
    ``pd.merge_asof`` (the §2.10 vectorized-Python surface)."""
    import pandas as pd

    payload = [c for c in right_cols if c != key]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"`{prefix}{c}` {right.schema[c].dataType.simpleString()}"
            for c in payload
        ]
    )
    lcols = left.columns

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        # A NULL left ts can never match any right row; merge_asof refuses
        # null merge keys outright, so route those rows around the merge
        # with NULL matches — the same output the window implementation
        # produces for them.
        null_ts = l_pdf[l_pdf[ts].isna()].copy()
        l_pdf = l_pdf[l_pdf[ts].notna()]
        r_pdf = r_pdf[r_pdf[ts].notna()]  # unknown-time quotes never match
        # merge_asof only needs the LEFT side ordered by the merge key; the
        # tiebreak is a right-side concept (the left may not even carry the
        # column).
        l_sorted = l_pdf.sort_values([ts], kind="mergesort")
        # Right side sorted by (ts, tiebreak): merge_asof takes the LAST row
        # ≤ the left ts, so the greatest tiebreak wins on right-side ts ties
        # — identical to the window composition's ordering, including NULL
        # tiebreaks: na_position='first' mirrors Spark's NULLS FIRST (a
        # NULL tiebreak loses the tie on both implementations).
        r_base = r_pdf.sort_values(
            [ts, tiebreak], kind="mergesort", na_position="first"
        )
        # Keep the bare ts as the merge key; payload (which may itself
        # include ts) rides along under the output prefix.
        r_sorted = pd.DataFrame({ts: r_base[ts].values})
        for c in payload:
            r_sorted[f"{prefix}{c}"] = r_base[c].values
        if r_sorted.empty:
            merged = l_sorted.copy()
            for c in payload:
                merged[f"{prefix}{c}"] = None
        else:
            merged = pd.merge_asof(
                l_sorted, r_sorted, on=ts, allow_exact_matches=True
            )
        if len(null_ts):
            for c in payload:
                null_ts[f"{prefix}{c}"] = None
            merged = pd.concat([merged, null_ts], ignore_index=True)
        return merged[lcols + [f"{prefix}{c}" for c in payload]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema=out_schema)
    )


def range_join_bucketed(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval-containment (range) join, Spark-first: point ts ∈
    [start, end) — as a bucketized EQUI-join, never a theta join.

    Expressed naively (``points.join(intervals, (ts >= start) & (ts <
    end))``) Spark must plan BroadcastNestedLoopJoin — every point probes
    every interval, O(|points|·|intervals|), the classic range-join scale
    killer. Instead each interval explodes to the 1-day buckets it covers
    (``F.sequence`` — interval spans are short relative to the bucket, so
    the fan-out is small and bounded), points hash to their single bucket,
    and the join runs as a shuffled/broadcast HASH join on the bucket key
    with the exact containment as a post-filter. A point's bucket is
    unique, so no dedup pass is needed. This is the same
    bucket-the-candidates pattern as the shingle/LSH/IVF joins
    (operators/dedup.py, similarity.py) applied to time ranges.
    """
    bucket = "__rj_bucket"
    p = points.withColumn(bucket, F.date_trunc("day", F.col(ts_col)))
    # Empty/inverted intervals match nothing — and must be dropped BEFORE
    # the sequence: F.sequence(a, b) with b < a generates a DESCENDING
    # range, which would fabricate buckets for an inverted interval.
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        bucket,
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col(start_col)),
                # end is exclusive: a zero-width tail on the bucket border
                # must not add a bucket
                F.date_trunc(
                    "day",
                    F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"),
                ),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    return (
        p.join(iv, bucket)
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop(bucket)
    )
