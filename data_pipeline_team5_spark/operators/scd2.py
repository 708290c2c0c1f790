"""SCD2 snapshot merge — the dbt `snapshots/` feature the reference
scaffolds but never implements (`/root/reference/dbt_project/dbt_project/
snapshots/` contains only .gitkeep; dbt snapshots are exactly this
slowly-changing-dimension type-2 merge).

Semantics (dbt "check" strategy): given the current dimension history and a
batch of updates as of one date,

- a key whose tracked values changed gets its open row closed
  (valid_to = as_of) and a new open row inserted (valid_from = as_of);
- an unseen key inserts a new open row;
- unchanged keys and already-closed history pass through untouched.

Implementation is pure joins/unions — one shuffle on the business key, no
driver-side loops. At 100 TB the dimension is orders of magnitude smaller
than the facts; the updates side is a day's delta, so the join is
broadcast-able on either side and the rewrite touches only the dimension
table (facts never rewrite — that is the point of SCD2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _changed(tracked: list[str]) -> Column:
    # Null-safe inequality on any tracked column.
    c = F.lit(False)
    for t in tracked:
        c = c | ~F.col(f"cur.{t}").eqNullSafe(F.col(f"upd.{t}"))
    return c


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    as_of: str,
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension.

    ``dim``: (key, *tracked, valid_from DATE, valid_to DATE|null — null
    means the open/current row). ``updates``: (key, *tracked). Returns the
    merged history with the same schema.
    """
    # Duplicate update keys would fan out the merge join and write a
    # contradictory history (a key both kept-open and closed, twice
    # inserted) — refuse ambiguous input loudly.
    n_dup = (
        updates.groupBy(key).count().filter(F.col("count") > 1).count()
    )
    if n_dup:
        raise ValueError(
            f"scd2_apply: updates contain {n_dup} duplicate key(s); "
            "deduplicate the batch (one row per key) before merging"
        )
    as_of_d = F.lit(as_of).cast("date")
    closed = dim.filter(F.col("valid_to").isNotNull())
    open_rows = dim.filter(F.col("valid_to").isNull()).alias("cur")
    upd = updates.alias("upd")

    joined = open_rows.join(upd, on=F.col("cur." + key) == F.col("upd." + key), how="full_outer")
    change = _changed(tracked)
    cur_key = F.col("cur." + key)
    upd_key = F.col("upd." + key)

    # Open rows: unchanged keys keep their row; changed keys close it.
    kept_open = joined.filter(
        cur_key.isNotNull() & (upd_key.isNull() | ~change)
    ).select(
        cur_key.alias(key),
        *[F.col(f"cur.{t}").alias(t) for t in tracked],
        F.col("cur.valid_from").alias("valid_from"),
        F.col("cur.valid_to").alias("valid_to"),
    )
    newly_closed = joined.filter(
        cur_key.isNotNull() & upd_key.isNotNull() & change
    ).select(
        cur_key.alias(key),
        *[F.col(f"cur.{t}").alias(t) for t in tracked],
        F.col("cur.valid_from").alias("valid_from"),
        as_of_d.alias("valid_to"),
    )
    # Inserts: changed keys (new version) and brand-new keys.
    inserted = joined.filter(
        upd_key.isNotNull() & (cur_key.isNull() | change)
    ).select(
        upd_key.alias(key),
        *[F.col(f"upd.{t}").alias(t) for t in tracked],
        as_of_d.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return closed.unionByName(kept_open).unionByName(newly_closed).unionByName(
        inserted
    )
