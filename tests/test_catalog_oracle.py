"""Mini-driver: every catalog query vs its DuckDB oracle at sf0.001.

Replicates the driver's CORRECTNESS gate (row count + column names + order-
insensitive values) so a green run here predicts a green CORRECTNESS_r{N}.json.
Comparison is exact for ints/strings/dates and bitwise for doubles — the
engine's decimal policy (functions/scalars.py) is designed to make that hold.
"""

from __future__ import annotations

import datetime
import math

import pytest

import os

from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_SMALL

# Default sf0.001 for speed; the driver gate runs sf0.01 — sweep that with
#   ORACLE_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_catalog_oracle.py
ORACLE_SF = os.environ.get("ORACLE_SF_DIR", SF_SMALL)


def _norm_cell(v):
    # NULLs map to a sortable sentinel tuple so mixed None/value columns sort
    # deterministically instead of raising TypeError (sparse pivots, lag()).
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (1, "f", v)
    if isinstance(v, bool):
        return (1, "b", v)
    if isinstance(v, int):
        return (1, "i", v)
    if isinstance(v, datetime.datetime):
        return (1, v.isoformat(sep=" "))
    if isinstance(v, datetime.date):
        return (1, v.isoformat())
    if isinstance(v, list):
        return (1, tuple(_norm_cell(x) for x in v))
    return (1, v)


def _normalize(cols, rows):
    """Sort columns by name (driver behavior), then rows for order-insensitive
    comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return sorted_cols, out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, ORACLE_SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    if q.oracle is None:
        # Rows-only check (driver parity for non-SQL-expressible ops):
        # collect() must succeed AND produce at least one row — an empty
        # result from a rows-only query is almost always a broken plan.
        assert len(srows) > 0, f"{name}: rows-only query returned 0 rows"
        return

    con = duck(ORACLE_SF)
    res = con.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    s_cols, s_norm = _normalize(scols, srows)
    o_cols, o_norm = _normalize(ocols, orows)

    assert s_cols == o_cols, f"{name}: column names differ"
    assert len(s_norm) == len(o_norm), (
        f"{name}: row count {len(s_norm)} vs oracle {len(o_norm)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{mismatches[0]}"
    )
