"""Cross-engine DECIMAL→DOUBLE policy tests (functions/scalars.py).

Direct decimal→double casts are double-rounded past 2^53 in BOTH engines
(integer mantissa divided by a power of ten in double arithmetic) and the
two engines round DIFFERENTLY — at sf0.1 `dash_movie_panel`'s corr Σxy moment (standalone `dash_corr_matrix` until round 9)
(~1.9e16) diverged in the last ulp and broke the driver's value-hash gate.
The policy (scalars.dec_to_double / dec_to_double_sql) routes every
post-aggregation decimal through a string: decimal→string is exact digits
in both engines and string→double parsing is correctly rounded in both
(Java ``Double.parseDouble``, DuckDB fast_float), so the emitted double is
bitwise-identical everywhere at ANY magnitude.

These tests pin that claim with synthetic decimals straddling 2^53, so the
policy can't silently regress to the direct cast: the first test proves the
string route agrees bitwise across engines exactly where the direct casts
are known to disagree; the second drives dsum/dsum_sql end-to-end over
values whose sum lands in the danger zone.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from data_pipeline_team5_spark.functions.scalars import (
    dec_to_double,
    dec_to_double_sql,
    dsum,
    dsum_sql,
)

# Decimal literals chosen to straddle/exceed 2^53 = 9007199254740992 where
# doubles stop representing every integer: .5-ulp ties, a value whose cents
# force double rounding, and the observed sf0.1 corr-moment magnitude.
HARD_DECIMALS = [
    "9007199254740993.11",  # 2^53 + 1: first unrepresentable integer
    "9007199254740995.99",
    "18014398509481985.23",  # 2^54 + 1 region (4-ulp spacing)
    "19276938462846382.57",  # the sf0.1 Σxy magnitude that diverged
    "123456789012345678.99",  # well past: 16-ulp spacing
    "-9007199254740993.11",
    "0.01",
    "0.00",
]


def test_string_route_bitwise_identical_across_engines(spark):
    con = duckdb.connect()
    lits = ", ".join(f"(CAST('{d}' AS DECIMAL(38,2)))" for d in HARD_DECIMALS)
    duck_vals = [
        r[0]
        for r in con.execute(
            f"SELECT CAST(CAST(x AS VARCHAR) AS DOUBLE) "
            f"FROM (VALUES {lits}) t(x) ORDER BY x"
        ).fetchall()
    ]
    sdf = spark.createDataFrame(
        [(d,) for d in HARD_DECIMALS], "s STRING"
    ).select(F.col("s").cast("decimal(38,2)").alias("x"))
    spark_vals = [
        r[0]
        for r in sdf.select(dec_to_double(F.col("x")).alias("d"), "x")
        .orderBy("x")
        .collect()
    ]
    # Bitwise equality: compare struct representations, not approx.
    import struct

    for dv, sv, src in zip(duck_vals, spark_vals, sorted(HARD_DECIMALS, key=lambda s: float(s))):
        assert struct.pack("<d", dv) == struct.pack("<d", sv), (
            src,
            dv.hex(),
            sv.hex(),
        )


def test_direct_cast_is_why_the_policy_exists():
    """Documents the failure mode: DuckDB's direct decimal→double cast is
    NOT the correctly-rounded parse for at least one value past 2^53.
    If an engine upgrade makes every direct cast correctly rounded, this
    starts failing — then the string hop can be retired."""
    con = duckdb.connect()
    diverged = 0
    for d in HARD_DECIMALS:
        direct, routed = con.execute(
            f"SELECT CAST(CAST('{d}' AS DECIMAL(38,2)) AS DOUBLE),"
            f" CAST(CAST(CAST('{d}' AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)"
        ).fetchone()
        correct = float(d)  # Python parse: correctly rounded reference
        assert routed == correct, d
        if direct != routed:
            diverged += 1
    assert diverged > 0, (
        "direct decimal→double now correctly rounded in DuckDB — "
        "string route may be retirable"
    )


def test_dsum_pair_agrees_past_2_53(spark):
    """dsum vs dsum_sql over values whose DECIMAL sum exceeds 2^53:
    the aggregate pair must produce the bitwise-same double."""
    n = 4001
    # Per-group sum ≈ 2000 × 9.6e12 ≈ 1.9e16 > 2^53 (the danger zone),
    # with cents that don't vanish.
    rows = [(i % 2, 9_600_000_000_000.37 + i) for i in range(n)]
    sdf = spark.createDataFrame(rows, "k INT, v DOUBLE")
    got = {
        r["k"]: r["s"]
        for r in sdf.groupBy("k").agg(dsum("v", "s")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT k, {dsum_sql('v', 's')} FROM t GROUP BY k"
        ).fetchall()
    )
    assert got.keys() == want.keys()
    import struct

    for k in got:
        assert struct.pack("<d", got[k]) == struct.pack("<d", want[k]), k
