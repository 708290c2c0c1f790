"""compression_ratio_signal vs the stdlib-zlib mirror.

The catalog query is rows-only for the driver (no zlib in DuckDB SQL);
parity is pinned here instead: the SAME CPython zlib at the same pinned
level runs in the executors (mapInPandas) and in this mirror, so the
byte counts must match INTEGER-exactly and zratio bitwise (one double
division of those integers). Also pins that the fixture exercises all
three outcome branches of the keep rule."""

from __future__ import annotations

import zlib

from data_pipeline_team5_spark.plans.catalog import QUERIES, table
from data_pipeline_team5_spark.plans.text_family import (
    ZRATIO_HI,
    ZRATIO_LO,
)
from tests.conftest import SF_SMALL


def test_compression_signal_matches_stdlib_zlib(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    out = QUERIES["compression_ratio_signal"].fn(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in out} == set(docs)
    n_low = n_high = 0
    for r in out:
        raw = docs[r["doc_id"]].encode("utf-8")
        n_z = len(zlib.compress(raw, 6))
        assert r["n_bytes"] == len(raw)
        assert r["n_zbytes"] == n_z
        assert r["zratio"] == n_z / len(raw)  # same ints, same division
        assert r["keep"] == (ZRATIO_LO <= r["zratio"] <= ZRATIO_HI)
        n_low += int(r["zratio"] < ZRATIO_LO)
        n_high += int(r["zratio"] > ZRATIO_HI)
    # the cuts must both fire on the fixture, or the keep rule is
    # untested in one direction
    assert n_low > 0 and n_high > 0
    assert n_low + n_high < len(out)


def test_compression_signal_plan_is_arrow_batched_map_only(spark):
    """The plan must use the Arrow mapInPandas surface (never
    BatchEvalPython) and contain no shuffle before the output sort —
    the signal is a single map-side pass."""
    df = QUERIES["compression_ratio_signal"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan
