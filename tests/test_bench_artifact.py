"""The bench stdout artifact must stay parseable by the recording harness.

BENCH_r07.json shipped ``"parsed": null`` because the single JSON line
(31 timings + a 31-entry spread map, full float precision) outgrew the
harness's bounded tail capture (observed 2000 chars) — the round's whole
performance grading surface vanished. These tests pin the fix
(VERDICT r7 #1): the line built from the LIVE catalog fits with headroom,
and the runtime fallback degrades by dropping fastest-query entries, never
by emitting invalid JSON.

No SparkSession needed: this is pure line-budget arithmetic over the
registered catalog names.
"""

from __future__ import annotations

import json

import bench
from data_pipeline_team5_spark.plans.catalog import QUERIES


def _line_for(timings: dict[str, float]) -> str:
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "passes": 3,
        "noise": 0.2179,
        "calib_sec": 0.1944,
        "calib_mt_sec": 0.3861,
        "contended": False,
    }
    return json.dumps(bench.bounded_line(out), separators=(",", ":"))


def _headline_names() -> list[str]:
    names = [n for n, q in QUERIES.items() if q.headline]
    names.extend(bench.EXTRAS)
    return names


def test_live_catalog_line_fits_with_headroom():
    # worst plausible per-query magnitude: 3-digit seconds at ms precision
    timings = {n: 999.999 for n in sorted(_headline_names())}
    line = _line_for(timings)
    assert json.loads(line)["queries"] == timings  # nothing dropped
    # Headroom for ≥3 more worst-case query entries ("name":999.999 at
    # typical name lengths ≈ 35 chars each) so added headline queries
    # fail HERE (rename/shorten or move detail) not in the recorded
    # driver artifact. (Was a 10% proportional pin; restated absolute in
    # round 15 when the contended flag joined the line — the reserve is
    # per-ENTRY growth, so entry-sized units are the honest measure.)
    assert len(line) <= bench.MAX_LINE - 3 * 35, (
        f"bench stdout line is {len(line)} chars for "
        f"{len(timings)} headline queries; budget {bench.MAX_LINE} "
        "(harness tail 2000) — trim the headline set or shorten names"
    )


def test_bounded_line_drops_fastest_first_and_stays_valid_json():
    # 200 long-named queries cannot fit; the guard must drop the
    # FASTEST entries, keep the slowest, and remain valid JSON
    timings = {f"extremely_long_query_name_{i:03d}": float(i) for i in range(200)}
    line = _line_for(timings)
    assert len(line) <= bench.MAX_LINE
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert parsed["queries_dropped"] == 200 - len(kept)
    assert 0 < len(kept) < 200
    # the kept set is exactly the slowest len(kept) queries
    slowest = sorted(timings, key=timings.get, reverse=True)[: len(kept)]
    assert set(kept) == set(slowest)
    # headline fields survive the drop path
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["calib_sec"] == 0.1944


def test_noop_when_under_budget():
    out = {"metric": "m", "value": 1.0, "queries": {"q1": 1.0}}
    assert bench.bounded_line(out) is out  # unchanged object, no copy


def test_contention_flag_threshold():
    """VERDICT r14 #5: the core-steal verdict is a stamped flag, not a
    derivation the reader must redo. Unloaded ratio ~1.0 → clean;
    the round-14 observed 1.6-2.4 band → contended."""
    assert not bench.contended(0.19, 0.20)
    assert not bench.contended(0.19, 0.19 * 1.29)
    assert bench.contended(0.179, 0.386)  # the r14 window
    assert bench.contended(0.19, 0.19 * 1.31)
