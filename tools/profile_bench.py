"""Per-query profile of the timed bench set (round 17, guide §1).

For every timed entry (catalog headline + bench EXTRAS), runs the query
once through the noop sink after a tiny-SF warmup — the bench's own
methodology — with the Spark UI enabled, then pulls the REST API
(/api/v1) for the jobs/stages that ran under the query's job group:

- wall seconds (same clock as bench.py);
- number of Spark jobs the query submits (the per-job floor at small SF
  is ~0.1-0.3 s, so job count is the first-order cost at sf0.1);
- total task time, shuffle read/write bytes, input bytes (the levers
  the optimization guide §2-3 names).

Usage:
    python tools/profile_bench.py [sf_dir] [--only q1,q2] [--out PATH]

Output: JSON {query: {wall_sec, jobs, stages, task_time_sec,
shuffle_read_mb, shuffle_write_mb, input_mb}} sorted by wall_sec.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from data_pipeline_team5_spark.plans.catalog import QUERIES  # noqa: E402
from data_pipeline_team5_spark.session import get_spark  # noqa: E402

WARMUP_SF = "/root/testdata/sf0.001"


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="/tmp/profile_bench.json")
    ap.add_argument("--passes", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark(
        app_name="profile-bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId

    from bench import EXTRAS  # noqa: E402

    timed = {n: q.fn for n, q in QUERIES.items() if q.headline}
    timed.update(EXTRAS)
    if args.only:
        keep = set(args.only.split(","))
        timed = {n: f for n, f in timed.items() if n in keep}

    for name, fn in sorted(timed.items()):  # JVM/codegen warmup
        sc.setJobGroup(f"warmup:{name}", name)
        fn(spark, WARMUP_SF).write.format("noop").mode("overwrite").save()

    prof: dict[str, dict] = {}
    for name, fn in sorted(timed.items()):
        best = None
        for p in range(args.passes):
            group = f"q:{name}:{p}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            if best is None or wall < best[0]:
                best = (wall, group)
        wall, group = best
        jobs = [
            j
            for j in _get(base, "/jobs")
            if j.get("jobGroup") == group
        ]
        stage_ids = sorted(
            {s for j in jobs for s in j.get("stageIds", [])}
        )
        task_time = shr = shw = inp = 0.0
        n_stages = 0
        for sid in stage_ids:
            try:
                for att in _get(base, f"/stages/{sid}"):
                    if att.get("status") == "SKIPPED":
                        continue
                    n_stages += 1
                    task_time += att.get("executorRunTime", 0) / 1e3
                    shr += att.get("shuffleReadBytes", 0) / 1e6
                    shw += att.get("shuffleWriteBytes", 0) / 1e6
                    inp += att.get("inputBytes", 0) / 1e6
            except Exception:
                pass
        prof[name] = {
            "wall_sec": round(wall, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "task_time_sec": round(task_time, 2),
            "shuffle_read_mb": round(shr, 2),
            "shuffle_write_mb": round(shw, 2),
            "input_mb": round(inp, 2),
        }
        print(f"{name}: {prof[name]}", file=sys.stderr)

    ordered = dict(
        sorted(prof.items(), key=lambda kv: -kv[1]["wall_sec"])
    )
    with open(args.out, "w") as fh:
        json.dump(ordered, fh, indent=1)
    print(json.dumps({"total_wall": round(sum(v["wall_sec"] for v in prof.values()), 2), "out": args.out}))


if __name__ == "__main__":
    main()
