"""Benchmark runner: times the catalog's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

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

from data_pipeline_team5_spark.plans.catalog import QUERIES
from data_pipeline_team5_spark.session import get_spark

WARMUP_SF = "/root/testdata/sf0.001"


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Parse the scale factor from the basename only ('…/sf0.1' → 0.1);
    # an 'sf' elsewhere in the path must not confuse it.
    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    sf = m.group(1) if m else sf_dir
    spark = get_spark(app_name="bench")

    headline = {n: q for n, q in QUERIES.items() if q.headline}

    for name, q in headline.items():  # JVM/codegen warmup at tiny SF
        _run(q.fn(spark, WARMUP_SF))

    # Min of two passes per query: single-shot numbers on a shared box
    # swing ±40% with ambient load; the min is the engine's cost, the rest
    # is noise (first pass also absorbs any sf-specific codegen).
    timings: dict[str, float] = {}
    for name, q in sorted(headline.items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _run(q.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if m else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
