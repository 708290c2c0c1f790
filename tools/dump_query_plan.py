"""Dump the executed physical plan of named timed queries to files.

    python tools/dump_query_plan.py OUTDIR SUFFIX q1 [q2 ...]

Writes OUTDIR/<query>_<SUFFIX>.txt with the full executedPlan string —
the before/after evidence the optimization rounds commit under plans/rNN/.
Accepts catalog query names and bench EXTRAS names.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_team5_spark.plans.catalog import QUERIES  # noqa: E402
from data_pipeline_team5_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-query-plan")
    from bench import EXTRAS

    timed = {n: q.fn for n, q in QUERIES.items()}
    timed.update(EXTRAS)
    for name in names:
        plan = (
            timed[name](spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — executedPlan at {sf} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
