"""Run bench.py in the quietest window available (round 15, VERDICT
r14 #5 operationalized): probe the core-contention ratio
(calib_mt/calib — bench.py's own pre-flight sentinels) every
``--probe-interval`` seconds until it dips to ``--max-ratio`` or
``--max-wait`` expires, then run the bench. The emitted line (and the
``contended`` stamp bench.py itself adds) is copied to ``--out``; every
probe is logged so the artifact's window state has provenance.

Usage:
    python tools/bench_quiet.py [--max-wait 3600] [--max-ratio 1.3]
                                [--probe-interval 170] [--out PATH]

Exit code 0 if the bench ran (contended or not); the caller reads the
stamped ``contended`` flag to decide whether to retry later. This is a
waiting-room wrapper, not a scheduler — on a shared box a round should
attempt a few spread-out runs and keep the least-contended artifact
(the BASELINE.md round-13/14 adjudications are the precedent).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-wait", type=float, default=3600.0,
                    help="seconds to wait for a quiet window before "
                         "running anyway")
    ap.add_argument("--max-ratio", type=float, default=1.3,
                    help="calib_mt/calib at or under this = quiet "
                         "(bench.py's CONTENTION_RATIO)")
    ap.add_argument("--probe-interval", type=float, default=170.0)
    ap.add_argument("--out", default=None,
                    help="copy the bench stdout JSON line here")
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    deadline = time.time() + args.max_wait
    probes = []
    while True:
        c = bench._calibrate()
        m = bench._calibrate_mt()
        r = m / c
        probes.append(round(r, 2))
        print(f"probe ratio {r:.2f}", flush=True)
        if r <= args.max_ratio or time.time() >= deadline:
            break
        time.sleep(args.probe_interval)

    print("launching bench", flush=True)
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      os.pardir, "bench.py")],
        capture_output=True, text=True,
    )
    sys.stderr.write(p.stderr[-2000:])
    line = p.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    d_summary = {
        "total": d["value"],
        "contended": d.get("contended"),
        "calib_sec": d.get("calib_sec"),
        "calib_mt_sec": d.get("calib_mt_sec"),
        "noise": d.get("noise"),
        "probes": probes,
    }
    print(json.dumps(d_summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)
    print(line, flush=True)  # LAST on stdout, like bench.py itself
    return p.returncode


if __name__ == "__main__":
    raise SystemExit(main())
