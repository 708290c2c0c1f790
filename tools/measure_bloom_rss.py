"""Measure per-node Python-worker RSS for the Bloom apply's two
past-the-cap transports (VERDICT r13 #4 — the ~45 GB vs ~1.4 GB design
argument at operators/bloom.py MMAP_MIN_WORDS was reasoned, not
measured):

    python tools/measure_bloom_rss.py broadcast <words_log2>
    python tools/measure_bloom_rss.py mmap      <words_log2>

Each invocation runs ONE transport in a fresh interpreter (the two must
not share a JVM — a broadcast variable from run 1 still resident in
reused workers would pollute run 2's numbers), applies a 2^words_log2-
word filter (8 × 2^words_log2 bytes) over the sf0.1 corpus shingles
repartitioned across every core, and samples /proc/<pid>/smaps_rollup
of every pyspark worker process at 50 ms during the job, keeping the
peak. Prints ONE JSON line:

    {"mode", "n_words", "filter_mb", "n_workers",
     "sum_rss_mb", "max_rss_mb", "sum_pss_mb", "sum_private_mb",
     "sum_shared_file_mb", "wall_sec"}

What the columns show: the broadcast transport unpickles the word array
into EVERY worker — sum_private grows ≈ n_workers × filter size; the
memmap transport maps one shipped file read-only — per-worker pages are
file-backed and SHARED, so sum_pss stays ≈ one filter regardless of
worker count (Pss divides shared pages among sharers; it is the honest
per-node total). Results recorded in SCALING.md (round 14).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, ".")


def _worker_pids(driver_pid: int) -> list[int]:
    """PIDs of pyspark daemon/worker processes (not this driver)."""
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit() or int(entry) == driver_pid:
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            pids.append(int(entry))
    return pids


def _rollup(pid: int) -> dict[str, int]:
    out: dict[str, int] = {}
    try:
        with open(f"/proc/{pid}/smaps_rollup") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3 and parts[2] == "kB":
                    out[parts[0].rstrip(":")] = int(parts[1])
    except OSError:
        pass
    return out


def main() -> None:
    mode, log2_words = sys.argv[1], int(sys.argv[2])
    assert mode in ("broadcast", "mmap")
    import numpy as np

    from data_pipeline_team5_spark.operators import bloom
    from data_pipeline_team5_spark.operators.dedup import doc_shingles
    from data_pipeline_team5_spark.plans.catalog import table
    from data_pipeline_team5_spark.session import get_spark

    n_words = 1 << log2_words
    # deterministic synthetic filter content — transport cost depends
    # only on SIZE, but keep the bytes high-entropy anyway (broadcast
    # blocks are lz4-compressed): a Weyl sequence in uint64 (int64
    # arithmetic would overflow-promote to float64 on NumPy 1.x and
    # raise on 2.x — review r14), viewed as the int64 the apply expects
    words = (
        np.arange(n_words, dtype=np.uint64)
        * np.uint64(0x9E3779B97F4A7C15)
    ).view(np.int64)
    m_bits = n_words * 64

    spark = get_spark(f"bloom_rss_{mode}")
    sc = spark.sparkContext
    cpus = os.cpu_count() or 8
    probe = (
        doc_shingles(
            table(spark, "/root/testdata/sf0.1", "documents"),
            "doc_id",
            "text",
            n=5,
        )
        .select("s")
        .repartition(cpus * 2)  # hit every worker slot
    )

    # force the past-the-cap apply; route the transport under test
    bloom.MAX_LITERAL_WORDS = 0
    bloom.MMAP_MIN_WORDS = 0 if mode == "mmap" else n_words + 1

    peak: dict[str, float] = {}
    stop = threading.Event()
    me = os.getpid()

    def sample() -> None:
        while not stop.is_set():
            pids = _worker_pids(me)
            tot = {"Rss": 0, "Pss": 0, "Private": 0, "SharedFile": 0}
            mx = 0
            for pid in pids:
                r = _rollup(pid)
                rss = r.get("Rss", 0)
                tot["Rss"] += rss
                tot["Pss"] += r.get("Pss", 0)
                tot["Private"] += r.get("Private_Clean", 0) + r.get(
                    "Private_Dirty", 0
                )
                tot["SharedFile"] += r.get("Shared_Clean", 0)
                mx = max(mx, rss)
            if tot["Rss"] > peak.get("sum_rss_kb", 0):
                peak.update(
                    sum_rss_kb=tot["Rss"],
                    sum_pss_kb=tot["Pss"],
                    sum_private_kb=tot["Private"],
                    sum_shared_file_kb=tot["SharedFile"],
                    max_rss_kb=mx,
                    n_workers=len(pids),
                )
            time.sleep(0.05)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    t0 = time.time()
    kept = bloom.bloom_prefilter(probe, "s", words, m_bits, 4)
    # two passes so every reused worker has held the words at least once
    n1 = kept.count()
    n2 = kept.count()
    wall = time.time() - t0
    stop.set()
    t.join()
    sc.stop()
    print(
        json.dumps(
            {
                "mode": mode,
                "n_words": n_words,
                "filter_mb": round(n_words * 8 / 2**20, 1),
                "n_workers": peak.get("n_workers", 0),
                "sum_rss_mb": round(peak.get("sum_rss_kb", 0) / 1024, 1),
                "max_rss_mb": round(peak.get("max_rss_kb", 0) / 1024, 1),
                "sum_pss_mb": round(peak.get("sum_pss_kb", 0) / 1024, 1),
                "sum_private_mb": round(
                    peak.get("sum_private_kb", 0) / 1024, 1
                ),
                "sum_shared_file_mb": round(
                    peak.get("sum_shared_file_kb", 0) / 1024, 1
                ),
                "rows_kept": n1,
                "passes_equal": n1 == n2,
                "wall_sec": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
