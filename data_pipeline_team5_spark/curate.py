"""Operational CLI for the training-data curation pipeline — the curation
counterpart of ``python -m data_pipeline_team5_spark.pipeline`` (which
crons the reference's KOFIC ingest). Three subcommands mirror the deployed
lifecycle (pipeline.py presets; invariants in tests/test_training_curation
and tests/test_incremental_neardup):

  full         one-shot corpus curation (filter → exact dedup → guarded
               near-dup components → hash-stable splits → BPE-budget
               packing) — the backfill / first-build path
  build-index  materialize the retained corpus's MinHash signature table
               and exact-dedup key table (idempotent per-batch partitions)
  incremental  curate ONE daily batch against the stored indexes —
               O(batch + candidates) — and optionally fold the survivors
               back into the indexes (``--fold-batch-id``), completing the
               daily loop in a single command

Each run writes the assignments as parquet and prints ONE JSON summary
line (rows kept, paths), cron-friendly like pipeline.main.

NB: a loop that folds batches (``--fold-batch-id``) must ALSO build the
base index with ``--batch-id`` — parquet cannot mix flat files and
``batch_id=...`` partition directories under one root.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    from data_pipeline_team5_spark.pipeline import (
        build_exact_key_index,
        build_signature_index,
        curate_incremental_batch,
        curate_training_data,
    )
    from data_pipeline_team5_spark.session import get_spark

    ap = argparse.ArgumentParser(prog="data_pipeline_team5_spark.curate")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_full = sub.add_parser("full", help="one-shot corpus curation")
    p_full.add_argument("--docs", required=True, help="documents parquet")
    p_full.add_argument("--out", required=True, help="assignments parquet")
    p_full.add_argument("--budget", type=int, default=2048)
    p_full.add_argument("--threshold", type=float, default=0.6)
    p_full.add_argument("--method", choices=["jaccard", "lsh"], default="jaccard")

    p_idx = sub.add_parser("build-index", help="materialize sig + key indexes")
    p_idx.add_argument("--docs", required=True)
    p_idx.add_argument("--sig", required=True, help="signature index path")
    p_idx.add_argument("--key", required=True, help="exact-key index path")
    p_idx.add_argument("--batch-id", default=None,
                       help="write as an idempotent per-batch partition")

    p_inc = sub.add_parser("incremental", help="curate a daily batch")
    p_inc.add_argument("--new", required=True, help="new batch parquet")
    p_inc.add_argument("--corpus", required=True,
                       help="retained corpus parquet (text read only for "
                            "candidate docs)")
    p_inc.add_argument("--sig", required=True)
    p_inc.add_argument("--key", required=True)
    p_inc.add_argument("--out", required=True)
    p_inc.add_argument("--budget", type=int, default=2048)
    p_inc.add_argument("--threshold", type=float, default=0.6)
    p_inc.add_argument("--fold-batch-id", default=None,
                       help="after curating, fold the batch's SURVIVORS "
                            "into both indexes under this batch_id — the "
                            "complete daily loop in one command")
    args = ap.parse_args(argv)

    spark = get_spark(app_name=f"curate_{args.cmd}")
    if args.cmd == "full":
        out = curate_training_data(
            spark.read.parquet(args.docs),
            token_budget=args.budget,
            neardup_threshold=args.threshold,
            neardup_method=args.method,
        )
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"status": "ok", "cmd": "full", "kept": n,
                          "out": args.out}))
    elif args.cmd == "build-index":
        docs = spark.read.parquet(args.docs)
        build_signature_index(docs, args.sig, batch_id=args.batch_id)
        build_exact_key_index(docs, args.key, batch_id=args.batch_id)
        print(json.dumps({"status": "ok", "cmd": "build-index",
                          "sig": args.sig, "key": args.key,
                          "batch_id": args.batch_id}))
    else:
        new = spark.read.parquet(args.new)
        out = curate_incremental_batch(
            new,
            spark.read.parquet(args.corpus),
            token_budget=args.budget,
            neardup_threshold=args.threshold,
            index_sig_path=args.sig,
            key_index_path=args.key,
        )
        out.write.mode("overwrite").parquet(args.out)
        kept = spark.read.parquet(args.out)
        n = kept.count()
        if args.fold_batch_id is not None:
            survivors = new.join(kept.select("doc_id"), "doc_id")
            build_signature_index(
                survivors, args.sig, batch_id=args.fold_batch_id
            )
            build_exact_key_index(
                survivors, args.key, batch_id=args.fold_batch_id
            )
        print(json.dumps({"status": "ok", "cmd": "incremental", "kept": n,
                          "out": args.out,
                          "folded": args.fold_batch_id}))
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via tests.main()
    raise SystemExit(main())
