"""Misra-Gries heavy-hitters sketch, distributed and mergeable.

The third bounded-state sketch beside HLL distinct counting
(plans/grouping_family.py:sketch_weekly_distinct) and Greenwald-Khanna
quantiles (sketch_length_quantiles): find every term whose frequency
exceeds N/k over a stream too wide to count exactly — O(k) memory per
partition, one pass, no vocabulary-sized state anywhere. This is the
sketch that answers "what dominates the corpus?" when the vocabulary
itself no longer fits (the exact top-K in vocab_coverage needs the full
term-count table; at 100 TB of web text that table is itself huge).

Published algorithm: Misra & Gries 1982 ("Finding repeated elements");
the distributed merge is Agarwal et al. 2013 ("Mergeable summaries") —
per-partition MG summaries combine by SUMMING counters per key, and the
combined estimate keeps the one-sided MG error bound:

    c_true(t) − N/(k+1)  ≤  c_est(t)  ≤  c_true(t)

because each partition's counters undercount by at most n_p/(k+1) and
the undercounts add to at most Σ n_p/(k+1) = N/(k+1). Hence every term
with c_true > N/(k+1) survives SOMEWHERE with positive count — the
classic superset guarantee (no false negatives above the threshold).

Shape: mapInPandas keeps the k-counter dict ACROSS the partition's Arrow
batches (the generator closes over it), emits ≤ k (term, est) rows per
partition, and a tiny groupBy-sum merges the ≤ k×P partial rows — the
only exchange. Python is justified here exactly as for the zlib signal:
the data-dependent counter eviction is not expressible as a codegen'd
column expression, and the Arrow batch path keeps it vectorized-adjacent
(dict ops per value, no per-row Python UDF rows).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_batches(k: int):
    """Generator factory: one Misra-Gries summary per partition, state
    carried across the partition's pandas batches."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    # decrement-all step; drop zeros (dict comprehension
                    # beats per-key deletes at Arrow batch sizes)
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame(
            {
                "term": list(counters.keys()),
                "est": list(counters.values()),
            }
        )

    return run


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """All Misra-Gries survivors over ``df[col]`` with their merged
    estimates — ≤ k counters per partition, summed per key across
    partitions (the mergeable-summaries combine). Returns
    ``(term, est)``; filter ``est > N/(k+1)`` for the guaranteed-superset
    heavy-hitter set."""
    terms = df.select(F.col(col).cast("string").alias("term"))
    schema = T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("est", T.LongType()),
        ]
    )
    partial = terms.mapInPandas(_mg_batches(int(k)), schema)
    return partial.groupBy("term").agg(F.sum("est").alias("est"))
