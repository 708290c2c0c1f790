"""Quantile-sketch error contract: percentile_approx's Greenwald-Khanna
variant guarantees the returned value's RANK is within n/accuracy of the
target rank — pin that against the exact per-group distributions at
three scale factors (the same validation style the HLL sketch gets in
test_approx.py / its ≤2% relative-error pytest)."""

from __future__ import annotations

import pytest

from data_pipeline_team5_spark.plans.catalog import QUERIES, table
from data_pipeline_team5_spark.plans.grouping_family import (
    QUANTILE_ACC,
    QUANTILE_PS,
)


@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_quantile_sketch_rank_error_bound(spark, sf_dir):
    rows = QUERIES["sketch_length_quantiles"].fn(spark, sf_dir).collect()
    assert rows, "no languages"
    docs = table(spark, sf_dir, "documents")
    by_lang = {
        r["lang"]: sorted(
            x["n_chars"]
            for x in docs.filter(docs.lang == r["lang"])
            .select("n_chars")
            .collect()
        )
        for r in rows
    }
    for r in rows:
        vals = by_lang[r["lang"]]
        n = len(vals)
        tol = max(1, n // QUANTILE_ACC) + 1  # GK rank slack (+1 rounding)
        for p, got in zip(QUANTILE_PS, r["q_approx"]):
            target = p * (n - 1)
            # rank band of the returned value in the exact distribution
            lo = next(i for i, v in enumerate(vals) if v >= got)
            hi = n - 1 - next(
                i for i, v in enumerate(reversed(vals)) if v <= got
            )
            assert lo - tol <= target <= hi + tol, (
                r["lang"], p, got, lo, hi, target, n,
            )
        # exact column sanity: within the value range
        assert all(vals[0] <= q <= vals[-1] for q in r["q_exact"])
