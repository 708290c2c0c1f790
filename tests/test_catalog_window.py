"""Catalog/driver-window invariants (VERDICT r2 #1).

The external driver records correctness rows for at most DRIVER_WINDOW
queries in registration order, so the catalog must (a) keep every
oracle-backed query inside the window and (b) give every query family at
least one in-window representative. These tests freeze that contract so a
future registration can't silently push a family out of the graded set.
"""

from __future__ import annotations

from data_pipeline_team5_spark.plans.catalog import (
    DRIVER_WINDOW,
    QUERIES,
    _TAIL,
)

# One tag per family; each must appear among the first DRIVER_WINDOW
# registrations (tags are declared at @register time).
FAMILY_TAGS = (
    "reference",
    "window",
    "dashboard",
    "join",
    "dedup",
    "text",
    "similarity",
    "streaming",
    "multimodal",
    "session",
    "ingest",
    "grouping",
    "setop",
    "skew",
    "sampling",
    "packing",
)


def test_every_oracle_backed_query_is_inside_the_driver_window():
    head = list(QUERIES)[:DRIVER_WINDOW]
    outside = [
        n
        for n in QUERIES
        if n not in head and QUERIES[n].oracle is not None and n not in _TAIL
    ]
    assert outside == []
    # and the tail is exactly the declared sacrifice list, in order
    assert list(QUERIES)[DRIVER_WINDOW:] == [
        n for n in _TAIL if n not in head
    ]


def test_every_family_has_an_in_window_representative():
    head = list(QUERIES)[:DRIVER_WINDOW]
    in_window_tags = {t for n in head for t in QUERIES[n].tags}
    missing = [t for t in FAMILY_TAGS if t not in in_window_tags]
    assert missing == []


def test_in_window_queries_all_have_exact_oracles():
    head = list(QUERIES)[:DRIVER_WINDOW]
    assert [n for n in head if QUERIES[n].oracle is None] == []


def test_tail_queries_are_still_locally_checked():
    # every tail query still runs through the local mini-driver
    # (test_catalog_oracle parametrizes over ALL of QUERIES) — this just
    # pins that nothing in the tail was dropped from the catalog.
    for n in _TAIL:
        assert n in QUERIES


def test_coverage_md_counts_match_catalog():
    """The documented top-line counts (COVERAGE.md header, README) must
    agree with the live catalog — a stale count makes every other
    documented claim need re-verification (VERDICT r9 #3)."""
    import re

    # repo-relative (ADVICE r10): the doc-drift gate must not depend on
    # the checkout living at /root/repo
    import os

    text = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(
        r"(\d+) catalog queries total \(round \d+\):\s*\n(\d+) "
        r"oracle-checked, (\d+) deterministic rows-only",
        text,
    )
    assert m, "COVERAGE.md header count sentence not found"
    total, oracle, rows_only = map(int, m.groups())
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)
    assert total == len(QUERIES)
    assert oracle == n_oracle
    assert rows_only == len(QUERIES) - n_oracle
    m = re.search(r"an explicit (\d+)-entry `_TAIL`", text)
    assert m and int(m.group(1)) == len(_TAIL)
