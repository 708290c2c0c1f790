"""Hand-built Bloom-filter semi-join prefilter — the runtime-filter
pattern for membership tests against a reference set too large to
broadcast EXACTLY but cheap to broadcast APPROXIMATELY.

`decontaminate_ngram_overlap` broadcasts the benchmark gram set into an
exact map-side join — correct while eval suites are MBs. The moment the
contamination reference is a merged battery of eval suites plus web
overlap lists (billions of grams), the exact set no longer broadcasts,
and the naive fallback — shuffling corpus grams against the reference —
moves the CORPUS's gram stream through an exchange. The standard answer
(Spark uses it internally for runtime filters; PySpark 4 exposes neither
``bloom_filter_agg`` nor ``might_contain`` to SQL, verified) is a Bloom
filter: ~10 bits per reference key at 1% false-positive rate, so 1e9
grams ≈ 1.2 GB — broadcastable when the exact set is not. False
positives only ADD candidates, so an exact join on the prefiltered
remainder (now a tiny fraction of the corpus) restores exact semantics:
the composition is bitwise-identical to the exact join, which is why the
catalog query built on this keeps the exact oracle verbatim.

Implementation is Spark-first with zero Python in the hot path:

- BUILD: k bit positions per key via ``xxhash64(key, i)`` masked to the
  power-of-two filter width; positions fold into 64-bit words with a
  distributed ``bit_or`` aggregation (the collect is the filter itself —
  m/64 rows — never the position stream, so building scales to any
  reference size the filter fits);
- APPLY: ONE parsed expression (``F.expr`` — single Py4J round-trip, the
  plan-construction rule from round 8) evaluating
  ``forall(transform(sequence(0, k-1), i -> xxhash64(col, i) & (m-1)),
  h -> bit-test(words, h))`` with the word array embedded ONCE as a
  literal — a map-side JVM filter inside the scan stage, no UDF, no
  shuffle, no false negatives by construction.

The literal embedding is capped (:data:`MAX_LITERAL_WORDS`): a query
plan is the wrong place for a multi-MB array. Past the cap a real
deployment ships the words as a broadcast variable consumed by an Arrow
batch filter, or simply falls back to the exact broadcast join — the
caller decides; :func:`bloom_might_contain` raises rather than silently
bloating the plan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Largest word array embedded as a plan literal: 65536 longs = 512 KiB
# of filter = 4.2 Mbits ≈ 437k reference keys at 1% fpp (9.585
# bits/key) — ~30x any fixture's reference set, far below the
# broadcast-variable regime. Same role as similarity.py's
# _MAX_ADC_ENTRIES: literal folding is a fixture-scale optimization
# with an explicit ceiling, not an unbounded habit.
MAX_LITERAL_WORDS = 65536


def bloom_parameters(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``n_keys`` at target ``fpp``. m rounds UP
    to a power of two so bit addressing is a mask (no sign-unsafe mod on
    xxhash64's signed output). k is then the SMALLEST hash count whose
    predicted rate (1 - e^(-kn/m))^k meets the target at the realized
    (over-sized) m — NOT the m/n-optimal k, which over-hashes once m
    rounds up: at m/n ≈ 14.6 the optimum is k=10 but k=4 already gives
    0.3% < 1%, and k is the per-row xxhash64 count on the CORPUS side —
    the apply cost — so minimizing it is worth the (still-under-target)
    fpp give-back. Floors guard degenerate tiny inputs."""
    if n_keys <= 0:
        return 64, 1
    m_opt = -n_keys * math.log(fpp) / (math.log(2) ** 2)
    m_bits = 1 << max(6, math.ceil(math.log2(m_opt)))
    k_cap = max(1, round(m_bits / n_keys * math.log(2)))  # m/n optimum
    for k in range(1, k_cap + 1):
        if (1.0 - math.exp(-k * n_keys / m_bits)) ** k <= fpp:
            return m_bits, k
    return m_bits, k_cap


def bloom_word_frame(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """The distributed build plan behind :func:`build_bloom_words`,
    exposed as a frame so the engine's plan-invariant sweep can inspect
    the construction-time plan (it executes eagerly inside query
    builders and would otherwise be invisible to the sweep)."""
    mask = m_bits - 1
    hashes = keys.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {k - 1}), "
                f"i -> xxhash64(`{key_col}`, i) & {mask}L)"
            )
        ).alias("h")
    )
    return (
        hashes.select(
            F.shiftright("h", 6).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(h & 63L AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )


def build_bloom_words(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> list[int]:
    """The filter's 64-bit words (length m_bits/64), built with a
    distributed ``bit_or``: keys → k masked hashes → (word index, bit)
    → per-word OR. Driver traffic is the filter itself (m/64 rows), not
    the key or position stream."""
    rows = bloom_word_frame(keys, key_col, m_bits, k).collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(
    words: list[int], m_bits: int, k: int, col: str
) -> Column:
    """Boolean membership column for ``col`` against the filter — true
    for EVERY inserted key (no false negatives), true for a non-member
    with probability ≈ fpp. One parsed expression; the word array is a
    single literal."""
    if len(words) > MAX_LITERAL_WORDS:
        raise ValueError(
            f"bloom filter of {len(words)} words exceeds the "
            f"{MAX_LITERAL_WORDS}-word literal cap — ship it as a "
            "broadcast variable (Arrow batch filter) or use the exact "
            "broadcast join instead of a plan literal"
        )
    arr = ",".join(f"{w}L" for w in words)
    return F.expr(
        f"forall("
        f"transform(sequence(0, {k - 1}), "
        f"i -> xxhash64(`{col}`, i) & {m_bits - 1}L), "
        f"h -> (shiftright(element_at(array({arr}), "
        f"CAST(shiftright(h, 6) AS INT) + 1), "
        f"CAST(h & 63L AS INT)) & 1L) = 1L)"
    )
