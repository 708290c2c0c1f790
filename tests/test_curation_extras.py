"""Round-7 curation additions: repetition metrics (max_run_freq fold),
benchmark decontamination, and domain-mixture sampling.

The catalog oracle test already pins all three against DuckDB bitwise;
these tests pin the SEMANTICS the oracle comparison can't express — the
fold's equivalence to an independent counting algorithm on adversarial
inputs, exclusion/bound invariants of the decontamination output, and the
waterline property of the mixture sampler.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_team5_spark.operators.textops import (
    max_run_freq,
    ngrams_expr,
)
from data_pipeline_team5_spark.plans.catalog import QUERIES
from tests.conftest import SF_SMALL

# Small alphabet forces collisions; '' is a legal normalized token (empty
# text -> ['']) and must not confuse the fold's initial prev='' state.
_tok = st.sampled_from(["", "a", "b", "ab", "the", "的"])
_arrays = st.lists(st.lists(_tok, max_size=12), min_size=1, max_size=8)


@given(arrays=_arrays)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_max_run_freq_matches_counter(spark, arrays):
    """Fold-over-sorted-array == Counter most_common — the independent
    algorithm check, including empty arrays (0) and ''-only arrays."""
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i int, arr array<string>"
    )
    got = {
        r["i"]: r["mx"]
        for r in df.select("i", max_run_freq(F.col("arr")).alias("mx")).collect()
    }
    for i, a in enumerate(arrays):
        want = max(Counter(a).values()) if a else 0
        assert got[i] == want, (i, a, got[i], want)


def test_ngrams_expr_short_docs_empty(spark):
    """Docs shorter than n contribute NO n-grams (no whole-text fallback —
    that would score 1-token docs top_bigram_frac = 1.0)."""
    df = spark.createDataFrame(
        [(["a"],), (["a", "b"],), (["a", "b", "a", "b"],)],
        "arr array<string>",
    )
    rows = df.select(ngrams_expr(F.col("arr"), 2).alias("g")).collect()
    assert rows[0]["g"] == []
    assert rows[1]["g"] == ["a b"]
    assert rows[2]["g"] == ["a b", "b a", "a b"]  # non-distinct


def test_decontaminate_plan_broadcasts_benchmark_side(spark):
    """Structural scale pin (same spirit as the candidate-linearity pin in
    test_incremental_neardup): the benchmark gram set is the BROADCAST
    side and the corpus side's gram stream reaches the join with no
    Exchange — a regression to a shuffle join would move the 100 TB
    side's grams (i.e. the corpus itself) through the network."""
    plan = (
        QUERIES["decontaminate_ngram_overlap"]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # Exchanges are allowed only above the join (per-doc counts, final
    # sort) and inside the broadcast subtree (distinct-ing the tiny
    # benchmark gram set) — never between the corpus-side Generate
    # (gram explode) and the join.
    corpus_side = plan.split("BroadcastHashJoin")[1].split(
        "BroadcastExchange"
    )[0]
    assert "Generate explode" in corpus_side
    assert "Exchange" not in corpus_side


def test_decontaminate_invariants(spark):
    from data_pipeline_team5_spark.plans.text_family import DECON_BENCH_MOD

    out = QUERIES["decontaminate_ngram_overlap"].fn(spark, SF_SMALL).collect()
    assert out, "fixture has injected near-dups; expected contaminated docs"
    for r in out:
        # Benchmark members are never reported against themselves.
        assert r["doc_id"] % DECON_BENCH_MOD != 0
        assert 1 <= r["n_overlap"] <= r["n_grams"]
        assert 0.0 < r["overlap_frac"] <= 1.0


def test_domain_mixture_waterline(spark):
    from data_pipeline_team5_spark.plans.sampling_family import TARGET_MIX

    rows = {
        r["lang"]: r
        for r in QUERIES["domain_mixture_sample"].fn(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(TARGET_MIX)
    # Exactly the bottleneck language keeps everything; every keep_rate is
    # a valid probability and the bottleneck determines the waterline.
    bottleneck = min(rows, key=lambda l: rows[l]["n_avail"] / TARGET_MIX[l])
    assert rows[bottleneck]["keep_rate"] == 1.0
    assert rows[bottleneck]["n_kept"] == rows[bottleneck]["n_avail"]
    total = sum(r["n_kept"] for r in rows.values())
    for lang, r in rows.items():
        assert 0.0 < r["keep_rate"] <= 1.0
        assert r["n_kept"] <= r["n_avail"]
        # Achieved share tracks the target (md5-bucket sampling noise at
        # n~500 docs: allow 3 percentage points).
        assert abs(r["n_kept"] / total - TARGET_MIX[lang]) < 0.03, lang


def test_curate_benchmark_decontaminates(spark):
    """curate_training_data(benchmark_docs=...) drops every contaminated
    doc (as defined by the contaminated_ids operator) from the
    assignments — including the benchmark doc itself, which trivially
    shares all its grams."""
    from data_pipeline_team5_spark.operators.dedup import contaminated_ids
    from data_pipeline_team5_spark.pipeline import curate_training_data
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    base = curate_training_data(docs)
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    assert base_ids
    d = min(base_ids)
    benchmark = docs.filter(F.col("doc_id") == d)
    bad = {
        r["doc_id"]
        for r in contaminated_ids(docs, benchmark).collect()
    }
    assert d in bad  # self-contamination
    out = curate_training_data(docs, benchmark_docs=benchmark)
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not out_ids & bad
    assert d not in out_ids
    # clean docs are untouched by the stage (survivor/component changes
    # can only originate from dropped contaminated docs)
    assert out_ids <= base_ids | bad
    assert out_ids  # didn't nuke the corpus


def test_incremental_benchmark_decontaminates(spark):
    """curate_incremental_batch(benchmark_docs=...) drops contaminated NEW
    docs; the retained corpus is out of scope (already shipped)."""
    from data_pipeline_team5_spark.operators.dedup import contaminated_ids
    from data_pipeline_team5_spark.pipeline import curate_incremental_batch
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    plain = {
        r["doc_id"]
        for r in curate_incremental_batch(new, corpus)
        .select("doc_id")
        .collect()
    }
    assert plain
    d = min(plain)
    benchmark = docs.filter(F.col("doc_id") == d)
    bad = {r["doc_id"] for r in contaminated_ids(new, benchmark).collect()}
    assert d in bad
    out = {
        r["doc_id"]
        for r in curate_incremental_batch(
            new, corpus, benchmark_docs=benchmark
        )
        .select("doc_id")
        .collect()
    }
    assert not out & bad and d not in out and out


def test_curate_repetition_caps(spark):
    """The Gopher-style caps drop exactly the docs whose profile metrics
    exceed them, keep docs with NULL fractions (too short to have grams),
    and default-off leaves the preset untouched."""
    from data_pipeline_team5_spark.pipeline import curate_training_data
    from data_pipeline_team5_spark.plans.catalog import table

    CAP = 0.04
    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    base_ids = {
        r["doc_id"]
        for r in curate_training_data(docs).select("doc_id").collect()
    }
    capped = curate_training_data(docs, max_top_bigram_frac=CAP)
    capped_ids = {r["doc_id"] for r in capped.select("doc_id").collect()}
    prof = {
        r["doc_id"]: r["top_bigram_frac"]
        for r in QUERIES["text_doc_profile"].fn(spark, SF_SMALL).collect()
    }
    # the fixture's bigram-frac distribution straddles the cap
    over = {d for d in base_ids if prof[d] is not None and prof[d] > CAP}
    assert over and capped_ids
    assert not {d for d in capped_ids if prof[d] is not None} & over
    # capping only removes docs (modulo dedup-survivor promotion within
    # the filtered set, which can only promote docs that pass the cap)
    for d in capped_ids:
        assert prof[d] is None or prof[d] <= CAP


def test_cli_full_benchmark_flag(spark, tmp_path, capsys):
    import json

    from data_pipeline_team5_spark.curate import main
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    docs_p = str(tmp_path / "docs.parquet")
    bench_p = str(tmp_path / "bench.parquet")
    docs.write.parquet(docs_p)
    docs.limit(5).write.parquet(bench_p)

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    plain = run(["full", "--docs", docs_p,
                 "--out", str(tmp_path / "a.parquet")])
    decon = run(["full", "--docs", docs_p, "--benchmark", bench_p,
                 "--out", str(tmp_path / "b.parquet")])
    assert decon["status"] == "ok"
    assert 0 < decon["kept"] < plain["kept"]


def test_curate_target_mix(spark):
    """target_mix reweights the DEDUPED survivors: kept shares track the
    weights, membership is a subset of the plain run's survivors, and the
    bottleneck language is untouched."""
    from data_pipeline_team5_spark.pipeline import curate_training_data
    from data_pipeline_team5_spark.plans.catalog import table

    MIX = {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.2}  # zh excluded
    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    plain = curate_training_data(docs).select("doc_id", "lang").collect()
    plain_ids = {r["doc_id"] for r in plain}
    mixed = curate_training_data(docs, target_mix=MIX).select(
        "doc_id", "lang"
    ).collect()
    assert mixed
    by_lang: dict[str, int] = {}
    for r in mixed:
        assert r["doc_id"] in plain_ids  # subset: mixture only removes
        assert r["lang"] in MIX  # zh excluded entirely
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    total = sum(by_lang.values())
    for lang, w in MIX.items():
        # md5-bucket noise at a few hundred docs: 6 percentage points
        assert abs(by_lang.get(lang, 0) / total - w) < 0.06, (lang, by_lang)


def test_domain_mixture_membership_stable(spark):
    """Two runs draw the exact same documents (md5 buckets, not RNG)."""
    q = QUERIES["domain_mixture_sample"].fn
    a = {r["lang"]: r["kept_id_checksum"] for r in q(spark, SF_SMALL).collect()}
    b = {r["lang"]: r["kept_id_checksum"] for r in q(spark, SF_SMALL).collect()}
    assert a == b


def test_flattened_weights_alpha_endpoints(spark):
    """α=1 reproduces the observed mixture — every mixture_rates keep_rate
    is exactly 1.0 (nothing is dropped to hit a mixture you already
    have); α=0 is uniform — the waterline keeps the smallest group whole
    and every group contributes the same EXPECTED doc count."""
    from data_pipeline_team5_spark.operators.sampling import (
        flattened_weights,
        mixture_rates,
    )
    from data_pipeline_team5_spark.plans.catalog import table
    from tests.conftest import SF_SMALL

    docs = table(spark, SF_SMALL, "documents")
    counts = {
        r.lang: r.n for r in
        docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    w1 = flattened_weights(counts, alpha=1.0)
    assert abs(sum(w1.values()) - 1.0) < 1e-12
    rates = {
        r.lang: r.keep_rate
        for r in mixture_rates(docs, w1).collect()
    }
    assert set(rates) == set(counts)
    for g, rate in rates.items():
        assert abs(rate - 1.0) < 1e-9, (g, rate)

    w0 = flattened_weights(counts, alpha=0.0)
    n_min = min(counts.values())
    expect = {g: w0[g] * n_min * len(counts) for g in counts}
    rates0 = {
        r.lang: r.keep_rate for r in mixture_rates(docs, w0).collect()
    }
    for g in counts:
        # uniform weights: every group's expected kept docs = cap/|groups|
        # where the waterline cap is |groups| × n_min
        assert abs(rates0[g] * counts[g] - expect[g]) < 1e-6

    # α between the endpoints strictly orders shares toward uniform
    wmid = flattened_weights(counts, alpha=0.5)
    big = max(counts, key=counts.get)
    small = min(counts, key=counts.get)
    obs_big = counts[big] / sum(counts.values())
    assert wmid[small] > w1[small] - 1e-12 and wmid[big] < obs_big + 1e-12


def test_contaminated_ids_bloom_route_bitwise_and_plan(spark):
    """The decontamination probe's strategy routing (round 13, VERDICT
    r12 #6): with the route threshold forced to 0 the Bloom prefilter +
    exact-verify path must return EXACTLY the broadcast path's id set.
    At fixture scale the routed filter still embeds as a plan literal
    (it fits the literal cap), so a second run also forces the literal
    cap to 0 and asserts the broadcast-variable Arrow apply carries the
    filter (MapInPandas in-plan, never BatchEvalPython)."""
    from data_pipeline_team5_spark.operators import bloom
    from data_pipeline_team5_spark.operators.dedup import contaminated_ids
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    benchmark = docs.filter(F.col("doc_id") % 31 == 0)
    want = {r["doc_id"] for r in contaminated_ids(docs, benchmark).collect()}
    assert want
    routed = contaminated_ids(docs, benchmark, bloom_route_min_grams=0)
    plan = routed._jdf.queryExecution().optimizedPlan().toString()
    assert "BatchEvalPython" not in plan
    got = {r["doc_id"] for r in routed.collect()}
    assert got == want
    # forced past BOTH the route threshold and the literal cap: the
    # broadcast-variable Arrow path carries the filter
    saved = bloom.MAX_LITERAL_WORDS
    bloom.MAX_LITERAL_WORDS = 0
    try:
        routed_bc = contaminated_ids(
            docs, benchmark, bloom_route_min_grams=0
        )
        plan_bc = routed_bc._jdf.queryExecution().optimizedPlan().toString()
        assert "mapInPandas" in plan_bc or "MapInPandas" in plan_bc, plan_bc
        assert {r["doc_id"] for r in routed_bc.collect()} == want
    finally:
        bloom.MAX_LITERAL_WORDS = saved


def test_curate_preset_bloom_route_no_behavior_change(spark):
    """curate_training_data(decon_bloom_min_grams=0) — the preset flag
    forcing the Bloom route — must produce bitwise-identical
    assignments to the default broadcast-join run."""
    from data_pipeline_team5_spark.pipeline import curate_training_data
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    benchmark = docs.filter(F.col("doc_id") % 31 == 0)
    base = sorted(
        tuple(r)
        for r in curate_training_data(
            docs, benchmark_docs=benchmark
        ).collect()
    )
    routed = sorted(
        tuple(r)
        for r in curate_training_data(
            docs, benchmark_docs=benchmark, decon_bloom_min_grams=0
        ).collect()
    )
    assert routed == base and len(base) > 0


def test_contaminated_ids_default_route_pins_nothing(spark):
    """The DEFAULT (broadcast) strategy must leave zero retained state
    (self-review r13): the curate stream loop runs it once per
    micro-batch, so any per-call checkpoint would accumulate without
    bound. (The bloom route deliberately RETAINS its reference-sized
    pin — the filter build and the exact verify join must share one
    snapshot or a non-deterministic benchmark could produce false
    negatives; see the operator docstring.)"""
    from data_pipeline_team5_spark.operators.dedup import contaminated_ids
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    benchmark = docs.filter(F.col("doc_id") % 31 == 0)
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = contaminated_ids(docs, benchmark)
    out.count()
    leaked = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    assert not leaked, leaked


def test_contaminated_ids_bloom_route_retains_exactly_one_pin(spark):
    """The bloom route's retention contract, pinned (self-review r13
    round 3): each call retains EXACTLY ONE new persistent RDD — the
    reference-sized gram snapshot shared by the filter build and the
    exact verify join. A regression to two pins per call (or to a
    corpus-sized pin) would pass the suite silently without this."""
    from data_pipeline_team5_spark.operators.dedup import contaminated_ids
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    benchmark = docs.filter(F.col("doc_id") % 31 == 0)
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = contaminated_ids(docs, benchmark, bloom_route_min_grams=0)
    out.count()
    retained = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    assert len(retained) == 1, retained


def test_contaminated_ids_broadcast_path_plan_shape(spark):
    """Structural scale pin for the pipeline's decontamination probe
    (same spirit as test_decontaminate_plan_broadcasts_benchmark_side,
    which pins the catalog twin): in the default small-reference
    strategy the benchmark gram set must be the BROADCAST side and the
    corpus-side gram stream must reach the join with no Exchange — a
    regression to a shuffle join would move the 100 TB side's grams
    through the network on every curate run."""
    from data_pipeline_team5_spark.operators.dedup import contaminated_ids
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    benchmark = docs.filter(F.col("doc_id") % 31 == 0)
    plan = (
        contaminated_ids(docs, benchmark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    corpus_side = plan.split("BroadcastHashJoin")[1].split(
        "BroadcastExchange"
    )[0]
    assert "Generate explode" in corpus_side
    assert "Exchange" not in corpus_side


def test_contaminated_ids_precomputed_route_count(spark):
    """ADVICE r13: the routing statistic can be precomputed once
    (benchmark_gram_count) and passed through, replacing the per-call
    eager count — the stream loop's per-micro-batch saving. Pins that
    (a) the helper equals the count contaminated_ids derives itself,
    (b) a passed count drives the route (a huge count forces the Bloom
    path under the DEFAULT threshold) with bitwise-identical ids, and
    (c) a passed count of 0 keeps the exact broadcast route even under
    a forced-low threshold."""
    from data_pipeline_team5_spark.operators.dedup import (
        benchmark_gram_count,
        contaminated_ids,
        doc_shingles,
    )
    from data_pipeline_team5_spark.plans.catalog import table

    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    benchmark = docs.filter(F.col("doc_id") % 31 == 0)
    n = benchmark_gram_count(benchmark)
    direct = (
        doc_shingles(benchmark, "doc_id", "text", n=5)
        .select("s")
        .distinct()
        .count()
    )
    assert n == direct > 0
    want = {r["doc_id"] for r in contaminated_ids(docs, benchmark).collect()}
    assert want
    forced = contaminated_ids(docs, benchmark, bench_gram_count=10**9)
    assert {r["doc_id"] for r in forced.collect()} == want
    held = contaminated_ids(
        docs, benchmark, bloom_route_min_grams=0, bench_gram_count=0
    )
    plan = held._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # count 0 ≤ threshold 0 → exact
    assert {r["doc_id"] for r in held.collect()} == want


def test_decon_n_gives_exact_substring_grain(spark):
    """Round 14 (VERDICT r13 #5): contaminated_ids at n=L IS the Lee et
    al. exact-substring drop rule — a shared run of ≥ L tokens and a
    shared L-token window are the same event. The drop set must cover
    exactly the docs the substring-grain catalog query reports, with
    the ONE documented divergence: doc_shingles falls back to
    whole-text shingles for docs shorter than L tokens (conservative —
    a short doc fully contained in the benchmark is still flagged),
    where positional L-windows are empty."""
    from data_pipeline_team5_spark.operators.dedup import contaminated_ids
    from data_pipeline_team5_spark.operators.textops import tokens_expr
    from data_pipeline_team5_spark.plans.catalog import table
    from data_pipeline_team5_spark.plans.text_family import (
        DECON_BENCH_MOD,
        SUBSTR_DECON_L,
    )

    docs = table(spark, SF_SMALL, "documents")
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    want = {
        r["doc_id"]
        for r in QUERIES["decontaminate_exact_substring"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    got = {
        r["doc_id"]
        for r in contaminated_ids(
            docs.filter(~is_bench),
            docs.filter(is_bench),
            n=SUBSTR_DECON_L,
        ).collect()
    }
    n_toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tokens_expr("text")).alias("n")
        ).collect()
    }
    assert want <= got and want
    for d in got - want:
        assert n_toks[d] < SUBSTR_DECON_L, (
            d,
            n_toks[d],
            "long doc flagged by the shingle rule but not the window rule",
        )


def test_cli_decon_n_flag_plumbed(spark, tmp_path, capsys):
    """--decon-n reaches the filter stage: at the substring grain the
    full CLI keeps the docs the 5-gram default would drop (the fixture
    has far more shared 5-grams than shared 12-token runs)."""
    import json as _json

    from data_pipeline_team5_spark.curate import main
    from data_pipeline_team5_spark.plans.catalog import table
    from data_pipeline_team5_spark.plans.text_family import (
        DECON_BENCH_MOD,
        SUBSTR_DECON_L,
    )

    docs = table(spark, SF_SMALL, "documents")
    docs.filter(F.col("doc_id") % DECON_BENCH_MOD != 0).write.parquet(
        str(tmp_path / "docs")
    )
    docs.filter(F.col("doc_id") % DECON_BENCH_MOD == 0).write.parquet(
        str(tmp_path / "bench")
    )
    outs = {}
    for label, extra in (
        ("five", []),
        ("substr", ["--decon-n", str(SUBSTR_DECON_L)]),
    ):
        main(
            [
                "full",
                "--docs", str(tmp_path / "docs"),
                "--out", str(tmp_path / f"out_{label}"),
                "--benchmark", str(tmp_path / "bench"),
            ]
            + extra
        )
        outs[label] = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
    assert outs["substr"]["kept"] > outs["five"]["kept"]
