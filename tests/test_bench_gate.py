"""Per-query bench regression gate (bench.compare_to_baseline): the
round-4 +24% common-suite drift was invisible because no gate compared
entries against the committed baseline — these tests pin the gate's
semantics (band + floor, justification suppression, sf matching) and
that the repo's committed artifacts keep the gate runnable."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _base(queries, sf=0.1):
    return {"metric": "suite_total", "sf": sf, "queries": queries}


def test_flags_real_regression_worst_first():
    base = _base({"q01": 1.0, "q02": 2.0})
    regs = bench.compare_to_baseline(
        {"q01": 1.9, "q02": 8.0}, base, 0.1, tolerance=1.5, floor=0.3
    )
    assert [e["query"] for e in regs] == ["q02", "q01"]
    assert regs[0]["ratio"] == 4.0 and "justified" not in regs[0]


def test_band_and_floor_absorb_jitter():
    # 1.4x is inside the band; a 0.1 s -> 0.35 s move is inside the
    # floor even though the ratio is 3.5x — sub-second queries jitter
    base = _base({"q01": 1.0, "q02": 0.1})
    regs = bench.compare_to_baseline(
        {"q01": 1.4, "q02": 0.35}, base, 0.1, tolerance=1.5, floor=0.3
    )
    assert regs == []


def test_justified_entries_are_annotated_not_failing():
    base = _base({"q01": 1.0})
    regs = bench.compare_to_baseline(
        {"q01": 5.0}, base, 0.1, {"q01": "rewrote the join this round"},
        tolerance=1.5, floor=0.3,
    )
    assert len(regs) == 1 and regs[0]["justified"]
    assert not [e for e in regs if "justified" not in e]


def test_new_queries_and_sf_mismatch_never_flag():
    base = _base({"q01": 1.0}, sf=0.1)
    # new query: no baseline entry
    assert bench.compare_to_baseline({"q_new": 99.0}, base, 0.1) == []
    # off-sf run: baseline not comparable
    assert bench.compare_to_baseline({"q01": 99.0}, base, 0.001) == []
    # no baseline at all (fresh clone)
    assert bench.compare_to_baseline({"q01": 99.0}, None, 0.1) == []


def test_committed_artifacts_keep_gate_runnable():
    """The gate needs HEAD's bench_last.json (sf0.1, full suite) and a
    well-formed justification map; a clobbered or partial baseline would
    silently disarm every comparison."""
    baseline = bench.load_committed_baseline(REPO)
    assert baseline is not None and baseline["sf"] == 0.1
    from renoir_spark import suite

    missing = sorted(set(suite.QUERIES) - set(baseline["queries"]))
    # new queries added since the last committed bench run are allowed
    # (they can't flag), but the baseline must cover the bulk of the
    # suite or the gate is blind
    assert len(missing) < 0.2 * len(suite.QUERIES), missing

    with open(os.path.join(REPO, "bench_justifications.json")) as f:
        just = json.load(f)
    assert isinstance(just, dict)
    assert all(
        isinstance(k, str) and isinstance(v, str) and v for k, v in just.items()
    )


# ------------------------------------------------------------------ #
# shuffle-bytes gate (round 6): wall noise is ±10%, bytes are not —
# a plan regression that adds an exchange cannot hide its bytes
# ------------------------------------------------------------------ #

def _measure_bytes(spark, make_df):
    before = bench.shuffle_totals(spark)
    make_df().count()
    after = bench.shuffle_totals(spark)
    return {"read": after[0] - before[0], "write": after[1] - before[1]}


def test_shuffle_gate_catches_injected_repartition(spark):
    from pyspark.sql import functions as F

    def plain():
        return spark.range(300_000).groupBy(
            (F.col("id") % 100).alias("g")).count()

    def injected():  # the artificial plan regression
        return spark.range(300_000).repartition(16).groupBy(
            (F.col("id") % 100).alias("g")).count()

    base_bytes = _measure_bytes(spark, plain)
    base = {"metric": "suite_total", "sf": 0.1,
            "shuffle_bytes": {"q01": base_bytes}}

    # same plan re-measured: inside the band, no flag
    again = _measure_bytes(spark, plain)
    assert bench.compare_shuffle_to_baseline(
        {"q01": again}, base, 0.1, floor=4096) == []

    # injected repartition: full-table shuffle where the partial-agg
    # plan wrote a few KB — flags, worst-first, unjustified
    bad = _measure_bytes(spark, injected)
    regs = bench.compare_shuffle_to_baseline(
        {"q01": bad}, base, 0.1, floor=4096)
    assert len(regs) == 1
    e = regs[0]
    assert e["kind"] == "shuffle_bytes" and e["query"] == "q01"
    assert e["now"] > e["baseline"] and "justified" not in e

    # justification suppresses (same contract as the timing gate)
    regs_j = bench.compare_shuffle_to_baseline(
        {"q01": bad}, base, 0.1, {"q01": "intentional"}, floor=4096)
    assert regs_j and regs_j[0]["justified"] == "intentional"


def test_shuffle_gate_skips_evicted_and_new_entries():
    base = {"metric": "suite_total", "sf": 0.1,
            "shuffle_bytes": {"q01": {"read": 100, "write": 100}}}
    # eviction-corrupted measurement recorded as None: never flags
    assert bench.compare_shuffle_to_baseline({"q01": None}, base, 0.1) == []
    # new query (no baseline) and sf mismatch: never flag
    assert bench.compare_shuffle_to_baseline(
        {"q_new": {"read": 9, "write": 9 << 30}}, base, 0.1) == []
    assert bench.compare_shuffle_to_baseline(
        {"q01": {"read": 9, "write": 9 << 30}}, base, 0.001) == []


# ------------------------------------------------------------------ #
# canary-drift normalization (round 11): the container's sustained
# throughput drifts up to ~40% across hours on identical code (round-10
# evidence), so the wall-time band is stretched by the in-run canary's
# ratio to the committed baseline's — uniform host slowdown must not
# flag, while a genuine plan regression still must.
# ------------------------------------------------------------------ #

def test_drift_factor_clamps_and_defaults():
    base = {"canary_sec": 2.0}
    # slower host stretches the band by the measured ratio
    assert bench.drift_factor(3.0, base) == 1.5
    # faster host never TIGHTENS below nominal
    assert bench.drift_factor(1.0, base) == 1.0
    # capped: an extreme canary cannot hide a real regression
    assert bench.drift_factor(20.0, base, cap=2.5) == 2.5
    # missing canary on either side (old baselines): exact old behavior
    assert bench.drift_factor(None, base) == 1.0
    assert bench.drift_factor(3.0, {"queries": {}}) == 1.0
    assert bench.drift_factor(3.0, None) == 1.0


def test_uniform_host_drift_does_not_flag():
    # every query 1.8x slower AND the canary says the host is 1.8x
    # slower: the round-10 false-alarm scenario — no flags
    base = _base({"q01": 1.0, "q02": 2.0})
    base["canary_sec"] = 2.0
    drift = bench.drift_factor(3.6, base)  # 1.8
    regs = bench.compare_to_baseline(
        {"q01": 1.8, "q02": 3.6}, base, 0.1,
        tolerance=1.5, floor=0.3, drift=drift,
    )
    assert regs == []


def test_real_regression_still_trips_under_drift():
    # host 1.8x slower, but one query is 6x slower: a real plan
    # regression must still flag through the stretched band (and the
    # flag is annotated with the drift that was applied)
    base = _base({"q01": 1.0, "q02": 2.0})
    base["canary_sec"] = 2.0
    drift = bench.drift_factor(3.6, base)
    regs = bench.compare_to_baseline(
        {"q01": 6.0, "q02": 3.6}, base, 0.1,
        tolerance=1.5, floor=0.3, drift=drift,
    )
    assert [e["query"] for e in regs] == ["q01"]
    assert regs[0]["drift"] == 1.8 and "justified" not in regs[0]
