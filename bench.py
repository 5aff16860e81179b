#!/usr/bin/env python
"""Benchmark harness: runs the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line, LAST on
stdout (round-11 contract fix — the invoking harness captures a
bounded output tail, and round 9's line grew past it once per-query
shuffle telemetry rode along, so the captured tail began MID-JSON and
the driver could not parse it):

    {"metric": "suite_total", "value": <sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1,
     "regressions": [{"query": ..., "baseline": ..., "now": ...}]}

The full record — the contract fields PLUS the per-query
shuffle-bytes telemetry, streaming state-store telemetry, and the
canary reading — is persisted to ``bench_last.json`` next to this
script (committed per round; the judge and the next round's gate read
it from git). Timing methodology is UNCHANGED from rounds 1-10:
per-query wall time of plan + execution (a count/collect action),
session/JVM startup excluded (one warmup action first), n>=3 runs,
per-query min.

Per-query regression gate: every entry is compared against the
COMMITTED bench_last.json (``git show HEAD:bench_last.json`` — the
working-tree copy is this run's output, not the baseline) when the sf
matches. Two complementary gates:

- PRIMARY: shuffle WRITE bytes (near-deterministic, host-independent —
  a plan regression cannot hide its bytes) vs ``BYTES_TOLERANCE``.
- SECONDARY: wall seconds, DRIFT-NORMALIZED — this container's
  sustained throughput drifts up to ~40% across hours on identical
  code (measured round 10: 169.8→236 s full-suite on byte-identical
  plans), so raw wall bands cry wolf on untouched queries. A fixed
  CANARY workload (JVM codegen leg + Python/Arrow leg, the two
  resources that drift) is timed in the same run and its ratio to the
  committed baseline's canary scales the allowed band: a query flags
  only when ``now > TOLERANCE × baseline × drift + FLOOR_S`` where
  ``drift = clamp(canary_now / canary_baseline, 1.0, DRIFT_CAP)``.
  Drift never TIGHTENS the band (clamp at 1.0) and is capped so a
  genuinely broken query cannot hide behind an extreme canary reading.

A query is flagged when it regresses past its band. Flags are
suppressed for queries listed in the committed
``bench_justifications.json`` ({query: reason} — add an entry in the
SAME commit as an intentional plan change). Unjustified flags print to
stderr, land in the JSON line, and fail the run (rc 1) unless
``SPARK_GRAFT_BENCH_GATE=warn``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# gate dials (see module docstring). 1.5x was the judge-prescribed band;
# the 0.3 s floor keeps 0.1 s-scale queries from flagging on jitter.
TOLERANCE = float(os.environ.get("SPARK_GRAFT_BENCH_TOLERANCE", "1.5"))
FLOOR_S = float(os.environ.get("SPARK_GRAFT_BENCH_FLOOR", "0.3"))
# shuffle-bytes gate dials: bytes are near-deterministic (unlike wall
# seconds, ±10% on this container), so a 1.5x growth in shuffle WRITE
# bytes is a plan change (new exchange / lost pruning), not noise. The
# 1 MiB floor keeps broadcast-only queries (near-zero bytes) from
# flagging on AQE bookkeeping deltas.
BYTES_TOLERANCE = float(os.environ.get("SPARK_GRAFT_BENCH_BYTES_TOL", "1.5"))
BYTES_FLOOR = int(os.environ.get("SPARK_GRAFT_BENCH_BYTES_FLOOR",
                                 str(1 << 20)))
# canary-drift cap: the wall-time band stretches at most this much.
# Round-10's measured worst host drift was ~1.4x full-suite (and ~3x on
# single Python-heavy queries); 2.5 covers the suite-level drift while
# still letting a genuine 4x plan regression through the stretched band.
DRIFT_CAP = float(os.environ.get("SPARK_GRAFT_BENCH_DRIFT_CAP", "2.5"))


def run_canary(spark) -> float:
    """Fixed reference workload timed in-run to measure the HOST's
    current sustained throughput (round-10 finding: this container
    slows up to ~40% across hours on identical code, invisibly to the
    guest). Two legs covering the two resources that drift: a JVM
    whole-stage-codegen aggregate and a Python/Arrow worker pass
    (Python-worker-heavy queries drift the most). Deterministic data,
    no disk I/O; min of 2 passes damps one-off scheduler jitter. The
    ratio of this reading between two runs normalizes the wall-time
    regression band (see compare_to_baseline)."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        # JVM leg: hash + aggregate over a generated range (codegen
        # CPU); pmod bounds the summand so ANSI mode cannot overflow
        spark.range(8_000_000).select(
            F.sum(F.pmod(F.xxhash64(F.col("id") % 1000, F.col("id")),
                         F.lit(1_000_000)))
        ).collect()
        # Python/Arrow leg: a grouped pandas pass (worker + Arrow I/O)
        (
            spark.range(120_000)
            .withColumn("g", F.col("id") % 64)
            .groupBy("g")
            .applyInPandas(
                lambda pdf: pdf.assign(id=pdf["id"] * 2), "id long, g long"
            )
            .selectExpr("sum(id)")
            .collect()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def shuffle_totals(spark) -> tuple[int, int]:
    """Cumulative (shuffle read bytes, shuffle write bytes) over every
    stage the AppStatusStore retains — per-query bytes are deltas of
    this between queries. Needs spark.ui.retainedStages to exceed the
    run's total stage count (main() pins 200k) or old stages evict and
    deltas go wrong; eviction shows up as a NEGATIVE delta, which the
    caller records as None instead of a bogus number."""
    sc = spark.sparkContext
    jvm = spark._jvm
    # The store is fed by the ASYNC listener bus: metrics of stages that
    # just finished can post after count() returns and get attributed to
    # the NEXT query's delta (ADVICE round 6). Drain the bus before every
    # snapshot so each delta owns its stages. API drift tolerated: the
    # no-arg overload threw on old Sparks, the (timeoutMillis) overload
    # is gone on new ones — try both, fall back to the raw snapshot.
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:
            pass
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    tot_r = tot_w = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        tot_r += s.shuffleReadBytes()
        tot_w += s.shuffleWriteBytes()
    return tot_r, tot_w


def compare_shuffle_to_baseline(shuffle_bytes: dict, baseline,
                                sf: float,
                                justifications: dict | None = None,
                                *, tolerance: float = BYTES_TOLERANCE,
                                floor: int = BYTES_FLOOR) -> list:
    """Flag queries whose shuffle WRITE bytes grew past ``tolerance ×
    baseline + floor`` vs the committed bench_last.json — the
    near-deterministic complement of the wall-time gate: a plan
    regression that adds an exchange can hide inside ±10% wall noise
    but cannot hide its bytes. Same justification suppression as the
    timing gate. Returns [{query, kind: "shuffle_bytes", baseline, now,
    ratio, justified?}] worst-first."""
    if not baseline or baseline.get("sf") != sf:
        return []
    just = justifications or {}
    base_b = baseline.get("shuffle_bytes", {})
    regs = []
    for name, now in shuffle_bytes.items():
        old = base_b.get(name)
        if not isinstance(now, dict) or not isinstance(old, dict):
            continue
        ow, nw = old.get("write"), now.get("write")
        if ow is None or nw is None:
            continue
        if nw > tolerance * ow + floor:
            entry = {
                "query": name,
                "kind": "shuffle_bytes",
                "baseline": ow,
                "now": nw,
                # None, not float('inf'), on a 0-byte baseline:
                # json.dumps would emit bare Infinity (invalid JSON) on
                # the bench's one-line output contract
                "ratio": round(nw / ow, 2) if ow else None,
            }
            if name in just:
                entry["justified"] = just[name]
            regs.append(entry)
    return sorted(
        regs, key=lambda e: -(e["ratio"] if e["ratio"] is not None
                              else float("inf"))
    )


def load_committed_baseline(repo_dir: str):
    """The committed bench_last.json, or None when unavailable (fresh
    clone without the file, not a git checkout, ...)."""
    try:
        out = subprocess.run(
            ["git", "-C", repo_dir, "show", "HEAD:bench_last.json"],
            capture_output=True, text=True, timeout=30,
        )
        if out.returncode != 0:
            return None
        return json.loads(out.stdout)
    except (OSError, ValueError, subprocess.SubprocessError):
        return None


def drift_factor(canary_now: float | None, baseline,
                 *, cap: float = DRIFT_CAP) -> float:
    """Host-drift normalizer for the wall-time gate: the ratio of this
    run's canary to the committed baseline's, clamped to [1.0, cap].
    1.0 when either side is missing (old baselines without a canary
    gate exactly as before), never below 1.0 (a faster host must not
    TIGHTEN the band below its nominal tolerance), capped so a real
    regression cannot hide behind an extreme canary reading."""
    if not canary_now or not baseline:
        return 1.0
    base_c = baseline.get("canary_sec")
    if not base_c or base_c <= 0:
        return 1.0
    return max(1.0, min(canary_now / base_c, cap))


def compare_to_baseline(timings: dict, baseline, sf: float,
                        justifications: dict | None = None,
                        *, tolerance: float = TOLERANCE,
                        floor: float = FLOOR_S,
                        drift: float = 1.0) -> list:
    """Flag queries that regressed vs the committed baseline. Only
    same-sf baselines are comparable; new queries (no baseline entry)
    and justified entries never flag. ``drift`` (>= 1.0, from
    :func:`drift_factor`) stretches the band when the canary says the
    whole host is slower — see the module docstring. Returns [{query,
    baseline, now, ratio, drift?, justified?}] sorted worst-first."""
    if not baseline or baseline.get("sf") != sf:
        return []
    just = justifications or {}
    base_q = baseline.get("queries", {})
    regs = []
    for name, now in timings.items():
        old = base_q.get(name)
        if old is None or old <= 0:
            continue
        if now > tolerance * old * drift + floor:
            entry = {
                "query": name,
                "baseline": old,
                "now": now,
                "ratio": round(now / old, 2),
            }
            if drift != 1.0:
                entry["drift"] = round(drift, 3)
            if name in just:
                entry["justified"] = just[name]
            regs.append(entry)
    return sorted(regs, key=lambda e: -e["ratio"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("renoir_spark_bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # the shuffle-bytes telemetry diffs cumulative stage metrics from
        # the AppStatusStore; the default 1000-stage retention evicts
        # mid-run on a 130-query × n-run suite and corrupts the deltas
        .config("spark.ui.retainedStages", "200000")
        .config("spark.ui.retainedJobs", "200000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from renoir_spark import suite

    # warmup: JVM + codegen, the Python/Arrow worker pool (first pandas
    # stage otherwise pays worker fork + import inside whichever query
    # hits it first), and the parquet footer of the biggest table
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    (
        spark.range(10_000)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, "id long, g long")
        .count()
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    # canary: fixed workload, same position in every run (right after
    # warmup) so committed-vs-now readings compare like for like
    canary_sec = run_canary(spark)
    print(f"# canary: {canary_sec:.3f}s", file=sys.stderr)

    # two passes, report the per-query MIN: pass 1 pays whole-stage
    # codegen + Python worker spin-up + any transient host load; the min
    # is the steady-state time — the figure that scales to the regime
    # where plan compilation is amortized over real data volumes
    # n >= 3 runs, report the min: run 1 pays codegen/worker spin-up,
    # and the min over three damps transient host load enough for the
    # regression gate's band to mean something
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    names = sorted(
        n for n in suite.QUERIES if (not only or n in only.split(","))
    )
    timings: dict[str, float] = {}
    streaming_state: dict[str, dict] = {}
    shuffle_bytes: dict[str, dict | None] = {}

    def _record_bytes(name: str, before: tuple[int, int]) -> tuple[int, int]:
        # bytes are near-deterministic: the LAST run's delta stands (a
        # min across runs would mix AQE decisions from different runs);
        # a negative delta means stage-store eviction — record None
        # rather than a bogus number. Returns the 'after' snapshot so
        # the caller can reuse it as the next query's 'before' (the
        # store walk is O(retained stages) of py4j round-trips).
        after = shuffle_totals(spark)
        dr, dw = after[0] - before[0], after[1] - before[1]
        shuffle_bytes[name] = (
            {"read": dr, "write": dw} if dr >= 0 and dw >= 0 else None
        )
        return after

    for r in range(runs):
        sb0 = shuffle_totals(spark)
        for name in names:
            fn = suite.QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            took = round(time.perf_counter() - t0, 3)
            sb0 = _record_bytes(name, sb0)
            timings[name] = min(timings.get(name, float("inf")), took)
            print(f"# run{r} {name}: {took:.3f}s ({n} rows)", file=sys.stderr)
            # queries are independent workloads: drop caches they persisted
            # (dedup signature relations etc.) so later queries aren't timed
            # against another query's leftover blocks and GC pressure
            spark.catalog.clearCache()
        for sname, sfn in STREAMING_LEGS.items():
            if only and sname not in only.split(","):
                continue
            n, took, st = sfn(spark, sf_dir)
            sb0 = _record_bytes(sname, sb0)
            timings[sname] = min(timings.get(sname, float("inf")), took)
            if st:
                # state-store telemetry (rows/bytes peak + watermark
                # evictions) — the measured form of the bounded-state
                # claim; identical across runs, keep the latest
                streaming_state[sname] = st
            print(f"# run{r} {sname}: {took:.3f}s ({n} rows, "
                  f"state peak {st.get('state_rows_peak', 0)} rows / "
                  f"{st.get('state_rows_removed', 0)} evicted)",
                  file=sys.stderr)
            # streaming legs get the same isolation as batch queries
            spark.catalog.clearCache()

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    baseline = load_committed_baseline(repo_dir)
    try:
        with open(os.path.join(repo_dir, "bench_justifications.json")) as f:
            justifications = json.load(f)
    except (OSError, ValueError):
        justifications = {}
    # PRIMARY gate: shuffle bytes (deterministic). SECONDARY: wall
    # seconds with the canary-drift-stretched band (module docstring).
    drift = drift_factor(canary_sec, baseline)
    if drift != 1.0:
        print(f"# drift: canary {baseline.get('canary_sec')}s -> "
              f"{canary_sec}s, wall band x{drift:.3f}", file=sys.stderr)
    regressions = compare_to_baseline(timings, baseline, sf,
                                      justifications, drift=drift)
    regressions += compare_shuffle_to_baseline(
        shuffle_bytes, baseline, sf, justifications
    )
    unjustified = [e for e in regressions if "justified" not in e]
    for e in regressions:
        tag = "justified: " + e["justified"] if "justified" in e else "REGRESSION"
        unit = " B shuffle-write" if e.get("kind") == "shuffle_bytes" else "s"
        print(
            f"# gate {e['query']}: {e['baseline']}{unit} -> {e['now']}{unit} "
            f"({e['ratio']}x) {tag}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    contract = {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "regressions": regressions,
    }
    full = dict(contract)
    full.update(
        {
            "streaming_state": streaming_state,
            "shuffle_bytes": shuffle_bytes,
            "canary_sec": canary_sec,
        }
    )
    # The FULL record (telemetry included) goes to bench_last.json next
    # to the script — the committed round-over-round baseline. Full-
    # suite sf0.1 runs only: a partial or off-sf run must not clobber
    # the regression baseline.
    if sf == 0.1 and not only:
        try:
            with open(os.path.join(repo_dir, "bench_last.json"), "w") as f:
                f.write(json.dumps(full) + "\n")
        except OSError:
            pass
    # The COMPACT contract line is the LAST thing on stdout (the
    # invoking harness captures a bounded output tail; shuffle/state
    # telemetry lives in bench_last.json, not here — round-11 fix).
    print(json.dumps(contract))
    if unjustified and os.environ.get("SPARK_GRAFT_BENCH_GATE", "fail") != "warn":
        print(
            f"# bench gate FAILED: {len(unjustified)} unjustified "
            "regression(s) vs committed bench_last.json",
            file=sys.stderr,
        )
        sys.exit(1)


_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)

# Streaming-drain shape knobs (VERDICT r6 ask #4): the availableNow
# drain's micro-batch structure is spool_files / max_files_per_trigger
# micro-batches of (rows / spool_files × max_files_per_trigger) rows
# each. Defaults reproduce the historical legs (8 range-partitioned
# files, 2 per trigger → 4 batches at EVERY scale factor, so per-batch
# ROW VOLUME grows with the corpus). tools/scale_curve.py sweeps these
# to attribute the s05 30× ratio between per-batch floors (batch
# count) and in-batch state growth (batch size) — see docs/SCALING.md.


def _spool_files() -> int:
    return int(os.environ.get("SPARK_GRAFT_SPOOL_FILES", "8"))


def _max_files_per_trigger() -> int:
    return int(os.environ.get("SPARK_GRAFT_MAX_FILES_TRIGGER", "2"))


def _spool_events(spark, sf_dir: str) -> str:
    """Untimed prep shared by the streaming legs: spool events into
    time-range-partitioned files with ascending mtimes, so the file
    source replays them as an in-order multi-micro-batch stream — one
    big file would collapse to a single batch and never exercise
    watermark-driven emission."""
    import glob
    import shutil
    import tempfile

    from renoir_spark.util import normalize_event_ts

    spool = tempfile.mkdtemp(prefix="nex_stream_")
    try:
        ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
        ev.repartitionByRange(_spool_files(), "ts").write.mode("overwrite").parquet(spool)
        parts = sorted(glob.glob(f"{spool}/part-*"))
        base = time.time() - len(parts) - 1
        for i, p in enumerate(parts):
            os.utime(p, (base + i, base + i))
    except BaseException:
        shutil.rmtree(spool, ignore_errors=True)
        raise
    return spool


def _stream_source(spark, spool: str):
    return (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", _max_files_per_trigger())
        .parquet(spool)
    )


def _run_streaming_leg(spark, sf_dir: str, build, spooler=None,
                       ) -> tuple[int, float, dict]:
    """Timed availableNow drain of a streaming query built by
    ``build(ctx, spool)``. State-store partitions are fixed at the
    query's first run by shuffle.partitions; every micro-batch then pays
    a task + store commit PER PARTITION PER STATEFUL OPERATOR,
    independent of row volume. Size them to stream throughput, not to
    the batch suite's shuffle width (measured here: 32 -> 7.3 s,
    8 -> 2.9 s for the identical drain). The 100 TB sizing rule is the
    same — state partitions ~ keys x update rate, chosen when the query
    starts, not inherited from batch defaults."""
    import shutil

    from renoir_spark import StreamContext
    from renoir_spark.streaming import run_to_completion

    ctx = StreamContext(spark)
    spool = (spooler or _spool_events)(spark, sf_dir)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = build(ctx, spool)
        telem: list = []
        t0 = time.perf_counter()
        n = len(run_to_completion(out.df, output_mode="append",
                                  telemetry=telem))
        took = round(time.perf_counter() - t0, 3)
        return n, took, (telem[0] if telem else {})
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(spool, ignore_errors=True)


def _spool_documents(spark, sf_dir: str) -> str:
    """Documents spooled as an in-order stream (ts synthesized from
    doc_id, one doc per second) for the fuzzy-dedup leg."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    spool = tempfile.mkdtemp(prefix="docs_stream_")
    try:
        # +3600: an event time of exactly epoch 0 (doc_id 0) ties the
        # INITIAL watermark (0) and Spark's stateful late-row filter
        # drops it — a boundary artifact, not operator semantics
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id",
                    F.timestamp_seconds(F.col("doc_id") + 3600).alias("ts"),
                    "text")
        )
        docs.repartitionByRange(_spool_files(), "ts").write.mode("overwrite").parquet(spool)
        parts = sorted(glob.glob(f"{spool}/part-*"))
        base = time.time() - len(parts) - 1
        for i, p in enumerate(parts):
            os.utime(p, (base + i, base + i))
    except BaseException:
        shutil.rmtree(spool, ignore_errors=True)
        raise
    return spool


def _streaming_minhash_dedup(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 5: MinHash-LSH fuzzy dedup band verdicts over an
    unbounded document stream — the FIFTH stateful machinery class:
    custom Python state keyed by LSH band buckets with WATERMARK-BOUNDED
    eviction (EventTimeTimeout), i.e. fuzzy dedup where exact streaming
    dedup (dropDuplicatesWithinWatermark) structurally cannot reach.
    The signature chain (normalize → shingle → minhash → band) runs as
    JVM expressions inside the micro-batch; only bucket matching is
    Python state. State is bounded to the `delay` horizon of docs per
    bucket."""
    from renoir_spark.streaming import dedup_minhash_stream

    def build(ctx, spool):
        src = (
            spark.readStream
            .schema("doc_id long, ts timestamp, text string")
            .option("maxFilesPerTrigger", _max_files_per_trigger())
            .parquet(spool)
        )
        # state_groups sized to ~8x the leg's 8 state partitions (the
        # documented dial): measured 18 s per-bucket-key / 6.5 s at 1024
        # groups / 4.4 s at 64 for the identical 20k-verdict drain.
        # SPARK_GRAFT_S05_KMV=k measures the bounded-per-doc-state dial
        # (round 9) on the same leg; default stays exact so the
        # baseline is comparable round over round.
        # SPARK_GRAFT_S05_BUCKET_CAP=n measures the per-bucket flood
        # dial (round 10) on the same leg; both dials default off so
        # the baseline stays comparable round over round.
        kmv = os.environ.get("SPARK_GRAFT_S05_KMV")
        cap = os.environ.get("SPARK_GRAFT_S05_BUCKET_CAP")
        return dedup_minhash_stream(
            ctx.from_df(src), "text", "doc_id", ts_col="ts",
            delay="600 seconds", threshold=0.7, state_groups=64,
            state_kmv=int(kmv) if kmv else None,
            bucket_cap=int(cap) if cap else None,
        )

    return _run_streaming_leg(spark, sf_dir, build, spooler=_spool_documents)


def _spool_embeddings(spark, sf_dir: str) -> str:
    """Embeddings spooled as an in-order stream (ts synthesized from
    vec_id) for the semantic-dedup leg; a 1.5×-scaled copy of every
    4th vector rides along (cos = 1 with its original) so the leg
    exercises real drops, not just state writes."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    spool = tempfile.mkdtemp(prefix="emb_stream_")
    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # +3600: epoch-0 event times tie the initial watermark and get
        # dropped as late (see _spool_documents)
        base = emb.select(
            "vec_id",
            F.timestamp_seconds(F.col("vec_id") + 3600).alias("ts"),
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        dups = emb.filter("vec_id % 4 = 0").select(
            (F.col("vec_id") + 500000).alias("vec_id"),
            F.timestamp_seconds(F.col("vec_id") + 503600).alias("ts"),
            F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
        )
        rows = base.unionByName(dups)
        rows.repartitionByRange(_spool_files(), "ts").write.mode("overwrite").parquet(spool)
        parts = sorted(glob.glob(f"{spool}/part-*"))
        t0 = time.time() - len(parts) - 1
        for i, p in enumerate(parts):
            os.utime(p, (t0 + i, t0 + i))
    except BaseException:
        shutil.rmtree(spool, ignore_errors=True)
        raise
    return spool


def _streaming_embedding_dedup(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 6: semantic (embedding-cosine) dedup over an
    unbounded vector stream — sign-LSH bucket + norm computed JVM-side
    per micro-batch, cosine verification in watermark-bounded Python
    state (the s05 machinery on the embedding modality; single-phase
    because one vector = one bucket = one verdict row)."""
    from renoir_spark.streaming import dedup_embedding_stream

    def build(ctx, spool):
        src = (
            spark.readStream
            .schema("vec_id long, ts timestamp, embedding array<double>")
            .option("maxFilesPerTrigger", _max_files_per_trigger())
            .parquet(spool)
        )
        return dedup_embedding_stream(
            ctx.from_df(src), "embedding", "vec_id", ts_col="ts",
            delay="3000 seconds", threshold=0.95, n_planes=8,
            state_groups=64,
        )

    return _run_streaming_leg(spark, sf_dir, build,
                              spooler=_spool_embeddings)


def _spool_media(spark, sf_dir: str) -> str:
    """Documents DECODED to 48-entry perceptual feature grids and
    spooled as an in-order media stream for the phash-dedup leg; a
    byte-identical re-download of every 4th item rides along under a
    fresh id (same blob → same signature → a guaranteed Hamming-0 drop,
    so the leg measures real verdict work, not just state writes)."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from renoir_spark import StreamContext

    spool = tempfile.mkdtemp(prefix="media_stream_")
    try:
        ctx = StreamContext(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = docs.select(
            "doc_id",
            F.timestamp_seconds(F.col("doc_id") + 3600).alias("ts"),
            F.encode(F.coalesce("text", F.lit("")), "UTF-8").alias("content"),
        )
        # the re-download arrives 1000 s after its original (ts below:
        # +4600 vs the base's +3600) — INSIDE the leg's 3000 s
        # watermark horizon BY CONSTRUCTION, so the Hamming-0 match is
        # guaranteed no matter how the spool files split across
        # triggers. (A PREVIOUS version offset the TIMESTAMP by
        # +500000 s, which only matched while every dup rode the same
        # trigger as its base row; the +500000 below offsets only the
        # doc_id, to keep the duplicate's id distinct.)
        dups = docs.filter("doc_id % 4 = 0").select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.timestamp_seconds(F.col("doc_id") + 4600).alias("ts"),
            F.encode(F.coalesce("text", F.lit("")), "UTF-8").alias("content"),
        )
        decoded = ctx.from_df(base.unionByName(dups)).decode_image(
            n_features=48
        ).df.select("doc_id", "ts", "image_features")
        decoded.repartitionByRange(_spool_files(), "ts").write.mode(
            "overwrite"
        ).parquet(spool)
        parts = sorted(glob.glob(f"{spool}/part-*"))
        t0 = time.time() - len(parts) - 1
        for i, p in enumerate(parts):
            os.utime(p, (t0 + i, t0 + i))
    except BaseException:
        shutil.rmtree(spool, ignore_errors=True)
        raise
    return spool


def _streaming_phash_dedup(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 7: perceptual-hash media dedup over an unbounded
    decoded stream — the round-8 multimodal member of the streaming
    dedup family. Signature packed JVM-side per micro-batch
    (phash_expr), band-bucket matching in watermark-bounded Python
    state holding only (id, ts, long) per entry — the lightest state of
    the family; two-phase like s05 (band verdicts; the per-item OR is
    the same stateless reduction) but this leg measures the stateful
    phase, which is where the streaming cost lives."""
    from renoir_spark.streaming import dedup_phash_stream

    def build(ctx, spool):
        src = (
            spark.readStream
            .schema("doc_id long, ts timestamp, image_features array<float>")
            .option("maxFilesPerTrigger", _max_files_per_trigger())
            .parquet(spool)
        )
        return dedup_phash_stream(
            ctx.from_df(src), "image_features", "doc_id", ts_col="ts",
            delay="3000 seconds", bits=48, bands=4, max_hamming=3,
            state_groups=64,
        )

    return _run_streaming_leg(spark, sf_dir, build, spooler=_spool_media)


def _streaming_hot_items(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 1: NEXMark q5 (hot items, chained stateful aggs)
    over the events table as an UNBOUNDED source — micro-batch engine,
    state store, watermark advancement, and append-mode finalization all
    on the measured path (the reference's headline bench is streaming
    NEXMark, benches/nexmark.rs:358-400)."""
    from renoir_spark.nexmark import hot_items

    def build(ctx, spool):
        s = ctx.from_df(_stream_source(spark, spool))
        return hot_items(s, size=172800.0, slide=86400.0, watermark="1 hour")

    return _run_streaming_leg(spark, sf_dir, build)


def _streaming_join(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 2: stream-stream event-time band join (clicks ⋈
    purchases per user within 6 h) — exercises the OTHER stateful
    machinery class: dual watermark frontiers and join-state eviction
    (state bounded by watermark + band width), per renoir's
    interval_join on unbounded input."""
    from renoir_spark.streaming import interval_join_stream

    def build(ctx, spool):
        clicks = ctx.from_df(_stream_source(spark, spool)).filter(
            "event_type = 'click'"
        ).map("event_id", "user_id", "ts")
        purchases = ctx.from_df(_stream_source(spark, spool)).filter(
            "event_type = 'purchase'"
        ).map("user_id", "ts", "value")
        return interval_join_stream(
            clicks, purchases, left_ts="ts", right_ts="ts",
            lower=21600.0, upper=0.0, on=["user_id"], watermark="1 hour",
        )

    return _run_streaming_leg(spark, sf_dir, build)


def _streaming_transaction_window(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 3: TransactionWindow over unbounded purchases —
    the THIRD stateful-machinery class beside chained JVM aggs (s01) and
    join state (s02): arbitrary per-key PYTHON window state
    (applyInPandasWithState) carried across micro-batches, with
    user-logic-driven commits. Per-user windows commit when the
    committing purchase exceeds the ~p90 value — ~10% commit rate,
    windows of ~10 rows, so the state store carries live buffers for
    most keys on every batch (the worst honest case for this operator)."""
    from renoir_spark.streaming import transaction_window_stream

    def build(ctx, spool):
        s = ctx.from_df(_stream_source(spark, spool)).filter(
            "event_type = 'purchase'"
        ).map("user_id", "event_id", "value")

        def logic(row, _state):
            return "commit" if (row["value"] or 0.0) > 113.0 else "continue"

        def agg(rows):
            return (len(rows),
                    round(sum(r["value"] or 0.0 for r in rows), 6))

        return transaction_window_stream(
            s, ["user_id"], "event_id", logic, agg=agg,
            out_extra_schema="n long, total double",
        )

    return _run_streaming_leg(spark, sf_dir, build)


def _streaming_sessions(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 4: per-user 30-minute-gap session windows
    (``session_agg`` → native ``session_window``) — the FOURTH stateful
    machinery class: MERGING window state. Unlike fixed windows (s01),
    join state (s02) or Python transaction buffers (s03), open sessions
    extend and COALESCE across micro-batches in the state store, and
    only watermark passage finalizes them — the streaming analog of the
    batch SessionWindow (q13)."""
    from pyspark.sql import functions as F

    from renoir_spark.streaming import session_agg

    def build(ctx, spool):
        s = ctx.from_df(_stream_source(spark, spool))
        return session_agg(
            s, "ts", gap=1800.0, keys=["user_id"], watermark="1 hour",
            n_events=F.count(F.lit(1)),
            total_value=F.round(F.sum("value"), 6),
        )

    return _run_streaming_leg(spark, sf_dir, build)


# Shared streaming-leg registry: bench's per-round loop and
# tools/scale_curve.py both dispatch from here, so a new leg can't be
# added to one and silently missed by the other.
def _streaming_highest_bid(spark, sf_dir: str) -> tuple[int, float, dict]:
    """Streaming leg 8: NEXMark q7 (highest bid — per-window GLOBAL
    argmax) over the events table as an unbounded source — the second
    unbounded NEXMark entry. Where s01 measures chained stateful
    aggregations (windowed count → per-window argmax), this measures
    the single global-window two-phase ``max_by`` (partial per
    partition, final in the window state) finalized by watermark
    advancement in append mode. Streaming≡batch parity is pinned in
    tests/test_nexmark.py::test_highest_bid_stream_equals_batch."""
    from renoir_spark.nexmark import highest_bid

    def build(ctx, spool):
        s = ctx.from_df(_stream_source(spark, spool))
        return highest_bid(s, size=86400.0, watermark="1 hour")

    return _run_streaming_leg(spark, sf_dir, build)


STREAMING_LEGS = {
    "s01_nexmark_hot_items_stream": _streaming_hot_items,
    "s02_stream_stream_join": _streaming_join,
    "s03_transaction_window_stream": _streaming_transaction_window,
    "s04_session_window_stream": _streaming_sessions,
    "s05_minhash_dedup_stream": _streaming_minhash_dedup,
    "s06_embedding_dedup_stream": _streaming_embedding_dedup,
    "s07_phash_dedup_stream": _streaming_phash_dedup,
    "s08_nexmark_highest_bid_stream": _streaming_highest_bid,
}


if __name__ == "__main__":
    main()
