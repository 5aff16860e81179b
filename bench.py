#!/usr/bin/env python
"""Benchmark harness: runs the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "suite_total", "value": <sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Timing is per-query wall time of plan + execution (a count/collect
action); session/JVM startup is excluded (one warmup action first).
"""

from __future__ import annotations

import json
import os
import sys
import time


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

    # two passes, report the per-query MIN: pass 1 pays whole-stage
    # codegen + Python worker spin-up + any transient host load; the min
    # is the steady-state time — the figure that scales to the regime
    # where plan compilation is amortized over real data volumes
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))
    timings: dict[str, float] = {}
    for r in range(runs):
        for name in sorted(suite.QUERIES):
            fn = suite.QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            took = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, float("inf")), took)
            print(f"# run{r} {name}: {took:.3f}s ({n} rows)", file=sys.stderr)
            # queries are independent workloads: drop caches they persisted
            # (dedup signature relations etc.) so later queries aren't timed
            # against another query's leftover blocks and GC pressure
            spark.catalog.clearCache()
        for sname, sfn in (
            ("s01_nexmark_hot_items_stream", _streaming_hot_items),
            ("s02_stream_stream_join", _streaming_join),
            ("s03_transaction_window_stream", _streaming_transaction_window),
            ("s04_session_window_stream", _streaming_sessions),
            ("s05_minhash_dedup_stream", _streaming_minhash_dedup),
        ):
            n, took = sfn(spark, sf_dir)
            timings[sname] = min(timings.get(sname, float("inf")), took)
            print(f"# run{r} {sname}: {took:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "suite_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    print(line)
    # the harness that invokes this script captures only a short output
    # tail, which truncates the per-query JSON once the suite is large —
    # also persist the full line next to the script so round-over-round
    # comparisons always have the complete numbers in-repo
    try:
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_last.json")
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


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
        ev.repartitionByRange(8, "ts").write.mode("overwrite").parquet(spool)
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
        .option("maxFilesPerTrigger", 2)
        .parquet(spool)
    )


def _run_streaming_leg(spark, sf_dir: str, build, spooler=None) -> tuple[int, float]:
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
        t0 = time.perf_counter()
        n = len(run_to_completion(out.df, output_mode="append"))
        return n, round(time.perf_counter() - t0, 3)
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
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.timestamp_seconds("doc_id").alias("ts"), "text")
        )
        docs.repartitionByRange(8, "ts").write.mode("overwrite").parquet(spool)
        parts = sorted(glob.glob(f"{spool}/part-*"))
        base = time.time() - len(parts) - 1
        for i, p in enumerate(parts):
            os.utime(p, (base + i, base + i))
    except BaseException:
        shutil.rmtree(spool, ignore_errors=True)
        raise
    return spool


def _streaming_minhash_dedup(spark, sf_dir: str) -> tuple[int, float]:
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
            .option("maxFilesPerTrigger", 2)
            .parquet(spool)
        )
        # state_groups sized to ~8x the leg's 8 state partitions (the
        # documented dial): measured 18 s per-bucket-key / 6.5 s at 1024
        # groups / 4.4 s at 64 for the identical 20k-verdict drain
        return dedup_minhash_stream(
            ctx.from_df(src), "text", "doc_id", ts_col="ts",
            delay="600 seconds", threshold=0.7, state_groups=64,
        )

    return _run_streaming_leg(spark, sf_dir, build, spooler=_spool_documents)


def _streaming_hot_items(spark, sf_dir: str) -> tuple[int, float]:
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


def _streaming_join(spark, sf_dir: str) -> tuple[int, float]:
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


def _streaming_transaction_window(spark, sf_dir: str) -> tuple[int, float]:
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


def _streaming_sessions(spark, sf_dir: str) -> tuple[int, float]:
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


if __name__ == "__main__":
    main()
