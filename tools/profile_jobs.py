#!/usr/bin/env python
"""Per-JOB wall breakdown of suite queries (round-10 measurement rig,
guide §1: measure first). For each named query this runs the bench
action (count) once warm and dumps every Spark job the query submitted
— duration, task count, shuffle bytes — so job-floor-bound queries
(many tiny jobs) separate from compute-bound ones (few fat stages).

Usage: python tools/profile_jobs.py q1 q2 ... [--sf DIR] [--runs N]
Output: JSON lines per query: {"query", "wall_s", "jobs": [...]}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cpus: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_jobs")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.retainedStages", "200000")
        .config("spark.ui.retainedJobs", "200000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _jobs_snapshot(spark):
    """List of finished jobs from the AppStatusStore: (id, name,
    duration_ms, n_tasks, n_stages)."""
    sc = spark.sparkContext
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        pass
    store = sc._jsc.sc().statusStore()
    out = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        sub = j.submissionTime()
        comp = j.completionTime()
        if not (sub.isDefined() and comp.isDefined()):
            continue
        dur = comp.get().getTime() - sub.get().getTime()
        out.append({
            "id": j.jobId(),
            "name": (j.name() or "")[:110],
            "ms": dur,
            "tasks": j.numTasks(),
            "stages": j.stageIds().size(),
        })
    return sorted(out, key=lambda d: d["id"])


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))

    spark = _session(cpus)
    from pyspark.sql import functions as F

    from renoir_spark import suite

    # bench-identical warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (spark.range(10_000).withColumn("g", F.col("id") % 8)
     .groupBy("g").applyInPandas(lambda pdf: pdf, "id long, g long")
     .count())
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    for name in names:
        fn = suite.QUERIES[name]
        best = None
        for r in range(runs):
            before = {j["id"] for j in _jobs_snapshot(spark)}
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            wall = round(time.perf_counter() - t0, 3)
            jobs = [j for j in _jobs_snapshot(spark)
                    if j["id"] not in before]
            spark.catalog.clearCache()
            if best is None or wall < best["wall_s"]:
                best = {"query": name, "run": r, "rows": n, "wall_s": wall,
                        "jobs_n": len(jobs),
                        "jobs_ms": sum(j["ms"] for j in jobs),
                        "jobs": jobs}
        print(json.dumps(best))


if __name__ == "__main__":
    main()
