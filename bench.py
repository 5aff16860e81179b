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

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
