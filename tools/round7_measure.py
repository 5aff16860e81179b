#!/usr/bin/env python
"""Round-7 measurements (one-shot harness feeding docs/SCALING.md):

1. The DEFAULT `ann_index_build()` path (n_cells=None auto-dial) at
   1x/10x — the curve row the round-6 verdict asked for after flipping
   the pinned-16 default: build + query-batch + dedup_batch with NO
   explicit cell count must sit in the dialed (~linear) regime, not the
   pinned-cell quadratic.

2. The s05 streaming-drain micro-batch grid: s05's 30x wall ratio was
   diagnosed as micro-batch structure (drain floors + per-batch Python
   state calls), not state size. SPARK_GRAFT_SPOOL_FILES /
   SPARK_GRAFT_MAX_FILES_TRIGGER now shape the drain; this sweeps
   (files, mft) at 1x and 30x and records wall + batch count so the
   diagnosis is a table, not prose.

Usage: python tools/round7_measure.py [out.json] [--part1|--part2]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cpus: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("round7_measure")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    return spark


def default_build_curve(spark, src: str, factors=(1, 10)) -> dict:
    """Build with ALL defaults, query a 10%-of-corpus batch, dedup a
    planted batch — the qa28/qa32 shape on the DEFAULT path."""
    from pyspark.sql import functions as F

    from renoir_spark import StreamContext
    from scale_curve import build_scaled

    ctx = StreamContext(spark)
    out = {}
    for k in factors:
        work = tempfile.mkdtemp(prefix=f"r7dial{k}_")
        try:
            build_scaled(spark, src, work, k)
            emb = ctx.stream_parquet(f"{work}/embeddings.parquet")
            n = emb.df.count()
            best = float("inf")
            cells = None
            for _ in range(2):
                idx_path = os.path.join(work, "idx")
                t0 = time.perf_counter()
                idx = emb.ann_index_build(idx_path)  # ALL defaults
                # query batch grows with the corpus (the qa32 regime)
                batch = ctx.from_df(
                    emb.df.filter("vec_id % 10 = 0").select(
                        (F.col("vec_id") + 7_000_000).alias("vec_id"),
                        F.transform(
                            "embedding", lambda x: x * F.lit(1.5)
                        ).alias("embedding"),
                    )
                )
                kept = idx.dedup_batch(batch, threshold=0.95).df.count()
                took = time.perf_counter() - t0
                best = min(best, took)
                cells = idx.meta["n_cells"]
                spark.catalog.clearCache()
            out[str(k)] = {
                "sec": round(best, 3), "vectors": n, "n_cells": cells,
                "survivors": kept,
            }
            print(f"# dial k={k}: {best:.2f}s cells={cells} n={n} "
                  f"survivors={kept}", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    if "1" in out and "10" in out and out["1"]["sec"]:
        out["ratio_10x"] = round(out["10"]["sec"] / out["1"]["sec"], 2)
    return out


def s05_grid(spark, src: str) -> list:
    """Sweep (factor, spool_files, max_files_per_trigger) for the s05
    drain; records wall + micro-batch count from the state telemetry."""
    import bench
    from scale_curve import build_scaled

    grid = [
        # (factor, files, mft, label)
        (1, 8, 2, "1x default (4-5 batches)"),
        (1, 8, 8, "1x single batch"),
        (30, 8, 2, "30x default (same batch COUNT as 1x, 30x rows/batch)"),
        (30, 8, 8, "30x single batch"),
        (30, 240, 2, "30x matched batch SIZE (120 batches of 1x volume)"),
    ]
    rows = []
    for k, files, mft, label in grid:
        work = tempfile.mkdtemp(prefix=f"r7s05_{k}_")
        try:
            build_scaled(spark, src, work, k)
            os.environ["SPARK_GRAFT_SPOOL_FILES"] = str(files)
            os.environ["SPARK_GRAFT_MAX_FILES_TRIGGER"] = str(mft)
            best, batches, n = float("inf"), None, None
            for _ in range(2):
                n, took, st = bench.STREAMING_LEGS[
                    "s05_minhash_dedup_stream"](spark, work)
                if took < best:
                    best, batches = took, st.get("batches")
                spark.catalog.clearCache()
            rows.append({
                "factor": k, "spool_files": files, "mft": mft,
                "label": label, "sec": round(best, 3),
                "batches": batches, "rows": n,
            })
            print(f"# s05 {label}: {best:.2f}s batches={batches} "
                  f"rows={n}", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
            os.environ.pop("SPARK_GRAFT_SPOOL_FILES", None)
            os.environ.pop("SPARK_GRAFT_MAX_FILES_TRIGGER", None)
    return rows


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    args = sys.argv[1:]
    out_path = next((a for a in args if not a.startswith("-")), None)
    spark = _session(cpus)
    out = {}
    if "--part2" not in args:
        out["default_build_curve"] = default_build_curve(spark, src)
    if "--part1" not in args:
        out["s05_grid"] = s05_grid(spark, src)
    payload = json.dumps(out, indent=2)
    print(payload)
    if out_path:
        with open(out_path, "w") as f:
            f.write(payload + "\n")


if __name__ == "__main__":
    main()
