#!/usr/bin/env python
"""Opt-in HEAVY-FAMILY core-scaling profile (round-11, VERDICT ask #7).

At sf0.1 every suite query is Spark job-floor-bound (inputs are
0.3-11 MB), so the driver's 8-core-vs-32-core scaling block reads ~1.0
for everything — an SF artifact, not a property of the operators. This
tool derives a deterministic ~10x dataset from sf0.1 (documents and
embeddings — the tables the heavy index/pair/cluster family reads),
runs that family once at each core count in SEPARATE sequential
sessions, and prints per-query walls + the c_low/c_high ratio.

Scaling construction (seedless, reproducible):
- documents x REPS: replica r gets doc_id + r*10_000_000 and a two-word
  per-replica salt appended to the text, so replicas are NEAR-duplicates
  (realistic dedup structure: shared shingle mass, distinct content
  keys) rather than byte-identical floods that collapse into one
  cluster.
- embeddings x REPS: replica r gets vec_id + r*10_000_000 and each
  component perturbed by a deterministic per-(replica, id, dim) hash
  jitter (±5%), so replicas are semantically close but not exact.

Usage:
    python tools/heavy_profile.py --gen            # build /tmp dataset
    python tools/heavy_profile.py --run            # profile c32 vs c8
    python tools/heavy_profile.py --gen --run

Environment: SPARK_GRAFT_HEAVY_DIR (default /tmp/renoir_heavy_sf1),
SPARK_GRAFT_HEAVY_REPS (default 10), SPARK_GRAFT_HEAVY_CPUS
(default "32,8"), SPARK_GRAFT_HEAVY_QUERIES (comma list; default the
index/pair/cluster family below). This is a measurement tool, not the
bench contract: it never touches bench_last.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY_DIR = os.environ.get("SPARK_GRAFT_HEAVY_DIR", "/tmp/renoir_heavy_sf1")
REPS = int(os.environ.get("SPARK_GRAFT_HEAVY_REPS", "10"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = (
    "q28_dedup_minhash,q83_dedup_cluster,qa17_ssjoin_exact,"
    "qa07_dedup_index_batch,qa08_dedup_index_incremental,"
    "qa06_ann_index_roundtrip,qa28_ann_index_dedup,q99_ann_sq8"
)


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"heavy_profile_c{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def gen() -> None:
    from pyspark.sql import functions as F

    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(HEAVY_DIR, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(REPS).select(F.col("id").alias("__r"))
    big_docs = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__r") * 10_000_000).alias("doc_id"),
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.concat_ws(
                    " ", F.col("text"),
                    F.concat(F.lit("rep"), F.col("__r").cast("string")),
                    F.md5(F.concat_ws("|", F.col("__r").cast("string"),
                                      F.col("doc_id").cast("string"))),
                )
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    # spread the write so the scan side of the profile carries real
    # partitioning (one giant file would re-create the 1-task trap)
    big_docs.repartition(32, "doc_id").write.mode("overwrite").parquet(
        f"{HEAVY_DIR}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    jit = (
        F.transform(
            F.col("embedding"),
            lambda x, i: x * (
                F.lit(1.0)
                + (
                    F.pmod(
                        F.xxhash64(F.col("__r"), F.col("vec_id"), i),
                        F.lit(1000),
                    ) - F.lit(500)
                ) / F.lit(10_000.0)
            ),
        )
    )
    big_emb = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("__r") * 10_000_000).alias("vec_id"),
            jit.alias("embedding"),
        )
    )
    big_emb.repartition(32, "vec_id").write.mode("overwrite").parquet(
        f"{HEAVY_DIR}/embeddings.parquet"
    )
    # the heavy family reads only documents/embeddings; symlink the
    # rest so any incidental _t() read resolves
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = f"{HEAVY_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    nd = spark.read.parquet(f"{HEAVY_DIR}/documents.parquet").count()
    ne = spark.read.parquet(f"{HEAVY_DIR}/embeddings.parquet").count()
    print(f"# generated {HEAVY_DIR}: documents={nd} embeddings={ne}")
    spark.stop()


def run() -> None:
    names = os.environ.get(
        "SPARK_GRAFT_HEAVY_QUERIES", DEFAULT_QUERIES
    ).split(",")
    cpus_list = [
        int(c) for c in os.environ.get(
            "SPARK_GRAFT_HEAVY_CPUS", "32,8"
        ).split(",")
    ]
    results: dict[int, dict[str, float]] = {}
    for cpus in cpus_list:
        spark = _session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        from pyspark.sql import functions as F

        from renoir_spark import suite

        # bench-identical warmup
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        (spark.range(10_000).withColumn("g", F.col("id") % 8)
         .groupBy("g").applyInPandas(lambda pdf: pdf, "id long, g long")
         .count())
        per: dict[str, float] = {}
        for name in names:
            fn = suite.QUERIES[name]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, HEAVY_DIR).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            per[name] = round(best, 3)
            print(f"# c{cpus} {name}: {per[name]:.3f}s", file=sys.stderr)
        results[cpus] = per
        spark.stop()
    out = {"dir": HEAVY_DIR, "reps": REPS, "cpus": cpus_list,
           "per_query": results}
    if len(cpus_list) == 2:
        hi, lo = cpus_list[0], cpus_list[1]
        out["ratio_low_over_high"] = {
            n: round(results[lo][n] / results[hi][n], 2)
            for n in names if results[hi].get(n)
        }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--gen" in sys.argv:
        gen()
    if "--run" in sys.argv:
        run()
    if "--gen" not in sys.argv and "--run" not in sys.argv:
        print(__doc__)
