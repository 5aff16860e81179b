#!/usr/bin/env python
"""Measured scaling curves: replicate the sf0.1 corpus k× (k = 1, 3, 10)
with DISTINCT content, run the heavy operators at each size, and print
per-query seconds — the empirical answer to "does this plan's cost grow
linearly with the data?".

Replication must not inflate duplicate density (k identical copies of
each document would grow near-dup pair counts k² per bucket — a
different, harder workload, not a bigger one). So:

- documents: every 4th word of copy i (i>0) is replaced by a
  copy-specific token — 3-gram shingle overlap with the original drops
  to ~0.3 Jaccard, below every dedup threshold in the suite, so the
  planted-duplicate structure each query adds on top stays constant
  per document.
- events: event/user ids shift by i × 10^7 — more users over the same
  time range (horizontal growth), per-user event counts unchanged.
- embeddings: ids shift; dimension (i mod 64) gets +0.5 — cosine to the
  original falls below the 0.95 dedup threshold.

Usage: python tools/scale_curve.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_SCALE_FACTORS (default "1,3,10"),
     SPARK_GRAFT_SCALE_QUERIES (comma list, default the heavy set),
     SPARK_GRAFT_SCALE_PROFILE ("replicate" default, or "entropy":
     documents get 150 UNIQUE md5-prefix tokens each — the long-tail
     shingle profile of a real web corpus, where nearly every shingle
     is rare and distinct-key exchanges are corpus-sized; testdata's
     small vocabulary repeats each shingle ~30×, which makes exact
     distinct-key passes unrealistically cheap).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_DEFAULT = [
    "q09_wordcount",
    "q13_sessions",
    "q27_dedup_exact",
    "q28_dedup_minhash",
    "q34_ngram_jaccard",
    "q83_dedup_cluster",
    "q86_asof_join",
    "q88_dedup_embedding_ivf",
    "q94_longest_dup_span",
    "qa07_dedup_index_batch",
    "qa09_dsir_select",
    "qa10_nb_classifier",
]


def build_scaled(spark, src_dir: str, dst_dir: str, k: int,
                 profile: str = "replicate") -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst_dir, exist_ok=True)
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    if profile == "entropy":
        n = docs.count() * k
        (spark.range(n)
         .select(
             F.col("id").alias("doc_id"),
             F.concat_ws(" ", F.transform(
                 F.sequence(F.lit(1), F.lit(150)),
                 lambda i: F.substring(
                     F.md5(F.concat(F.col("id").cast("string"),
                                    F.lit(":"), i.cast("string"))),
                     1, 10),
             )).alias("text"),
             F.lit("en").alias("lang"),
             F.lit("synthetic").alias("source"),
         )
         .write.mode("overwrite").parquet(f"{dst_dir}/documents.parquet"))
        for t in ("events", "embeddings"):
            shutil.copy(f"{src_dir}/{t}.parquet", f"{dst_dir}/{t}.parquet")
        return
    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")

    d_parts = []
    for i in range(k):
        d = docs.withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
        if i > 0:
            toks = F.split(F.col("text"), " ")
            d = d.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        toks,
                        lambda x, j: F.when(
                            j % 4 == 3, F.concat(F.lit(f"cp{i}x"), x)
                        ).otherwise(x),
                    ),
                ),
            )
        d_parts.append(d)
    _union(d_parts).write.mode("overwrite").parquet(f"{dst_dir}/documents.parquet")

    e_parts = [
        ev.withColumn("event_id", F.col("event_id") + i * 10_000_000)
        .withColumn("user_id", F.col("user_id") + i * 10_000_000)
        for i in range(k)
    ]
    _union(e_parts).write.mode("overwrite").parquet(f"{dst_dir}/events.parquet")

    m_parts = []
    for i in range(k):
        m = emb.withColumn("vec_id", F.col("vec_id") + i * 10_000_000)
        if i > 0:
            m = m.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: F.when(j == i % 64, x + F.lit(0.5)).otherwise(x),
                ),
            )
        m_parts.append(m)
    _union(m_parts).write.mode("overwrite").parquet(f"{dst_dir}/embeddings.parquet")


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALE_FACTORS", "1,3,10").split(",")]
    qnames = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    qnames = qnames.split(",") if qnames else QUERIES_DEFAULT
    profile = os.environ.get("SPARK_GRAFT_SCALE_PROFILE", "replicate")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("renoir_spark_scale_curve")
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
    from renoir_spark import suite

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results: dict[str, dict[int, float]] = {q: {} for q in qnames}
    rows_at: dict[int, int] = {}
    for k in ks:
        work = tempfile.mkdtemp(prefix=f"scale{k}_")
        try:
            t0 = time.perf_counter()
            build_scaled(spark, src, work, k, profile)
            rows_at[k] = spark.read.parquet(f"{work}/documents.parquet").count()
            print(f"# built k={k} ({rows_at[k]} docs) in "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            for q in qnames:
                best = float("inf")
                for _ in range(2):
                    if q.startswith("s0"):
                        # streaming bench legs (bench.py) take the same
                        # (spark, sf_dir) surface and time their own
                        # availableNow drain; dispatch from the shared
                        # registry so new legs can't drift out of reach
                        import bench

                        n, took, _state = bench.STREAMING_LEGS[q](spark, work)
                        best = min(best, took)
                    else:
                        t0 = time.perf_counter()
                        n = suite.QUERIES[q](spark, work).count()
                        best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                results[q][k] = round(best, 3)
                print(f"# k={k} {q}: {best:.3f}s ({n} rows)", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    out = {
        "base_sf_dir": src,
        "profile": profile,
        "factors": ks,
        "docs_rows": rows_at,
        "seconds": results,
        "ratio_vs_k1": {
            q: {k: round(results[q][k] / results[q][ks[0]], 2) for k in ks}
            for q in qnames if results[q].get(ks[0])
        },
    }
    payload = json.dumps(out, indent=2)
    print(payload)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(payload + "\n")


if __name__ == "__main__":
    main()
