#!/usr/bin/env python
"""Measure the media-dedup band dials the round-8 verdict asked for:
qa48 (video frame-vote dedup) and qa44 (image dedup) at 1x/10x/30x with

- the shipped default: bands=4 at 48 bits (12-bit bands — the smallest
  width that still GUARANTEES a shared band for every Hamming-<=3 pair),
- the volume dial: bands=3 (16-bit bands, 16x fewer uniform-random
  collisions; trades the guarantee down to Hamming-<=2),
- the bucket_cap df-cutoff (skew dial: drops over-crowded
  non-discriminative buckets; uniform-noise buckets are ~Poisson so a
  cap sized at ~4x the uniform mean is a no-op there by design — it
  exists for the constant-frame / letterbox regime).

Writes the same JSON shape as tools/scale_curve.py. Results land in
docs/SCALING.md.

Usage: python tools/media_dial_curve.py [out.json]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_FACTORS (default "1,10,30"),
     SPARK_GRAFT_CPUS
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_curve import build_scaled  # noqa: E402


def _media(spark, sf_dir):
    from pyspark.sql import functions as F

    from renoir_spark import StreamContext

    ctx = StreamContext(spark)
    from renoir_spark.suite import _t

    return (
        _t(ctx, sf_dir, "documents")
        .map(
            doc_id=F.col("doc_id"),
            content=F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"),
        )
        .shuffle()
    )


def qa48_bands4(spark, sf_dir):
    return _media(spark, sf_dir).dedup_video_phash("doc_id", "content").df


def qa48_bands3(spark, sf_dir):
    return _media(spark, sf_dir).dedup_video_phash(
        "doc_id", "content", bands=3
    ).df


def qa48_cap(spark, sf_dir):
    return _media(spark, sf_dir).dedup_video_phash(
        "doc_id", "content", bucket_cap=150
    ).df


def qa44_bands4(spark, sf_dir):
    return _media(spark, sf_dir).decode_image(n_features=48).dedup_phash(
        "image_features", "doc_id"
    ).df


def qa44_bands3(spark, sf_dir):
    return _media(spark, sf_dir).decode_image(n_features=48).dedup_phash(
        "image_features", "doc_id", bands=3
    ).df


VARIANTS = {
    "qa48_bands4": qa48_bands4,
    "qa48_bands3": qa48_bands3,
    "qa48_cap150": qa48_cap,
    "qa44_bands4": qa44_bands4,
    "qa44_bands3": qa44_bands3,
}


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ks = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALE_FACTORS", "1,10,30").split(",")]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("renoir_spark_media_dial_curve")
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

    results: dict[str, dict[int, float]] = {q: {} for q in VARIANTS}
    for k in ks:
        work = tempfile.mkdtemp(prefix=f"mediadial{k}_")
        try:
            build_scaled(spark, src, work, k, "replicate")
            for q, fn in VARIANTS.items():
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = fn(spark, work).count()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                results[q][k] = round(best, 3)
                print(f"# k={k} {q}: {best:.3f}s ({n} rows)",
                      file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    out = {
        "base_sf_dir": src,
        "factors": ks,
        "seconds": results,
        "ratio_vs_k1": {
            q: {k: round(results[q][k] / results[q][ks[0]], 2) for k in ks}
            for q in VARIANTS if results[q].get(ks[0])
        },
    }
    payload = json.dumps(out, indent=2)
    print(payload)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(payload + "\n")


if __name__ == "__main__":
    main()
