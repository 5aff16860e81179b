"""Recall instrumentation for MinHash-LSH dedup (the dedup_index /
dedup_minhash banding machinery).

LSH banding is the one approximate step in the fuzzy-dedup stack:
the Jaccard verify makes PRECISION exactly 1.0 by construction, so the
quality dial is RECALL — the fraction of true near-duplicate pairs
(exact shingle Jaccard ≥ threshold) that land in at least one shared
band bucket. Theory says P(candidate) = 1 - (1 - j^r)^b for a pair
with Jaccard j (r = rows per band, b = bands); this harness measures
it empirically on the documents table so the (num_hashes, bands)
sizing guidance in docs/SCALING.md ships with numbers.

Ground truth is EXACT and complete: an inverted shingle index finds
every pair sharing ≥ 1 shingle (a pair with jac > 0 must), and the
exact Jaccard is computed from per-doc shingle counts + the shared
count — no sampling, no all-pairs scan.

Usage:
    python tools/dedup_recall_harness.py [sf_dir] [--markdown]
"""
from __future__ import annotations

import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = (0.5, 0.7, 0.9)
CONFIGS = (  # (num_hashes, bands) — bands must divide num_hashes
    (8, 2),
    (12, 4),
    (12, 6),
    (16, 8),
    (24, 12),
)


def true_pairs(spark, docs_df, threshold: float):
    """Exact near-dup pair set {(ida, idb)} with shingle Jaccard ≥
    threshold, via a complete inverted index (no candidate loss)."""
    from renoir_spark.datapipe import md5_int31, norm_text, shingles_from

    staged = (
        docs_df.select(F.col("doc_id").alias("id"), "text")
        .withColumn("__norm", norm_text("text"))
        .withColumn("__toks", F.split(F.col("__norm"), " "))
        .withColumn("__sh", shingles_from(F.col("__toks"), F.col("__norm"), 3))
        .select("id", F.explode(
            F.transform(F.col("__sh"), lambda s: md5_int31(s))
        ).alias("gh"))
        .distinct()
        .persist()
    )
    sizes = staged.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = staged.select(F.col("id").alias("ida"), "gh")
    b = staged.select(F.col("id").alias("idb"), "gh")
    inter = (
        a.join(b, "gh")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    pairs = (
        inter.join(sizes.select(F.col("id").alias("ida"),
                                F.col("n").alias("na")), "ida")
        .join(sizes.select(F.col("id").alias("idb"),
                           F.col("n").alias("nb")), "idb")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= F.lit(threshold))
        .select("ida", "idb")
    )
    out = {(r.ida, r.idb) for r in pairs.collect()}
    staged.unpersist()
    return out


def lsh_pairs(ctx, docs, threshold: float, num_hashes: int, bands: int):
    from renoir_spark.datapipe import minhash_pairs

    res = minhash_pairs(
        docs, "text", "doc_id",
        num_hashes=num_hashes, bands=bands, threshold=threshold,
    )
    return {(r.ida, r.idb) for r in res.df.collect()}


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv and not argv[0].startswith("-") else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    markdown = "--markdown" in argv

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dedup_recall_harness")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from renoir_spark import StreamContext

    ctx = StreamContext(spark)
    base = ctx.stream_parquet(f"{sf_dir}/documents.parquet")
    # The generator's planted duplicates are near-identical (jac ≈ 1),
    # where every banding config trivially scores recall 1.0 — augment
    # with perturbed copies at CONTROLLED overlap so the banding
    # S-curve has borderline pairs to miss: every k-th token replaced
    # (k = 8/4/2 by id residue) yields true-pair Jaccard spread roughly
    # across [0.3, 0.9] after 3-gram shingling (each changed token
    # breaks up to 3 shingles).
    tok = F.split(F.col("text"), " ")
    k_of = F.element_at(
        F.array(F.lit(8), F.lit(4), F.lit(2)),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    mutated = F.array_join(
        F.zip_with(
            tok,
            F.sequence(F.lit(1), F.size(tok)),
            lambda w, i: F.when(i % k_of == 0,
                                F.concat(F.lit("zz"), i.cast("string")))
            .otherwise(w),
        ),
        " ",
    )
    copies = base.df.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        mutated.alias("text"),
    )
    docs = ctx.from_df(
        base.df.select("doc_id", "text").unionByName(copies)
    )
    n = docs.df.count()

    rows = []
    for threshold in THRESHOLDS:
        t0 = time.perf_counter()
        truth = true_pairs(spark, docs.df, threshold)
        truth_s = round(time.perf_counter() - t0, 2)
        for num_hashes, bands in CONFIGS:
            t0 = time.perf_counter()
            got = lsh_pairs(ctx, docs, threshold, num_hashes, bands)
            wall = round(time.perf_counter() - t0, 2)
            rec = (round(len(got & truth) / len(truth), 4)
                   if truth else 1.0)
            # precision is 1.0 by construction (exact verify) — assert
            # rather than report
            assert got <= truth, "verified pair outside the truth set"
            rows.append((threshold, num_hashes, bands, len(truth),
                         rec, wall, truth_s))

    hdr = (f"LSH pair recall vs exact inverted-index truth over {n} docs "
           f"({sf_dir}); precision = 1.0 by construction (Jaccard verify)")
    if markdown:
        print("<!-- generated by tools/dedup_recall_harness.py -->")
        print(f"_{hdr}_\n")
        print("| threshold | num_hashes | bands | true pairs | recall "
              "| wall s |")
        print("|---|---|---|---|---|---|")
        for t, h, b, np_, rec, wall, _ in rows:
            print(f"| {t} | {h} | {b} | {np_} | {rec} | {wall} |")
    else:
        for t, h, b, np_, rec, wall, ts in rows:
            print(f"threshold={t} hashes={h} bands={b} "
                  f"true={np_} recall={rec} wall={wall}s (truth {ts}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
