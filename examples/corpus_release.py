"""Corpus release engineering — the versioning/audit loop around a
curated training corpus (the round-7 layer, suite queries qa36-qa41):

    snapshot v2 arrives (some docs gone, some edited, some new)
    → corpus_diff v2 vs v1: the release changelog, one hash join
    → incremental_rebuild: re-curate ONLY the delta (provably equal to
      re-running the whole pipeline — qa40's oracle is that identity)
    → corpus_overlap vs an external corpus: "how much of theirs do we
      already have?" (exact here; corpus_overlap_kmv at 100 TB)
    → dedup_cluster + assign_split_by_group: train/val/test where
      near-duplicates CANNOT straddle splits, audited by split_leakage
      (the naive per-id split is audited alongside to show the leak)
    → bigram_logprob: flag the low-coherence tail of the final corpus

Every stage is oracle-verified in the suite; this script wires them
into the release shape a corpus team runs per version bump.

Usage: python examples/corpus_release.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from renoir_spark import StreamContext


def curate(s):
    """The per-document-pure curation stage (Gopher gate + token count)
    — purity is what makes the incremental rebuild provably equal to a
    from-scratch run."""
    return s.quality_gopher("text").filter("q_keep").map(
        "doc_id", "text", "q_tokens"
    )


def main(sf_dir: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )

    # v1 = last release; v2 = this release (drops, edits, additions)
    v1 = docs.filter("doc_id % 13 <> 5")
    v2 = docs.filter("doc_id % 9 <> 4").map(
        doc_id=F.col("doc_id"),
        text=F.when(
            F.col("doc_id") % 6 == 1,
            F.concat(F.col("text"), F.lit(" (edited)")),
        ).otherwise(F.col("text")),
    )

    # 1. the changelog: one full-outer hash join, output is the delta
    delta = v2.corpus_diff(v1, "doc_id", ["text"])
    changelog = {
        r["status"]: r["n"]
        for r in delta.df.groupBy("status").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    print(f"changelog v1->v2: {changelog}")

    # 2. re-curate ONLY the delta; v1's curated output carries over
    prev = curate(v1)  # in production: read back the persisted v1 output
    curated = v2.incremental_rebuild(v1, prev, "doc_id", ["text"], curate)
    n_curated = curated.collect_count()
    print(f"curated v2 rows: {n_curated} (delta-only recompute)")

    # 3. overlap vs an external candidate corpus (here: the v1 tail we
    #    dropped) — buy/merge decisions need containment, not vibes
    external = docs.filter("doc_id % 13 = 5")
    ov = curated.corpus_overlap(external, "text").df.collect()[0]
    print(
        f"external overlap: jaccard={ov.jaccard} "
        f"containment_of_external={ov.containment_b}"
    )

    # 4. leakage-safe split: hash the duplicate-cluster key, then AUDIT
    clustered = curated.dedup_cluster_minhash("text", "doc_id")
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    safe = clustered.assign_split_by_group("cluster_id", w, salt="rel2")
    naive = clustered.assign_split("doc_id", w, salt="rel2")
    leaks_safe = safe.split_leakage("cluster_id").df.count()
    leaks_naive = naive.split_leakage("cluster_id").df.count()
    print(f"leaky clusters: group-keyed={leaks_safe} naive={leaks_naive}")
    assert leaks_safe == 0, "group-keyed split must never straddle"

    # 5. coherence tail: the interpolated bigram LM scores word ORDER,
    #    not just vocabulary — flag the bottom for review
    scored = curated.bigram_logprob("doc_id", "text")
    tail = scored.df.orderBy("avg_logprob2").limit(3).collect()
    print("lowest-coherence docs:", [(r.doc_id, r.avg_logprob2) for r in tail])

    # 6. the dataset card that ships with the release
    card = {r.metric: r.value
            for r in curated.corpus_report("doc_id", "text").df.collect()}
    print("dataset card:", card)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
