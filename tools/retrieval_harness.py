"""Retrieval-quality instrumentation for hybrid_search (qa39).

Plants a MIXED-MODAL relevance set around one query — documents that are
relevant lexically only (share the query's rare terms, random vectors),
semantically only (vectors near the query vector, no query terms), or
both — inside a noise corpus, then measures recall@k of the BM25 leg,
the cosine leg, and the RRF fusion against the full planted set.

The point of rank fusion is exactly this case: each single leg is
structurally blind to half the relevance (BM25 cannot see the
semantic-only docs, cosine cannot see the lexical-only docs), so each
caps out near the fraction of relevance its modality covers, while RRF
recovers both halves without score normalization. The numbers feed
docs/SCALING.md so qa39's design claim ships measured, not asserted.

Everything is deterministic: planted ids, term injections and vector
perturbations come from fixed integer formulas (no RNG).

Usage: python tools/retrieval_harness.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 15
N_CAND = 40
# 5 lexical-only + 5 semantic-only + 5 both = 15 relevant docs; each
# single leg can REACH at most 10 of them (its own modality's 5 + the 5
# "both"), so a leg's recall@15 caps at 2/3 by construction — the gap
# fusion exists to close
PER_GROUP = 5
QUERY_TERMS = ["zanthic", "quorvex", "blenthar"]  # absent from the corpus


def _perturbed(vec, j, eps):
    out = list(vec)
    out[j % len(out)] = float(out[j % len(out)]) + eps
    return [float(x) for x in out]


def main(sf_dir: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from renoir_spark import StreamContext

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ctx = StreamContext()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qrow = embs.filter("vec_id = 7").collect()[0]
    qvec = [float(x) for x in qrow.embedding]
    base_texts = [r.text for r in docs.orderBy("doc_id").limit(40).collect()]
    donor_vecs = [
        [float(x) for x in r.embedding]
        for r in embs.filter("vec_id >= 100").orderBy("vec_id")
        .limit(3 * PER_GROUP).collect()
    ]

    # planted rows: ids 1_000_000+; three relevance groups
    rows = []
    terms = " ".join(QUERY_TERMS)
    for i in range(PER_GROUP):  # lexical-only: query terms, far vector
        rows.append((1_000_000 + i, f"{terms} {base_texts[i]}",
                     _perturbed(donor_vecs[i], i, 2.5)))
    for i in range(PER_GROUP):  # semantic-only: near-query vector
        rows.append((1_100_000 + i, base_texts[PER_GROUP + i],
                     _perturbed(qvec, i, 0.01 * (i + 1))))
    for i in range(PER_GROUP):  # both modalities
        rows.append((1_200_000 + i, f"{terms} {base_texts[2 * PER_GROUP + i]}",
                     _perturbed(qvec, i + 3, 0.01 * (i + 1))))
    planted = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<float>"
    )
    relevant = {r[0] for r in rows}

    corpus_docs = ctx.from_df(
        docs.join(embs, docs.doc_id == embs.vec_id)
        .select("doc_id", "text")
        .unionByName(planted.select("doc_id", "text"))
    )
    corpus_embs = ctx.from_df(
        embs.select(F.col("vec_id"), "embedding")
        .unionByName(
            planted.select(F.col("doc_id").alias("vec_id"), "embedding")
        )
    )

    fused = corpus_docs.hybrid_search(
        corpus_embs, QUERY_TERMS, 7, n_candidates=N_CAND, k=K
    ).df.collect()

    def recall(ids):
        return round(len(set(ids) & relevant) / min(K, len(relevant)), 3)

    # single-leg baselines measured directly at the same k
    from renoir_spark.prep import bm25_rank
    from renoir_spark.datapipe import ann_cosine_brute

    bm = bm25_rank(corpus_docs, "doc_id", "text", QUERY_TERMS, k=K).df.collect()
    qs = corpus_embs.filter("vec_id = 7")
    ann = ann_cosine_brute(corpus_embs, qs, k=K).df.collect()
    print({
        "k": K, "relevant": len(relevant), "per_group": PER_GROUP,
        "recall": {
            "bm25_only": recall([r.doc_id for r in bm]),
            "cosine_only": recall([r.vec_id for r in ann]),
            "rrf_fused": recall([r.doc_id for r in fused]),
        },
    })


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
