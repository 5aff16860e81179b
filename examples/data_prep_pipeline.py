"""End-to-end LLM training-data hygiene pipeline on the prep layer:

    redact PII → quality gate → repetition filter → exact dedup →
    benchmark decontamination → domain-mix rebalance → pack into
    fixed-size training sequences

Every stage is declarative (suite query q80 verifies the composed
pipeline against a composed DuckDB oracle); the map-side stages fuse
into the scan, and the only shuffles are the dedup key, the repetition
gram count, and the pack-bucket window.

Usage: python examples/data_prep_pipeline.py [documents.parquet]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(path: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    docs = ctx.stream_parquet(path).map("doc_id", "lang", "n_chars", "text")

    # benchmark slice to decontaminate against (stand-in: every 10th doc)
    benchmark = ctx.stream_parquet(path).filter("doc_id % 10 = 0").map("text")

    clean_ids = (
        docs.contaminated_ngrams(benchmark, "doc_id", "text", "text", n=8)
        .filter("NOT contaminated")
        .map("doc_id")
    )

    survivors = (
        docs
        .pii_redact("text")
        .map("doc_id", "lang", "n_chars", text=F.col("text_redacted"))
        .quality_gopher("text")
        .filter("q_keep")
        .map("doc_id", "lang", "n_chars", "text")
        .repetition_stats("doc_id", "text")
        .filter("rep_keep")
        .map("doc_id")
        .join(docs, "doc_id")
        .dedup_exact("text", order=["doc_id"])
        .join(clean_ids, "doc_id")
        .rebalance_mix("doc_id", "lang",
                       {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.1,
                        "zh": 0.1})
        .map("doc_id", "lang", "n_chars")
    )

    packed = survivors.pack_sequences("doc_id", "n_chars",
                                      max_tokens=2048, n_buckets=16)
    summary = (
        packed.group_by("pack_bucket")
        .fold(docs=F.count("*"), packs=F.countDistinct("pack_id"),
              tokens=F.sum("n_chars"))
        .sorted_by(F.col("pack_bucket"))
    )
    for row in summary.collect_vec():
        print(f"bucket {row.pack_bucket}: {row.docs} docs "
              f"{row.packs} packs {row.tokens} tokens")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "/root/testdata/sf0.001/documents.parquet")
