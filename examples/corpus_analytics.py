"""Corpus analytics — the round-4 operator family on one corpus:
Misra-Gries exact heavy hitters (bounded candidate shuffle), bloom
decontamination (broadcast bit-array prefilter + exact confirm),
unigram-LM perplexity scoring, and a learned BPE merge table applied
back to the corpus. No reference analog — these are the beyond-renoir
training-data operators (SURVEY.md §2.12).

Usage: python examples/corpus_analytics.py <sf_dir> [num_merges]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(sf_dir: str, num_merges: int = 8) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet")

    print("== exact top-5 words (two-pass Misra-Gries) ==")
    words = (
        docs.shuffle()
        .flat_map(F.split(F.lower("text"), r"[^a-z0-9]+"), alias="word")
        .filter("word <> ''")
    )
    for r in words.heavy_hitters("word", 5, capacity=64).collect_vec():
        print(f"  {r.word}\t{r.cnt}")

    print("== bloom decontamination vs the first 50 doc ids ==")
    seen = docs.filter("doc_id < 50")
    clean = docs.dedup_against_bloom(seen, "text")
    print(f"  kept {clean.collect_count()} of {docs.collect_count()} docs")

    print("== lowest-perplexity-score (most boilerplate-ish) docs ==")
    scored = docs.unigram_logprob("doc_id", "text")
    for r in scored.sorted_limit_by([F.col("avg_logprob"), "doc_id"], 3).collect_vec():
        print(f"  doc {r.doc_id}: avg_logprob={r.avg_logprob}")

    print(f"== first {num_merges} learned BPE merges ==")
    merges = docs.bpe_train("text", num_merges=num_merges).df.collect()
    for m in merges:
        print(f"  #{m.rank}: '{m.left}' + '{m.right}' (count {m.pair_count})")
    seg = docs.bpe_segment("text", merges)
    sample = seg.df.select("doc_id", F.slice("bpe_tokens", 1, 8).alias("head")) \
        .orderBy("doc_id").limit(2).collect()
    for r in sample:
        print(f"  doc {r.doc_id} tokens: {list(r.head)}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
