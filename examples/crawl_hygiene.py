"""Web-crawl front door: the URL + selection stages that run BEFORE
content-level hygiene (examples/data_prep_pipeline.py picks up where
this leaves off):

    URL blocklist filter → canonical-URL dedup → quantile-band length
    selection → greedy token-budget fill

URL canonicalization and the blocklist checks are pure map-side
expressions (they fuse into the scan); the only wide stages are the
canonical-URL hash-agg, the 1-row quantile broadcast, and the chunked
prefix scan of the budget fill — no stage shuffles document text more
than once.

Usage: python examples/crawl_hygiene.py [documents.parquet]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(path: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)

    # crawl rows: synthesize a URL per document (three raw spellings of
    # the same page, like a real frontier emits) + a token count
    page = (F.col("doc_id") % 50).cast("string")
    crawl = ctx.stream_parquet(path).token_count("text").map(
        "doc_id",
        "text",
        url=F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("HTTPS://WWW."), F.col("source"),
                     F.lit(".example.com/p/"), page, F.lit("/?utm_source=f")),
        ).when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("https://"), F.col("source"),
                     F.lit(".example.com:443/p/"), page, F.lit("#top")),
        ).otherwise(
            F.concat(F.lit("https://ads."), F.col("source"),
                     F.lit(".example.com/p/"), page),
        ),
        ntok=F.col("tok_ws"),  # the engine's token counter
    )

    # 1. blocklist: drop ad subdomains + tracking-session pages
    vetted = crawl.filter_urls(
        "url",
        block_patterns=[r"^https?://ads\.", r"[?&]session_id="],
    )

    # 2. canonical-URL dedup: the three spellings collapse to one page
    pages = vetted.dedup_url("doc_id", "url")
    survivors = pages.map("doc_id").join(vetted, "doc_id")

    # 3. keep the middle of the length distribution (CCNet move)
    banded = survivors.map(
        "doc_id", "ntok", score=F.col("ntok").cast("double")
    ).filter_by_score_quantile("score", 0.1, 0.9)

    # 4. fill a token budget, longest-first
    order = F.struct((-F.col("ntok")).alias("p"), F.col("doc_id").alias("t"))
    final = banded.take_token_budget("ntok", 5000, order=order)

    rows = final.map("doc_id", "ntok", "cum_tokens").collect_vec()
    total = max((r.cum_tokens for r in rows), default=0)
    print(f"crawl rows      : {crawl.df.count()}")
    print(f"after blocklist : {vetted.df.count()}")
    print(f"unique pages    : {pages.df.count()}")
    print(f"in length band  : {banded.df.count()}")
    print(f"budget selected : {len(rows)} docs, {total} tokens (cap 5000)")
    assert total <= 5000


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "/root/testdata/sf0.001/documents.parquet")
