"""Semantic curation pipeline — the round-5 operator family end to end:

    sub-document dedup (exact CONTAINMENT join: drop excerpts swallowed
    by longer documents)
    → content-defined chunk dedup (CDC boundaries survive insertions)
    → fill-in-the-middle transform on a deterministic fraction
      (code-infill training format)
    and, on the embedding side:
    → cluster-balanced diversity sample (per-IVF-cell quota)
    → incremental SEMANTIC dedup loop against a persisted ANN index
      (dedup the increment, append the survivors)

Every stage is oracle-verified in the suite (qa26-qa30, qa06/qa28),
and the composed pipelines themselves are oracle-checked end to end
(qa31 = the text side, qa32 = the embedding side); this script wires
them into the curation shape a corpus refresh runs.

Usage: python examples/semantic_curation.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(sf_dir: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )

    # 1) drop documents mostly CONTAINED in a longer one (quote farms,
    #    aggregator reposts) — keep the container, drop the contained
    contained = (
        docs.containment_pairs_exact("text", "doc_id", shingle_n=5,
                                     threshold=0.9)
        .map(F.col("inner_id").alias("doc_id"))
        .df.distinct()
    )
    standalone = ctx.from_df(docs.df.join(contained, "doc_id", "left_anti"))
    print(f"containment: {docs.df.count()} docs -> "
          f"{standalone.df.count()} standalone")

    # 2) CDC chunk dedup: boilerplate repeated across pages goes, and a
    #    one-word edit upstream cannot hide a duplicated body
    deduped = standalone.chunk_dedup_cdc("doc_id", "text", divisor=32)
    dropped = deduped.df.agg(F.sum("n_dropped")).first()[0]
    print(f"cdc chunks dropped: {dropped}")

    # 3) FIM on half the surviving docs (code-infill training format)
    fim = ctx.from_df(
        deduped.df.withColumnRenamed("clean_text", "text")
    ).fim_transform("doc_id", "text", rate=0.5)
    n_fim = fim.df.filter(F.col("fim_text") != F.col("text")).count()
    print(f"fim-transformed: {n_fim}")

    # 4) embedding side: diversity quota, then the semantic ingest loop
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").map(
        "vec_id", "embedding"
    )
    picks = emb.diversity_sample(n_cells=8, per_cell=4)
    print(f"diversity sample: {picks.df.count()} rows "
          f"across {picks.df.select('cell').distinct().count()} cells")

    corpus = emb.filter("vec_id % 2 = 0")
    increment = emb.filter("vec_id % 2 = 1")
    idx_path = os.path.join(tempfile.mkdtemp(prefix="semcur_"), "ann_idx")
    # default build = the sqrt-N auto-dialed cell count (scale-safe);
    # pin n_cells only when an external mirror needs fixed centroids
    corpus.ann_index_build(idx_path)
    idx = ctx.ann_index(idx_path)
    survivors = idx.dedup_batch(increment, threshold=0.95, nprobe=3)
    n_new = survivors.df.count()
    idx.append(survivors)
    st = idx.stats()
    print(f"semantic ingest: {increment.df.count()} incoming -> "
          f"{n_new} appended; index now {st['vectors']} vectors "
          f"across {st['cells']} cells")

    # 5) index maintenance: the drift block of stats() is the rebuild
    #    trigger — appended rows' fit against the FROZEN build-time
    #    centroids vs the build corpus's own fit. Near 1 = appends
    #    still match the index geometry; a climbing ratio says the
    #    accumulated appends shifted the distribution, and rebuild()
    #    retrains (hash-sampled re-seed + grid re-fit + cell re-dial).
    ratio = st["drift"]["mean_ratio"]
    print(f"drift mean_ratio after ingest: {ratio}")
    if ratio is not None and ratio > 3.0:  # the nightly-loop policy dial
        idx = idx.rebuild()
        print(f"rebuilt: {idx.meta['n_cells']} cells, drift baseline reset")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
