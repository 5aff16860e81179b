"""Similarity search over an embedding corpus — every `ann_cosine`
method on one dataset, showing the accuracy/cost ladder a 100 TB
deployment climbs:

  brute    exact baseline — queries broadcast over the full fp32 corpus
  lsh      sign-plane buckets — sub-scan candidate generation
  ivf      Voronoi cells — search nprobe/n_cells of the corpus
  sq8      full scan of 8-bit codes (4x fewer bytes) + exact rerank
  ivf_sq8  cells bound search volume AND codes bound scan bytes

No reference analog — the similarity-search family is part of the
beyond-renoir training-data layer (SURVEY.md §2.13); recall/cost sweeps
in tools/recall_harness.py, sizing guidance in docs/SCALING.md.

Usage: python examples/similarity_search.py <sf_dir> [k]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from renoir_spark import StreamContext


def main(sf_dir: str, k: int = 3) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    corpus = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.filter("vec_id < 3")

    exact = {}
    for method, kw in [
        ("brute", {}),
        ("lsh", {"n_planes": 6, "n_tables": 8}),
        ("ivf", {"n_cells": 16, "nprobe": 4}),
        ("sq8", {"rerank": 4 * k}),
        ("ivf_sq8", {"n_cells": 16, "nprobe": 4, "rerank": 4 * k}),
    ]:
        rows = corpus.ann_cosine(queries, method=method, k=k, **kw).collect_vec()
        got = {}
        for r in rows:
            got.setdefault(r.qid, []).append((r.rank, r.vec_id, r.cos))
        if method == "brute":
            exact = {q: {v for _, v, _ in nb} for q, nb in got.items()}
        hits = sum(
            len({v for _, v, _ in nb} & exact.get(q, set())) for q, nb in got.items()
        )
        denom = max(1, sum(len(nb) for nb in exact.values()))
        print(f"== {method} (recall@{k} vs brute: {hits / denom:.2f}) ==")
        for q in sorted(got)[:2]:
            nbs = ", ".join(
                f"{v}({c:.4f})" for _, v, c in sorted(got[q])
            )
            print(f"  query {q}: {nbs}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3)
