"""Incremental corpus ingest — the production refresh loop for a
continuously-growing training corpus:

    build a persisted MinHash-LSH dedup index over the existing corpus
    → for each incoming increment:
        classifier gate (in-engine Naive Bayes, trained on labeled docs)
        → dedup against corpus + all PRIOR increments (index probe
          under a literal partition filter — corpus text never
          re-shingled)
        → DSIR-select the target-domain-like survivors
        → append the kept docs to the index so the NEXT increment
          sees them

Every stage is deterministic and oracle-verified elsewhere (suite
queries qa07-qa10); this script wires them into the loop shape a real
ingest pipeline runs nightly.

Usage: python examples/incremental_ingest.py [sf_dir] [n_increments]
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from renoir_spark import StreamContext


def main(sf_dir: str, n_increments: int = 2) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet")

    # existing corpus = docs not in any increment; increments arrive as
    # equal slices of the held-out remainder
    corpus = docs.filter(f"doc_id % {n_increments + 1} = 0")
    target = corpus.filter("lang = 'en'")  # the domain we select toward

    idx_path = os.path.join(tempfile.mkdtemp(prefix="ingest_"), "dedup_idx")
    corpus.dedup_index_build(idx_path, text_col="text", id_col="doc_id",
                             bucket_dirs=16)
    idx = ctx.dedup_index(idx_path)

    for inc in range(1, n_increments + 1):
        batch = docs.filter(f"doc_id % {n_increments + 1} = {inc}")
        n_in = batch.collect_count()

        # 1. classifier gate: keep docs whose predicted class is a
        #    language we train on (labels come from the indexed corpus)
        gated_ids = (
            batch.nb_classify(corpus, "text", "doc_id", "lang",
                              n_buckets=1024)
            .filter("pred IN ('en', 'de', 'fr')")
            .map("doc_id")
        )
        gated = batch.join(gated_ids, "doc_id")

        # 2. incremental dedup: against corpus AND prior survivors
        unique = idx.dedup_batch(gated, threshold=0.7)

        # 3. target-domain selection (DSIR, exact budget per increment)
        kept = unique.dsir_select(target, "text", "doc_id", k=50,
                                  n_buckets=1024, salt=f"inc{inc}")

        # 4. the kept docs become part of the reference for increment+1
        idx.append(kept)
        print(f"increment {inc}: {n_in} in -> {gated.collect_count()} "
              f"gated -> {unique.collect_count()} unique -> "
              f"{kept.collect_count()} kept")

    shutil.rmtree(os.path.dirname(idx_path))


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(sf, n)
