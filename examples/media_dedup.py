"""Multimodal ingest hygiene — the media half of a training-data
pipeline (the round-8 layer, suite queries q51 + qa44/qa46/qa47):

    raw blobs (here: text bytes standing in for image files)
    → pack_binary: small-file storm → one splittable parquet relation
    → decode_image(n_features=48): Arrow-batched decode; the fake codec
      in this container, a real PIL/DCT codec via register_codec in
      production — the dataflow is identical either way
    → dedup_phash: perceptual-hash near-dup dedup WITHIN the corpus
      (bit j = feature_j ≥ mean; banded Hamming buckets, never
      all-pairs)
    → dedup_phash_against: decontaminate vs a held-out benchmark set
      (one broadcast array of 8-byte signatures, zero corpus shuffles)
    → phash_index_build + nightly increments: each new batch dedups
      against corpus + ALL prior increments without re-decoding
      anything, then appends its survivors

Every stage is oracle-verified in the suite; this script wires them
into the ingest shape a multimodal-corpus team runs per crawl drop.

Usage: python examples/media_dedup.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from renoir_spark import StreamContext


def decoded_media(docs):
    """blob column + decode — the plumbing every later stage shares."""
    return (
        docs.map(
            doc_id=F.col("doc_id"),
            path=F.concat(F.lit("img/"), F.col("doc_id").cast("string")),
            content=F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"),
        )
        .pack_binary(path_col="path", content_col="content")
        .map("path", "content",
             doc_id=F.regexp_extract("path", r"img/(\d+)", 1).cast("long"))
        .shuffle()
        .decode_image(n_features=48)
    )


def main(sf_dir: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )

    corpus = decoded_media(docs.filter("doc_id % 5 > 1"))
    n0 = corpus.df.count()

    # 1. within-corpus near-dup dedup (48-bit signatures, 12-bit bands)
    # bucket_cap is the round-9 flood insurance: constant bands
    # (letterbox black frames, codec defaults) form over-crowded,
    # non-discriminative buckets — the df-cutoff drops them whole,
    # with the documented miss rule (a pair is lost only if EVERY
    # shared band bucket is over the cap)
    unique = corpus.dedup_phash("image_features", "doc_id",
                                bucket_cap=256)
    n1 = unique.df.count()
    print(f"corpus {n0} items → {n1} after perceptual-hash dedup")

    # 2. benchmark decontamination: every 23rd doc plays the eval image
    bench = decoded_media(docs.filter("doc_id % 23 = 0"))
    clean = unique.dedup_phash_against(bench, "image_features")
    n2 = clean.df.count()
    print(f"→ {n2} after decontamination vs {bench.df.count()} eval items")

    # 3. persist the index once, then ingest increments incrementally.
    # Each crawl drop is half genuinely-new blobs, half re-downloads of
    # already-indexed content under fresh ids (byte-identical blobs →
    # identical signatures; with a REAL codec, re-encodes and slight
    # crops land within the Hamming budget the same way)
    path = os.path.join(tempfile.mkdtemp(prefix="media_idx_"), "idx")
    idx = clean.phash_index_build(path, id_col="doc_id", bits=48,
                                  bucket_dirs=16)
    for day, pred in enumerate(("doc_id % 5 = 0", "doc_id % 5 = 1")):
        fresh = docs.filter(pred)
        redownload = docs.filter("doc_id % 5 > 1 AND doc_id % 7 = 3").map(
            doc_id=F.col("doc_id") + 1_000_000 * (day + 1), text=F.col("text")
        )
        batch = decoded_media(fresh.merge(redownload))
        survivors = idx.dedup_batch(batch)
        idx.append(survivors)
        print(
            f"increment {day}: {batch.df.count()} arrived, "
            f"{survivors.df.count()} survived → index now "
            f"{idx.stats()['items']} items"
        )
    idx.compact()
    print("index compacted:", idx.stats())

    # 4. the release card, media rows included (round 9): decoded-
    # evidence coverage and the Hamming-0 signature dup rate ride the
    # same single aggregate pass as the text hygiene numbers
    card = clean.map(
        doc_id=F.col("doc_id"),
        text=F.decode(F.col("content"), "UTF-8"),
        image_features=F.col("image_features"),
    ).corpus_report(
        "doc_id", "text", features_col="image_features", phash_bits=48
    )
    for r in sorted(card.collect_vec(), key=lambda r: r.metric):
        print(f"  card {r.metric} = {r.value}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
