# Round-10 OPTIMIZATION regression tests: the changes are
# performance-only, so these pin the *mechanisms* (single-partition
# metadata writes, scale-adaptive compute spread, the dedup→append
# signature-reuse handshake) while the oracle suite pins that results
# never moved.

import glob

import pytest
from pyspark.sql import functions as F


def test_tiny_df_is_one_partition_and_roundtrips(ctx, tmp_path):
    from renoir_spark.util import tiny_df

    rows = [(i, [0.5] * 4) for i in range(16)]
    df = tiny_df(ctx.spark, rows, "cell long, unit array<double>")
    assert df.rdd.getNumPartitions() == 1
    out = str(tmp_path / "cells")
    df.write.mode("overwrite").parquet(out)
    # one task => one data file, at any core count
    assert len(glob.glob(out + "/part-*")) == 1
    back = ctx.spark.read.parquet(out)
    assert back.count() == 16
    # empty frames take the same path (hive-root resets)
    edf = tiny_df(ctx.spark, [], "id long, __bk long")
    assert edf.rdd.getNumPartitions() <= 1 or edf.count() == 0


def test_spread_for_compute_is_noop_when_already_wide(ctx):
    from renoir_spark.datapipe import _spread_for_compute

    target = ctx.spark.sparkContext.defaultParallelism
    # a 1-split scan shape (the real call-site case: one parquet file)
    narrow = ctx.spark.range(0, 1000, 1, 1)
    wide = ctx.spark.range(0, 1000, 1, max(target, 2))
    assert _spread_for_compute(narrow).rdd.getNumPartitions() >= target
    # already at/above parallelism: returned UNCHANGED (no new exchange)
    assert _spread_for_compute(wide) is wide


def test_cell_partitioned_width_caps_at_cells_and_conf(ctx):
    from renoir_spark.datapipe import _cell_partitioned

    df = ctx.spark.range(100).withColumn("c", F.col("id") % 5)
    sp = int(ctx.spark.conf.get("spark.sql.shuffle.partitions"))
    assert _cell_partitioned(df, "c", 3).rdd.getNumPartitions() == 3
    assert (
        _cell_partitioned(df, "c", 10 ** 6).rdd.getNumPartitions() == sp
    )


# ------------------------------------------------------------------ #
# dedup → append signature-reuse handshake
# ------------------------------------------------------------------ #

def _media_rows(ctx, ids):
    return ctx.from_df(
        ctx.spark.createDataFrame(
            [(i, "media item %d body" % (i % 7)) for i in ids],
            "doc_id long, text string",
        ).withColumn("content", F.encode("text", "UTF-8"))
    )


def test_phash_append_after_dedup_does_not_redecode(ctx, tmp_path):
    """The documented ingest loop (dedup_batch → append) must decode
    each increment exactly once: the append derives the survivors' sig
    from the cached batch sig instead of re-running the codec."""
    from renoir_spark import multimodal
    from renoir_spark.dedup_index import phash_index_load

    marker = str(tmp_path / "decodes.txt")

    def codec(data, n_features=None):
        with open(marker, "a") as f:
            f.write("1\n")
        return multimodal._decode_image_fake(
            bytes(data), n_features or 8
        )

    def n_decodes():
        try:
            with open(marker) as f:
                return sum(1 for _ in f)
        except OSError:
            return 0

    multimodal.register_codec("image", codec)
    try:
        corpus = _media_rows(ctx, range(20)).decode_image(n_features=16)
        # half novel content, half duplicating the corpus: the append
        # must band only the novel survivors — without re-decoding
        b1 = ctx.from_df(
            ctx.spark.createDataFrame(
                [(100 + i, "novel item %d body" % i) for i in range(15)]
                + [(200 + i, "media item %d body" % (i % 7))
                   for i in range(10)],
                "doc_id long, text string",
            ).withColumn("content", F.encode("text", "UTF-8"))
        ).decode_image(n_features=16)
        path = str(tmp_path / "pidx")
        corpus.phash_index_build(path, id_col="doc_id", bits=16,
                                 bands=4, bucket_dirs=4)
        idx = phash_index_load(ctx.spark, path)
        s1 = idx.dedup_batch(b1)
        n_surv = s1.df.count()
        assert 0 < n_surv < 25        # real drops AND real survivors
        n_after_dedup = n_decodes()
        idx.append(s1)
        assert n_decodes() == n_after_dedup, (
            "append re-ran the decode codec for the increment"
        )
        # and the appended postings are exactly the survivors'
        assert idx.stats()["items"] == 20 + n_surv
    finally:
        multimodal.reset_codecs()


def test_decode_image_columns_projection(ctx):
    """decode_image(columns=...) keeps ONLY the listed input columns
    plus every decoded field, and decodes identically to the default
    all-columns form."""
    df = ctx.spark.createDataFrame(
        [(i, "x%d" % i, ("blob %d" % i).encode()) for i in range(8)],
        "doc_id long, extra string, content binary",
    )
    full = ctx.from_df(df).decode_image(n_features=8)
    slim = ctx.from_df(df).decode_image(n_features=8,
                                        columns=["doc_id"])
    assert set(slim.df.columns) == {
        "doc_id", "image_width", "image_height", "image_channels",
        "image_format", "image_features",
    }
    a = sorted(
        (r["doc_id"], r["image_width"], tuple(r["image_features"]))
        for r in full.df.collect()
    )
    b = sorted(
        (r["doc_id"], r["image_width"], tuple(r["image_features"]))
        for r in slim.df.collect()
    )
    assert a == b


def test_sample_frames_columns_projection(ctx):
    """sample_frames(columns=...) keeps ONLY the listed input columns
    plus the frame fields, and samples identically to the default
    all-columns form."""
    df = ctx.spark.createDataFrame(
        [(i, "x%d" % i, ("vid %d" % i).encode()) for i in range(6)],
        "doc_id long, extra string, content binary",
    )
    full = ctx.from_df(df).sample_frames(num_frames=3)
    slim = ctx.from_df(df).sample_frames(num_frames=3, columns=["doc_id"])
    assert set(slim.df.columns) == {"doc_id", "frame_idx", "frame_features"}
    a = sorted(
        (r["doc_id"], r["frame_idx"], tuple(r["frame_features"]))
        for r in full.df.collect()
    )
    b = sorted(
        (r["doc_id"], r["frame_idx"], tuple(r["frame_features"]))
        for r in slim.df.collect()
    )
    assert a == b


def test_sq8_staging_releases_cache_on_unpersist(ctx):
    """The SQ8 family persists ONE narrow (id, vec) relation across its
    stats/encode/rerank passes; unpersist() must release it (the _retain
    contract), and results must match the DuckDB-mirrored shape of a
    fresh call."""
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(8)])
            for i in range(40)]
    emb = ctx.from_df(ctx.spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"))
    qs = ctx.from_df(ctx.spark.createDataFrame(
        rows[:3], "vec_id long, embedding array<double>"))
    jsc = ctx.spark.sparkContext._jsc.sc()
    n0 = jsc.getPersistentRDDs().size()
    out = emb.ann_cosine(qs, method="sq8", k=2, rerank=6, dim=8)
    got = sorted((r["qid"], r["rank"], r["vec_id"]) for r in out.df.collect())
    assert len(got) == 6 and len(out._retained) == 1
    assert jsc.getPersistentRDDs().size() == n0 + 1
    out.unpersist()
    assert out._retained == []
    assert jsc.getPersistentRDDs().size() == n0


def test_dedup_append_handshake_equals_recompute(ctx, tmp_path):
    """Appending survivors via the cached-sig handshake must leave the
    index byte-equivalent (same posting/shingle ROWS) to appending a
    handshake-stripped copy of the same survivors."""
    from renoir_spark.dedup_index import dedup_index_load

    docs = ctx.from_df(
        ctx.spark.createDataFrame(
            [(i, "handshake doc %d words body extra" % (i % 9))
             for i in range(45)],
            "doc_id long, text string",
        )
    )
    corpus = docs.filter("doc_id % 3 != 0")
    b1 = docs.filter("doc_id % 3 = 0")

    def run(strip_handshake, sub):
        path = str(tmp_path / sub)
        corpus.dedup_index_build(path, text_col="text",
                                 id_col="doc_id", bucket_dirs=4)
        idx = dedup_index_load(ctx.spark, path)
        s1 = idx.dedup_batch(b1, threshold=0.7)
        if strip_handshake:
            del s1._index_sig
        idx.append(s1)
        bk = idx._buckets_read()
        sh = idx._shingles_read()
        return (
            sorted(map(tuple, bk.select("bidx", "bhash", "id").collect())),
            sorted(
                (r["id"], tuple(sorted(r["sh"])))
                for r in sh.select("id", "sh").collect()
            ),
        )

    assert run(False, "with_hs") == run(True, "no_hs")
