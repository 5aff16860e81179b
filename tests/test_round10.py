# Round-10 regression tests: the ADVICE r9 fixes + the unified
# auto-dial staged probe (VERDICT r9 #2).
#
# 1. _staged_probe: every count/width auto-dial (dedup_phash,
#    dedup_embedding_ivf, mine_contrastive_pairs, diversity_sample,
#    ann_index_build) stages the narrow input relation BEFORE probing,
#    so a decode-fed call runs the codec ONCE — counted executor-side
#    through a file-appending codec.
# 2. _staged_probe releases the cache when the probe raises.
# 3. sql_corpus_report validates phash_bits against fs_exprs and
#    treats an all-NULL fs row as UNDECODED (m=0, ph NULL), mirroring
#    the Python side's isNotNull & size>0 guard.

import os

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #
# decode-once: auto-dialed calls over a decode stage
# ------------------------------------------------------------------ #

def _counting_codec(path):
    from renoir_spark import multimodal

    def codec(data, n_features=None):
        # one appended line per decoded row, across all worker
        # processes (O_APPEND short-line writes)
        with open(path, "a") as f:
            f.write("1\n")
        return multimodal._decode_image(
            bytes(data), n_features=n_features or 8
        )

    return codec


def _decoded_docs(ctx, n=60):
    df = ctx.spark.createDataFrame(
        [(i, ("doc %d " % i) * 3) for i in range(n)],
        "doc_id long, text string",
    ).withColumn(
        "content", F.encode(F.col("text"), "UTF-8")
    )
    return ctx.from_df(df).decode_image(n_features=8)


def _decode_count(path):
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return sum(1 for _ in f)


def test_diversity_sample_autodial_decodes_once(ctx, tmp_path):
    from renoir_spark import multimodal

    cnt = str(tmp_path / "decodes_dvs.log")
    try:
        multimodal.register_codec("image", _counting_codec(cnt))
        s = _decoded_docs(ctx, 60)
        out = s.diversity_sample(
            vec_col="image_features", id_col="doc_id",
            n_cells=None, per_cell=5,
        ).collect_vec()
        assert len(out) > 0
        # count dial + seed collect + assignment + quota window all
        # read the staged narrow relation: exactly one codec pass
        assert _decode_count(cnt) == 60
    finally:
        multimodal.reset_codecs()


def test_contrastive_autodial_decodes_once(ctx, tmp_path):
    from renoir_spark import multimodal

    cnt = str(tmp_path / "decodes_mcp.log")
    try:
        multimodal.register_codec("image", _counting_codec(cnt))
        s = _decoded_docs(ctx, 60)
        out = s.mine_contrastive_pairs(
            vec_col="image_features", id_col="doc_id",
            n_cells=None, target_cell_size=20,
        ).collect_vec()
        assert isinstance(out, list)
        assert _decode_count(cnt) == 60
    finally:
        multimodal.reset_codecs()


def test_ann_index_build_autodial_decodes_once(ctx, tmp_path):
    from renoir_spark import multimodal
    from renoir_spark.ann_index import ann_index_build

    cnt = str(tmp_path / "decodes_idx.log")
    try:
        multimodal.register_codec("image", _counting_codec(cnt))
        s = _decoded_docs(ctx, 60)
        idx = ann_index_build(
            s, str(tmp_path / "idx"),
            vec_col="image_features", id_col="doc_id", n_cells=None,
            dim=8,
        )
        assert idx.meta["n_cells"] >= 1
        # dial count + seed + SQ8 stats + codes write: one codec pass
        assert _decode_count(cnt) == 60
    finally:
        multimodal.reset_codecs()


# ------------------------------------------------------------------ #
# _staged_probe: cache released on probe failure
# ------------------------------------------------------------------ #

def test_staged_probe_unpersists_on_failure(spark):
    from renoir_spark.datapipe import _staged_probe

    narrow = spark.range(10).select(F.col("id"))

    class Boom(RuntimeError):
        pass

    holder = {}

    def probe(d):
        holder["staged"] = d
        raise Boom("dial validation failed")

    with pytest.raises(Boom):
        _staged_probe(narrow, probe)
    assert holder["staged"].storageLevel.useMemory is False


def test_dedup_phash_width_error_releases_cache(ctx):
    # the width-check ValueError rides the same release path
    df = ctx.spark.createDataFrame(
        [(1, [0.5, 0.7]), (2, [0.1, 0.9])],
        "id long, features array<float>",
    )
    with pytest.raises(ValueError, match="narrowest codec emits 2"):
        ctx.from_df(df).dedup_phash("features", "id", bands=4)


# ------------------------------------------------------------------ #
# sql_corpus_report: phash_bits validation + all-NULL fs = undecoded
# ------------------------------------------------------------------ #

def test_sql_corpus_report_validates_phash_bits():
    from renoir_spark.prep import sql_corpus_report

    fs = ["0.5", "0.25", "0.75", "0.125"]
    with pytest.raises(ValueError, match="phash_bits=0"):
        sql_corpus_report("documents", "doc_id", "text",
                          fs_exprs=fs, phash_bits=0)
    with pytest.raises(ValueError, match="phash_bits=5"):
        sql_corpus_report("documents", "doc_id", "text",
                          fs_exprs=fs, phash_bits=5)
    # in-range passes
    assert "mstats" in sql_corpus_report(
        "documents", "doc_id", "text", fs_exprs=fs, phash_bits=4
    )


def test_corpus_report_all_null_fs_parity(ctx):
    """A codec that models decode FAILURE as NULL features must agree
    between the Python card (NULL array -> undecoded) and the SQL
    mirror (all-NULL fs elements -> undecoded)."""
    import duckdb

    from renoir_spark.prep import sql_corpus_report

    n = 10
    rows = [(i, "sample text %d here" % i) for i in range(n)]
    df = ctx.spark.createDataFrame(rows, "doc_id long, text string")
    feats = F.when(
        F.col("doc_id") % 2 == 0,
        F.array(*[
            ((F.col("doc_id") * (j + 1)) % 5).cast("float")
            for j in range(4)
        ]),
    )
    card = {
        r["metric"]: r["value"]
        for r in ctx.from_df(df.withColumn("features", feats))
        .corpus_report("doc_id", "text", features_col="features",
                       phash_bits=4)
        .df.collect()
    }

    values = ", ".join("(%d, 'sample text %d here')" % (i, i)
                       for i in range(n))
    fs = [
        f"CASE WHEN doc_id % 2 = 0 THEN ((doc_id * {j + 1}) % 5) "
        "ELSE NULL END"
        for j in range(4)
    ]
    sql = sql_corpus_report(
        f"(SELECT * FROM (VALUES {values}) t(doc_id, text))",
        "doc_id", "text", fs_exprs=fs, phash_bits=4,
    )
    oracle = {m: v for m, v in duckdb.sql(sql).fetchall()}

    assert card["media_decoded_rate"] == pytest.approx(0.5)
    assert oracle["media_decoded_rate"] == pytest.approx(
        card["media_decoded_rate"])
    assert oracle["phash_dup_rate"] == pytest.approx(
        card["phash_dup_rate"])
