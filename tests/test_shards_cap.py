"""Round-4 additions: corpus-frequency boilerplate removal
(drop_common_chunks), per-domain caps (cap_per_group), and
token-balanced training shards (shard_by_tokens / write_training_shards).

Oracle parity at corpus scale is covered by test_oracle.py (qa13-qa15);
these tests pin the operator SEMANTICS on constructed inputs (every copy
of boilerplate dropped — not first-kept; caps deterministic under
re-partitioning; serpentine balance bound; shard write round trip)."""

import pytest
from pyspark.sql import functions as F

from renoir_spark import prep

SF = "/root/testdata/sf0.001"


def _stream(ctx, rows, schema):
    return ctx.from_df(ctx.spark.createDataFrame(rows, schema))


# --------------------------------------------------------------------- #
# drop_common_chunks
# --------------------------------------------------------------------- #

BANNER = "a b c d"          # 4-word boilerplate chunk (chunk_words=4)
BODY = ["w x y z", "p q r s", "m n o t"]


def _boiler_docs(ctx):
    rows = [(i, f"{BANNER} {BODY[i]}") for i in range(3)]
    return _stream(ctx, rows, "doc_id long, text string")


def test_boilerplate_drops_every_copy(ctx):
    out = prep.drop_common_chunks(
        _boiler_docs(ctx), "doc_id", "text", chunk_words=4, max_df=2
    ).df.orderBy("doc_id").collect()
    assert [r.clean_text for r in out] == BODY  # banner gone from ALL docs
    assert all(r.n_dropped == 1 and r.n_chunks == 2 for r in out)


def test_boilerplate_vs_chunk_dedup_first_kept(ctx):
    """chunk_dedup keeps the banner's first occurrence; boilerplate
    removal keeps none — the two operators differ exactly there."""
    kept = prep.chunk_dedup(
        _boiler_docs(ctx), "doc_id", "text", chunk_words=4
    ).df.orderBy("doc_id").collect()
    assert kept[0].clean_text.startswith(BANNER)
    assert all(not r.clean_text.startswith(BANNER) for r in kept[1:])


def test_boilerplate_below_df_threshold_survives(ctx):
    out = prep.drop_common_chunks(
        _boiler_docs(ctx), "doc_id", "text", chunk_words=4, max_df=4
    ).df.collect()
    assert all(r.n_dropped == 0 for r in out)  # df=3 < 4 → all survive


def test_boilerplate_all_dropped_gives_empty_text(ctx):
    rows = [(0, BANNER), (1, BANNER), (2, BANNER)]
    out = prep.drop_common_chunks(
        _stream(ctx, rows, "doc_id long, text string"),
        "doc_id", "text", chunk_words=4, max_df=2,
    ).df.collect()
    assert all(r.clean_text == "" and r.n_dropped == 1 for r in out)


# --------------------------------------------------------------------- #
# cap_per_group
# --------------------------------------------------------------------- #

def test_cap_per_group_respects_cap_and_is_subset(ctx):
    docs = ctx.stream_parquet(f"{SF}/documents.parquet")
    out = prep.cap_per_group(docs, "doc_id", "source", 7).df
    sizes = out.groupBy("source").count().collect()
    assert sizes and all(r["count"] <= 7 for r in sizes)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.df.select("doc_id").collect()}
    assert ids <= all_ids


def test_cap_per_group_deterministic_across_layout(ctx):
    docs = ctx.stream_parquet(f"{SF}/documents.parquet")
    a = prep.cap_per_group(
        docs._new(docs.df.repartition(3)), "doc_id", "source", 5
    ).df.select("doc_id").collect()
    b = prep.cap_per_group(
        docs._new(docs.df.repartition(11)), "doc_id", "source", 5
    ).df.select("doc_id").collect()
    assert {r.doc_id for r in a} == {r.doc_id for r in b}


def test_cap_per_group_small_groups_untouched(ctx):
    rows = [(i, "g") for i in range(3)]
    out = prep.cap_per_group(
        _stream(ctx, rows, "doc_id long, source string"),
        "doc_id", "source", 10,
    ).df.count()
    assert out == 3


# --------------------------------------------------------------------- #
# shard_by_tokens / write_training_shards
# --------------------------------------------------------------------- #

def test_shard_assignment_partition_of_input(ctx):
    docs = ctx.stream_parquet(f"{SF}/documents.parquet")
    out = prep.shard_by_tokens(docs, "doc_id", "n_chars", 8)
    rows = out.df.select("doc_id", "shard").collect()
    out.unpersist()
    assert len(rows) == docs.df.count()          # every row, exactly once
    assert {r.shard for r in rows} == set(range(8))
    per = {}
    for r in rows:
        per[r.shard] = per.get(r.shard, 0) + 1
    assert max(per.values()) - min(per.values()) <= 1   # serpentine deal


def test_shard_token_balance_bound(ctx):
    docs = ctx.stream_parquet(f"{SF}/documents.parquet")
    out = prep.shard_by_tokens(docs, "doc_id", "n_chars", 8)
    sums = (
        out.df.groupBy("shard").agg(F.sum("n_chars").alias("s")).collect()
    )
    out.unpersist()
    max_w = docs.df.agg(F.max("n_chars")).first()[0]
    spread = max(r.s for r in sums) - min(r.s for r in sums)
    # serpentine on a desc-sorted deal: spread bounded by one block's
    # largest-minus-smallest, itself bounded by the largest single row
    assert spread <= max_w


def test_shard_deterministic_across_layout(ctx):
    docs = ctx.stream_parquet(f"{SF}/documents.parquet")
    a_s = prep.shard_by_tokens(
        docs._new(docs.df.repartition(3)), "doc_id", "n_chars", 4)
    b_s = prep.shard_by_tokens(
        docs._new(docs.df.repartition(13)), "doc_id", "n_chars", 4)
    a = {(r.doc_id, r.shard) for r in a_s.df.select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in b_s.df.select("doc_id", "shard").collect()}
    a_s.unpersist(); b_s.unpersist()
    assert a == b


def test_write_training_shards_roundtrip(ctx, tmp_path):
    docs = ctx.stream_parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "shards")
    manifest = prep.write_training_shards(
        docs, path, "doc_id", "n_chars", 4
    ).df.orderBy("shard").collect()
    assert [r.shard for r in manifest] == [0, 1, 2, 3]
    total = docs.df.agg(
        F.count(F.lit(1)), F.sum("n_chars")
    ).first()
    assert sum(r.n_docs for r in manifest) == total[0]
    assert sum(r.tok_sum for r in manifest) == total[1]
    # hive layout: one directory per shard, readable back
    back = ctx.spark.read.parquet(path)
    assert back.count() == total[0]
    assert back.select("shard").distinct().count() == 4
    # clustered write: each shard directory holds ONE data file
    import glob
    for s in range(4):
        files = glob.glob(f"{path}/shard={s}/*.parquet")
        assert len(files) == 1, files
