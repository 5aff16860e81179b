"""Round-4 self-review regression tests: fold_py exact-value contract
through the Arrow path, running_sum NULL-key carries and native sum
types, push_file's atomic cross-filesystem fallback, and the
longest_duplicate_span NULL-text oracle parity."""

import duckdb
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #
# fold_py: closures must see exact Python values (None, big ints),
# never pandas' NaN/float64 coercion
# ------------------------------------------------------------------ #

def test_fold_py_nullable_long_stays_none(ctx, spark):
    s = ctx.from_df(spark.createDataFrame([(1,), (None,), (3,)], "id long"))
    seen = s.fold_py(
        [], lambda a, r: a + [r.id], lambda a, b: a + b
    )
    assert sorted(x for x in seen if x is not None) == [1, 3]
    assert None in seen
    total = s.fold_py(0, lambda a, r: a + (r.id or 0), lambda a, b: a + b)
    assert total == 4 and isinstance(total, int)


def test_fold_py_big_long_exact(ctx, spark):
    big = 2**60 + 7
    s = ctx.from_df(spark.createDataFrame([(big,), (1,)], "id long"))
    assert s.fold_py(0, lambda a, r: a + r.id, lambda a, b: a + b) == big + 1


# ------------------------------------------------------------------ #
# running_sum: NULL keys carry across range chunks; long sums stay long
# ------------------------------------------------------------------ #

def test_running_sum_null_key_carries_across_chunks(ctx, spark):
    rows = [(None if i % 2 == 0 else 1, i, 1.0) for i in range(400)]
    s = ctx.from_df(
        spark.createDataFrame(rows, "k int, o long, v double")
    ).key_by("k")
    chunked = {(r.k, r.o): r.cum
               for r in s.running_sum("o", partitions=8,
                                      cum=F.col("v")).collect_vec()}
    window = {(r.k, r.o): r.cum
              for r in s.running_sum("o", skew_proof=False,
                                     cum=F.col("v")).collect_vec()}
    assert chunked == window
    assert max(v for (k, _), v in chunked.items() if k is None) == 200.0


def test_running_sum_long_dtype_exact(ctx, spark):
    big = 2**54 + 1
    s = ctx.from_df(
        spark.createDataFrame([(1, 1, big), (1, 2, 2)], "k int, o long, v long")
    ).key_by("k")
    out = s.running_sum("o", partitions=4, cum=F.col("v")).df
    assert dict(out.dtypes)["cum"] == "bigint"
    assert {r.o: r.cum for r in out.collect()} == {1: big, 2: big + 2}


# ------------------------------------------------------------------ #
# push_file: cross-filesystem fallback lands atomically (temp + rename)
# ------------------------------------------------------------------ #

def test_push_file_copy_fallback_is_atomic(ctx, spark, tmp_path, monkeypatch):
    import os

    src_dir = tmp_path / "src"
    spark.range(5).coalesce(1).write.parquet(str(src_dir))
    part = next(p for p in os.listdir(src_dir) if p.startswith("part-"))

    ch = ctx.stream_channel("id long")
    renamed = []
    real_rename = os.rename

    def _rename(a, b):
        renamed.append((os.path.basename(a), os.path.basename(b)))
        return real_rename(a, b)

    def _no_link(a, b):
        raise OSError("cross-device link")

    monkeypatch.setattr(os, "link", _no_link)
    monkeypatch.setattr(os, "rename", _rename)
    ch.push_file(str(src_dir / part))
    # the copy went to a dot-prefixed temp (invisible to Spark's file
    # listing) and reached its final name via rename
    assert renamed and renamed[0][0].startswith(".")
    assert not renamed[0][1].startswith(".")
    monkeypatch.undo()
    assert ctx.stream_parquet(ch.directory).collect_count() == 5


# ------------------------------------------------------------------ #
# longest_duplicate_span: NULL text agrees with the oracle (n_tokens 0)
# ------------------------------------------------------------------ #

def test_longest_dup_span_null_text_matches_oracle(ctx, spark, tmp_path):
    from renoir_spark.datapipe import sql_longest_duplicate_span

    pq = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, None), (3, "x y")],
        "doc_id long, text string",
    ).write.parquet(pq)
    s = ctx.stream_parquet(pq)
    got = {
        r.doc_id: (r.n_tokens, r.dup_span_len, r.dup_span_frac)
        for r in s.longest_duplicate_span("text", "doc_id",
                                          n_groups=2).collect_vec()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    sql = sql_longest_duplicate_span("docs", "text", "doc_id", n_groups=2)
    exp = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == exp
    assert got[2] == (0, 0, 0.0)


# ------------------------------------------------------------------ #
# correctness persists survive CHAINING: zip(...).map(...).unpersist()
# must release the internal handles (previously stranded on the
# discarded intermediate Stream)
# ------------------------------------------------------------------ #

def test_zip_chain_unpersist_releases_internal_persists(ctx, spark):
    a = ctx.stream_iter([(i,) for i in range(10)], "x long")
    b = ctx.stream_iter([(i * 2,) for i in range(10)], "y long")
    z = a.zip(b, order=["x"], other_order=["y"]).map("x", "y")
    assert z.collect_count() == 10
    assert len(z._retained) >= 1
    assert all(d.is_cached for d in z._retained)
    z.unpersist(blocking=True)
    assert z._retained == []


def test_running_sum_chain_through_keyed_releases(ctx, spark):
    s = ctx.from_df(
        spark.createDataFrame([(1, i, 1.0) for i in range(20)],
                              "k int, o long, v double")
    )
    out = s.key_by("k").running_sum("o", partitions=2, cum=F.col("v")) \
        .map("k", "o", "cum")
    assert out.collect_count() == 20
    assert len(out._retained) >= 1
    out.unpersist(blocking=True)
    assert out._retained == []
