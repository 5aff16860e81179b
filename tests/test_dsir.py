"""DSIR importance resampling (prep.dsir_weights / dsir_select):
behavioral edges. Bit-exact oracle parity is tests/test_oracle.py
(qa09) plus the differential empty/nulls/unicode gates."""

import pytest
from pyspark.sql import functions as F


def _docs(ctx, spark, rows):
    return ctx.from_df(
        spark.createDataFrame(rows, "doc_id long, text string, dom string")
    )


ROWS = [
    (1, "machine learning models train on curated data", "target"),
    (2, "machine learning data selection importance resampling", "target"),
    (3, "cooking pasta with tomato sauce and basil", "other"),
    (4, "football season results and match highlights", "other"),
    (5, "training data curation with machine learning pipelines", "mixed"),
]


def test_weights_favor_target_like_docs(ctx, spark):
    s = _docs(ctx, spark, ROWS)
    target = s.filter("dom = 'target'")
    w = {r.doc_id: r.dsir_logw
         for r in s.dsir_weights(target, "text", "doc_id",
                                 n_buckets=512).df.collect()}
    assert len(w) == 5
    # the ML-flavored doc 5 must outscore both off-domain docs
    assert w[5] > w[3] and w[5] > w[4]


def test_select_is_deterministic_and_exact_k(ctx, spark):
    s = _docs(ctx, spark, ROWS)
    target = s.filter("dom = 'target'")
    a = sorted(r.doc_id for r in
               s.dsir_select(target, "text", "doc_id", 3,
                             n_buckets=512).df.collect())
    b = sorted(r.doc_id for r in
               s.repartition_by(5, "doc_id")
               .dsir_select(target, "text", "doc_id", 3,
                            n_buckets=512).df.collect())
    assert len(a) == 3 and a == b  # layout-independent (salted id hash)


def test_salt_changes_draw_not_weights(ctx, spark):
    # equal-weight candidates (identical text) — the Gumbel draw alone
    # decides, so different salts must pick different subsets
    rows = [(i, "identical filler content for every candidate", "x")
            for i in range(1, 13)]
    s = _docs(ctx, spark, rows)
    target = s.filter("doc_id <= 2")
    sels = [
        tuple(sorted(r.doc_id for r in
                     s.dsir_select(target, "text", "doc_id", 4,
                                   n_buckets=512, salt=f"s{i}")
                     .df.collect()))
        for i in range(6)
    ]
    assert all(len(t) == 4 for t in sels)
    assert len(set(sels)) > 1  # the Gumbel draw actually varies


def test_empty_target_is_uniform_smoothing(ctx, spark):
    s = _docs(ctx, spark, ROWS)
    target = s.filter("doc_id < 0")
    w = s.dsir_weights(target, "text", "doc_id", n_buckets=512).df
    assert w.count() == 5  # defined (pure smoothing), no crash


def test_null_and_empty_text_omitted(ctx, spark):
    rows = ROWS + [(6, None, "x")]
    s = ctx.from_df(
        spark.createDataFrame(rows, "doc_id long, text string, dom string")
    )
    target = s.filter("dom = 'target'")
    ids = {r.doc_id for r in
           s.dsir_weights(target, "text", "doc_id",
                          n_buckets=512).df.collect()}
    assert 6 not in ids and ids == {1, 2, 3, 4, 5}


def test_unigram_only_mode(ctx, spark):
    s = _docs(ctx, spark, ROWS)
    target = s.filter("dom = 'target'")
    w = s.dsir_weights(target, "text", "doc_id", n_buckets=512, ngram=1).df
    assert w.count() == 5

    import duckdb

    from renoir_spark.prep import sql_dsir_weights

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, dom VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", ROWS)
    want = sorted(con.execute(sql_dsir_weights(
        "d", "(SELECT * FROM d WHERE dom = 'target')", "text", "doc_id",
        n_buckets=512, ngram=1)).fetchall())
    got = sorted((r.doc_id, r.dsir_logw) for r in w.collect())
    assert got == want


def test_model_is_broadcast_not_shuffled(ctx, spark):
    """The ≤ n_buckets model must reach the per-doc scoring join as a
    broadcast — a sort-merge shuffle of the corpus against a 512-row
    build side would be the wrong plan at any scale."""
    s = _docs(ctx, spark, ROWS)
    target = s.filter("dom = 'target'")
    df = s.dsir_weights(target, "text", "doc_id", n_buckets=512).df
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_short_docs_contribute_unigrams_only(ctx, spark):
    """One-word documents must flow through ngram=2 featurization (an
    unguarded sequence/element_at chain aborts the job on them) and
    agree with the SQL mirror's CASE-guarded gram list."""
    rows = ROWS + [(7, "hello", "other"), (8, " ", "other")]
    s = ctx.from_df(
        spark.createDataFrame(rows, "doc_id long, text string, dom string")
    )
    target = s.filter("dom = 'target'")
    got = sorted((r.doc_id, r.dsir_logw) for r in
                 s.dsir_weights(target, "text", "doc_id",
                                n_buckets=512).df.collect())

    import duckdb

    from renoir_spark.prep import sql_dsir_weights

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, dom VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    want = sorted(con.execute(sql_dsir_weights(
        "d", "(SELECT * FROM d WHERE dom = 'target')", "text",
        "doc_id", n_buckets=512)).fetchall())
    assert got == want
    assert 7 in {g[0] for g in got}  # the one-word doc IS scored


def test_target_without_id_column(ctx, spark):
    """An external reference corpus used as target needs only its text
    column — the target side feeds a bucket distribution, never ids."""
    s = _docs(ctx, spark, ROWS)
    ref = ctx.from_df(spark.createDataFrame(
        [("machine learning text",), ("importance resampling notes",)],
        "content string",
    ))
    w = s.dsir_weights(ref, "text", "doc_id", n_buckets=512,
                       target_text_col="content").df
    assert w.count() == 5
