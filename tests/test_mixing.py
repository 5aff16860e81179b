"""Edge semantics of the round-4 mixing/decontamination additions:
embedding-space decontamination (NULL vectors, empty references) and
fractional-epoch upsampling (exact-integer epochs, layout invariance,
negative guards)."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #
# decontaminate_embedding
# ------------------------------------------------------------------ #

def _emb_stream(ctx, spark, rows):
    return ctx.from_df(
        spark.createDataFrame(rows, "id long, v array<double>")
    )


def test_decontaminate_embedding_drops_similar_keeps_rest(ctx, spark):
    corpus = _emb_stream(ctx, spark, [
        (1, [1.0, 0.0]),      # identical to ref -> dropped
        (2, [0.9, 0.1]),      # cos ~0.994 -> dropped
        (3, [0.0, 1.0]),      # orthogonal -> kept
        (4, [-1.0, 0.0]),     # opposite -> kept
    ])
    refs = _emb_stream(ctx, spark, [(100, [1.0, 0.0])])
    out = corpus.decontaminate_embedding(refs, "v", threshold=0.9)
    assert sorted(r.id for r in out.df.collect()) == [3, 4]


def test_decontaminate_embedding_null_vec_kept(ctx, spark):
    # Spark EXISTS yields NULL for a NULL vector; without the coalesce
    # pin `~hit` silently drops the row while the SQL oracle's NOT
    # EXISTS keeps it. The operator pins "NULL vec = no match".
    corpus = _emb_stream(ctx, spark, [(1, None), (2, [1.0, 0.0])])
    refs = _emb_stream(ctx, spark, [(100, [1.0, 0.0])])
    out = corpus.decontaminate_embedding(refs, "v", threshold=0.5)
    assert sorted(r.id for r in out.df.collect()) == [1]


def test_decontaminate_embedding_empty_reference_keeps_all(ctx, spark):
    corpus = _emb_stream(ctx, spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    refs = _emb_stream(ctx, spark, [(100, [1.0, 0.0])]).filter("id < 0")
    out = corpus.decontaminate_embedding(refs, "v", threshold=0.1)
    assert sorted(r.id for r in out.df.collect()) == [1, 2]


def test_decontaminate_embedding_zero_vector_never_matches(ctx, spark):
    # zero-safe cosine: a zero-norm REFERENCE is "similar to nothing"
    # (cos pinned to 0.0), so at any positive threshold it drops no
    # corpus rows. Thresholds <= 0 would invert that sentinel into
    # "similar to everything" and are rejected outright.
    corpus = _emb_stream(ctx, spark, [(1, [1.0, 0.0])])
    refs = _emb_stream(ctx, spark, [(100, [0.0, 0.0])])
    out = corpus.decontaminate_embedding(refs, "v", threshold=0.5)
    assert [r.id for r in out.df.collect()] == [1]
    with pytest.raises(ValueError):
        corpus.decontaminate_embedding(refs, "v", threshold=0.0)
    with pytest.raises(ValueError):
        corpus.decontaminate_embedding(refs, "v", threshold=-0.3)


# ------------------------------------------------------------------ #
# upsample_epochs
# ------------------------------------------------------------------ #

def _docs(ctx, spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    return ctx.from_df(spark.createDataFrame(rows, "id long, g string"))


def test_upsample_epochs_integer_epochs_exact(ctx, spark):
    s = _docs(ctx, spark)
    out = s.upsample_epochs("id", "g", {"a": 3.0, "b": 0.0}).df
    by_g = {r["g"]: r["n"] for r in
            out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # a: exactly 3 copies each; b: removed; c: default 1.0 epoch
    assert by_g == {"a": 300, "c": 100}
    # copies are distinct (epoch_ix 0..2 per id)
    assert out.filter("g = 'a'").select("id", "epoch_ix").distinct().count() == 300


def test_upsample_epochs_fractional_rate(ctx, spark):
    s = _docs(ctx, spark)
    out = s.upsample_epochs("id", "g", {"a": 2.5}).df.filter("g = 'a'")
    n = out.count()
    # 100 ids * 2.5 expected; hash gate is uniform — generous bounds
    assert 230 <= n <= 270
    # every id has at least the 2 guaranteed copies
    mins = out.groupBy("id").count().agg(F.min("count")).first()[0]
    assert mins >= 2


def test_upsample_epochs_layout_invariant(ctx, spark):
    s = _docs(ctx, spark)
    a = s.upsample_epochs("id", "g", {"a": 1.7, "b": 0.4})
    b = ctx.from_df(s.df.repartition(7)).upsample_epochs(
        "id", "g", {"a": 1.7, "b": 0.4}
    )
    rows_a = sorted((r.id, r.g, r.epoch_ix) for r in a.df.collect())
    rows_b = sorted((r.id, r.g, r.epoch_ix) for r in b.df.collect())
    assert rows_a == rows_b


def test_upsample_epochs_negative_raises(ctx, spark):
    s = _docs(ctx, spark)
    with pytest.raises(ValueError):
        s.upsample_epochs("id", "g", {"a": -1.0})
    with pytest.raises(ValueError):
        s.upsample_epochs("id", "g", {}, default_epochs=-0.5)


def test_upsample_epochs_null_group_gets_default(ctx, spark):
    rows = [(1, None), (2, "a")]
    s = ctx.from_df(spark.createDataFrame(rows, "id long, g string"))
    out = s.upsample_epochs("id", "g", {"a": 2.0}, default_epochs=1.0).df
    got = sorted((r.id, r.epoch_ix) for r in out.collect())
    assert got == [(1, 0), (2, 0), (2, 1)]


def test_upsample_epochs_empty_dict_uses_default(ctx, spark, duck):
    from renoir_spark.prep import sql_upsample_epochs

    s = _docs(ctx, spark)
    out = s.upsample_epochs("id", "g", {}, default_epochs=2.0).df
    assert out.count() == 600  # every row exactly twice
    # and the SQL mirror parses and agrees on the shape
    sql = sql_upsample_epochs("(SELECT 1 AS id, 'a' AS g)", "id", "g", {},
                              "id, g", default_epochs=2.0)
    assert len(duck.execute(sql).fetchall()) == 2


def test_temperature_mix_directions(ctx):
    """T=1 is the natural mix (keep everything); higher T cuts head
    groups toward the rarest, which always keeps fraction 1; NULL-group
    rows drop; T<=0 raises."""
    import pytest
    from pyspark.sql import functions as F

    rows = (
        [(i, "big") for i in range(300)]
        + [(i + 1000, "small") for i in range(30)]
        + [(2000, None)]
    )
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "doc_id long, g string"))

    t1 = s.temperature_mix("doc_id", "g", temperature=1.0).collect_vec()
    assert len([r for r in t1 if r.g == "big"]) == 300      # T=1: no cut
    assert len([r for r in t1 if r.g == "small"]) == 30
    assert all(r.g is not None for r in t1)                 # NULLs dropped

    t5 = s.temperature_mix("doc_id", "g", temperature=5.0).collect_vec()
    big5 = len([r for r in t5 if r.g == "big"])
    small5 = len([r for r in t5 if r.g == "small"])
    assert small5 == 30                                     # rarest intact
    # shares at T=5: 300^0.2 vs 30^0.2 → big should be cut to ≈
    # 30 * (300/30)^0.2 ≈ 47.6 — allow hash-filter variance
    assert 30 < big5 < 120 and big5 < 300

    with pytest.raises(ValueError):
        s.temperature_mix("doc_id", "g", temperature=0.0)
