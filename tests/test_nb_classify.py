"""In-engine Naive-Bayes classifier filter (prep.nb_classify):
behavioral edges. Bit-exact oracle parity is tests/test_oracle.py
(qa10) plus the differential empty/nulls/unicode gates."""

import pytest


def _docs(ctx, spark, rows):
    return ctx.from_df(
        spark.createDataFrame(rows, "doc_id long, text string, lbl string")
    )


TRAIN = [
    (1, "goal match striker penalty league cup season", "sport"),
    (2, "league season match win goal team coach", "sport"),
    (3, "election parliament vote policy minister law", "politics"),
    (4, "vote law policy government minister debate", "politics"),
]
SCORE = [
    (10, "the striker scored a goal to win the match", None),
    (11, "parliament passed the law after a long vote", None),
]


def test_learns_separable_classes(ctx, spark):
    out = _docs(ctx, spark, SCORE).nb_classify(
        _docs(ctx, spark, TRAIN), "text", "doc_id", "lbl", n_buckets=512
    ).df
    pred = {r.doc_id: r.pred for r in out.collect()}
    assert pred == {10: "sport", 11: "politics"}


def test_null_label_rows_ignored_in_training(ctx, spark):
    train = TRAIN + [(5, "goal goal goal vote vote vote", None)]
    out = _docs(ctx, spark, SCORE).nb_classify(
        _docs(ctx, spark, train), "text", "doc_id", "lbl", n_buckets=512
    ).df
    assert {r.pred for r in out.collect()} == {"sport", "politics"}


def test_empty_training_set_scores_nothing(ctx, spark):
    empty = _docs(ctx, spark, TRAIN).filter("doc_id < 0")
    out = _docs(ctx, spark, SCORE).nb_classify(
        empty, "text", "doc_id", "lbl", n_buckets=512
    ).df
    assert out.count() == 0


def test_tokenless_docs_omitted(ctx, spark):
    score = _docs(ctx, spark, SCORE + [(12, None, None)])
    out = score.nb_classify(
        _docs(ctx, spark, TRAIN), "text", "doc_id", "lbl", n_buckets=512
    ).df
    assert sorted(r.doc_id for r in out.collect()) == [10, 11]


def test_layout_independent(ctx, spark):
    s = _docs(ctx, spark, SCORE)
    t = _docs(ctx, spark, TRAIN)
    a = sorted((r.doc_id, r.pred, r.score) for r in
               s.nb_classify(t, "text", "doc_id", "lbl",
                             n_buckets=512).df.collect())
    b = sorted((r.doc_id, r.pred, r.score) for r in
               s.repartition_by(4, "doc_id")
               .nb_classify(t.shuffle(), "text", "doc_id", "lbl",
                            n_buckets=512).df.collect())
    assert a == b


def test_model_joins_are_broadcast(ctx, spark):
    """Both bounded relations (classes, per-class bucket counts) must
    reach the scoring join as broadcasts — the corpus side never
    shuffles for the model."""
    df = _docs(ctx, spark, SCORE).nb_classify(
        _docs(ctx, spark, TRAIN), "text", "doc_id", "lbl", n_buckets=512
    ).df
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin") >= 2
