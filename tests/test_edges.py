"""Edge-case sweep: EMPTY and single-row inputs through every operator
family (renoir's tests run the same sweep per operator — tests/ in the
reference crate). An operator that crashes or emits phantom rows on an
empty stream fails here, not in a 3 a.m. pipeline."""

from pyspark.sql import functions as F


def _empty(ctx, schema="k long, v double"):
    return ctx.stream_iter([], schema)


def _one(ctx, schema="k long, v double"):
    return ctx.stream_iter([(1, 2.0)], schema)


def test_elementwise_on_empty(ctx):
    s = _empty(ctx)
    assert s.map("k", w=F.col("v") * 2).collect_vec() == []
    assert s.filter("v > 0").collect_vec() == []
    assert s.flat_map(F.array("v", "v"), alias="x").collect_vec() == []


def test_aggregations_on_empty(ctx):
    s = _empty(ctx)
    # keyed fold over an empty stream: no keys, no rows
    assert s.group_by("k").fold(n=F.count(F.lit(1))).collect_vec() == []
    # global fold over an empty stream still yields ONE row (count = 0),
    # matching SQL aggregate semantics
    [row] = s.fold(n=F.count(F.lit(1))).collect_vec()
    assert row.n == 0


def test_joins_on_empty(ctx):
    e, o = _empty(ctx), _one(ctx)
    assert e.join(o, "k").collect_vec() == []
    assert o.join(e, "k").collect_vec() == []
    left = o.left_join(e, "k").collect_vec()
    assert len(left) == 1 and left[0].k == 1
    assert o.join_salted(e, "k", salt=4).collect_vec() == []


def test_windows_on_empty_and_single(ctx):
    from renoir_spark.window import CountWindow, EventTimeWindow

    e = _empty(ctx, "k long, pos long, v double")
    assert (
        e.key_by("k")
        .window(CountWindow.tumbling("pos", size=3, exact=True))
        .fold(n=F.count(F.lit(1)))
        .collect_vec()
        == []
    )
    # single row, exact window size 3 → incomplete window drops
    s1 = ctx.stream_iter([(1, 0, 5.0)], "k long, pos long, v double")
    assert (
        s1.key_by("k")
        .window(CountWindow.tumbling("pos", size=3, exact=True))
        .fold(n=F.count(F.lit(1)))
        .collect_vec()
        == []
    )
    # event-time window over one row → exactly one window
    s2 = ctx.stream_iter([(1, 0, 5.0)], "k long, ts long, v double")
    out = (
        s2.key_by("k")
        .window(EventTimeWindow.tumbling(F.timestamp_seconds("ts"), size=60.0))
        .fold(total=F.sum("v"))
        .collect_vec()
    )
    assert len(out) == 1 and out[0].total == 5.0


def test_dedup_and_similarity_on_empty(ctx):
    e = _empty(ctx, "doc_id long, text string")
    assert e.dedup_exact("text", order=["doc_id"]).collect_vec() == []
    assert e.dedup_minhash("text", "doc_id").collect_vec() == []
    assert e.dedup_simhash("text", "doc_id").collect_vec() == []
    assert e.similar_pairs_ngram("text", "doc_id").collect_vec() == []


def test_iteration_on_empty(ctx):
    e = _empty(ctx, "src long, dst long")

    def body(s, _h):
        return s

    def update(state, df):
        return state + 1

    state, out = e.iterate(3, 0, body, update)
    assert state == 3 and out.collect_vec() == []


def test_sorts_limits_on_empty(ctx):
    e = _empty(ctx)
    assert e.sorted_by(F.col("v").desc()).collect_vec() == []
    assert e.limit(5).collect_vec() == []
    assert e.sorted_limit_by([F.col("v")], 5).collect_vec() == []


def test_zip_and_merge_on_empty(ctx):
    e, o = _empty(ctx), _one(ctx)
    # zip truncates to the shorter side — empty
    assert e.zip(o, order=["k"], other_order=["k"]).collect_vec() == []
    merged = e.merge(o).collect_vec()
    assert len(merged) == 1
