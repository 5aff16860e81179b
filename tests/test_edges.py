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


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_nexmark_builders_on_empty_events(ctx):
    from renoir_spark.nexmark import (
        avg_price_by_category,
        currency_conversion,
        highest_bid,
        hot_items,
        local_item_suggestion,
        monitor_new_users,
        winning_bids,
    )

    s = ctx.stream_iter([], _EV_SCHEMA)
    assert currency_conversion(s).collect_vec() == []
    assert hot_items(s, size=60.0).collect_vec() == []
    assert highest_bid(s, size=60.0).collect_vec() == []
    assert monitor_new_users(s, size=60.0).collect_vec() == []
    assert winning_bids(s).collect_vec() == []
    assert avg_price_by_category(s).collect_vec() == []
    assert local_item_suggestion(s).collect_vec() == []


def test_dedup_against_edges(ctx):
    # empty reference: everything survives; empty corpus: nothing out;
    # reference == corpus: nothing survives
    docs = ctx.stream_iter([(0, "a b"), (1, "c")], "doc_id long, text string")
    none = ctx.stream_iter([], "doc_id long, text string")
    assert docs.dedup_against(none, "text").collect_count() == 2
    assert none.dedup_against(docs, "text").collect_count() == 0
    assert docs.dedup_against(docs, "text").collect_count() == 0
    # normalization applies on BOTH sides
    ref = ctx.stream_iter([(9, "  A   b ")], "doc_id long, text string")
    assert {r.doc_id for r in docs.dedup_against(ref, "text").collect_vec()} == {1}


def test_multi_table_lsh_on_tiny_corpus(ctx):
    # 2 vectors, 2 tables: no crash, self-pairs excluded, k respected
    rows = [(0, [1.0] * 64), (1, [1.0] * 63 + [-1.0])]
    emb = ctx.stream_iter(rows, "vec_id long, embedding array<double>")
    out = emb.ann_cosine(emb, method="lsh", k=1, n_planes=2, n_tables=2)
    got = out.collect_vec()
    assert all(r.qid != r.vec_id for r in got)
    assert len(got) <= 2


def test_new_aggregates_on_empty(ctx):
    e = _empty(ctx)
    assert e.group_by_quantiles("k", "v", {"p50": 0.5}).collect_vec() == []
    assert e.group_by_count_distinct("k", "v").collect_vec() == []
    # DOCUMENTED divergence: Spark's rollup on empty input emits zero
    # rows; SQL-standard/DuckDB emit the grand-total (count 0) row for
    # the () grouping set (see Stream.group_by_rollup docstring)
    assert e.group_by_rollup(["k"], n=F.count(F.lit(1))).collect_vec() == []


def test_new_prep_ops_on_empty(ctx):
    e = ctx.stream_iter([], "doc_id long, text string, w double")
    assert e.sample_weighted("doc_id", "w").collect_vec() == []
    assert e.word_entropy("doc_id", "text").collect_vec() == []
    emb = ctx.stream_iter([], "vec_id long, embedding array<double>")
    assert emb.dedup_embedding_ivf(n_cells=4).collect_vec() == []


def test_entropy_null_and_single_token(ctx):
    s = ctx.stream_iter(
        [(1, "hello"), (2, None), (3, "a a a a")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.entropy for r in s.word_entropy("doc_id", "text").collect_vec()}
    assert got[1] == 0.0  # single token → zero entropy
    assert got[3] == 0.0  # all-identical tokens → zero entropy
    assert 2 not in got   # NULL text contributes no tokens (oracle-mirrored)
