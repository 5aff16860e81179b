"""Iteration subsystem tests (SURVEY §2.9) — golden values mirror the
reference's doctests and examples (iterate.rs doctest, replay.rs doctest,
connected_components.rs, kmeans.rs)."""

from pyspark.sql import functions as F


def test_iterate_reference_doctest(ctx):
    # renoir iterate.rs:341-366 doctest: stream 0..3, 3 iterations of
    # map(+10); state folds the sum of EVERY iteration's elements;
    # items = last iteration's elements.
    s = ctx.stream_range(3).map(n=F.col("id"))
    state, items = s.iterate(
        3,
        0,
        lambda st, _h: st.map(n=F.col("n") + 10),
        lambda acc, df: acc + df.agg(F.sum("n")).collect()[0][0],
        lambda _st: True,
    )
    assert state == (10 + 11 + 12) + (20 + 21 + 22) + (30 + 31 + 32)
    assert sorted(r.n for r in items.collect_vec()) == [30, 31, 32]


def test_iterate_loop_condition_stops_early(ctx):
    s = ctx.stream_range(4).map(n=F.col("id"))
    state, _items = s.iterate(
        100,
        0,
        lambda st, _h: st.map(n=F.col("n") + 1),
        lambda acc, _df: acc + 1,
        lambda st: st < 5,  # stop after 5 iterations
    )
    assert state == 5


def test_iterate_state_handle_readable_in_body(ctx):
    s = ctx.stream_range(3).map(n=F.col("id"))
    seen = []

    def body(st, handle):
        seen.append(handle.get())
        return st.map(n=F.col("n") + handle.get())

    state, items = s.iterate(3, 1, body, lambda acc, _df: acc + 1)
    assert seen == [1, 2, 3]  # state evolves between iterations
    # 0,1,2 +1 then +2 then +3 → 6,7,8
    assert sorted(r.n for r in items.collect_vec()) == [6, 7, 8]


def test_replay_same_input_each_round(ctx):
    # replay.rs doctest shape: the SAME input re-fed; only state evolves.
    s = ctx.stream_range(10).map(n=F.col("id"))
    total = s.replay(
        3,
        0,
        lambda st, _h: st,
        lambda acc, df: acc + df.agg(F.sum("n")).collect()[0][0],
    )
    assert total == 3 * sum(range(10))


def test_replay_kmeans_1d(ctx):
    # kmeans.rs shape in 1-D: two clusters around 0..4 and 100..104;
    # centroid assignment re-reads the same points each round.
    pts = ctx.stream_iter(
        [(float(x),) for x in list(range(5)) + list(range(100, 105))],
        "x double",
    )

    def body(st, handle):
        c0, c1 = handle.get()
        return st.map(
            "x",
            cluster=F.when(
                F.abs(F.col("x") - c0) <= F.abs(F.col("x") - c1), 0
            ).otherwise(1),
        )

    def update(state, df):
        rows = df.groupBy("cluster").agg(F.avg("x").alias("m")).collect()
        means = {r.cluster: r.m for r in rows}
        return (means.get(0, state[0]), means.get(1, state[1]))

    final = ctx.from_df(pts.df).replay(10, (0.0, 1.0), body, update)
    assert abs(final[0] - 2.0) < 1e-9
    assert abs(final[1] - 102.0) < 1e-9


def test_delta_iterate_chain_components(ctx):
    # path graph 0-1-2-3-4 plus isolated 10: min label must walk the
    # chain (4 propagation rounds) and stop when no deltas remain.
    verts = [0, 1, 2, 3, 4, 10]
    e0 = [(i, i + 1) for i in range(4)]
    edges_rows = e0 + [(b, a) for a, b in e0]
    edges = ctx.stream_iter(edges_rows, "src long, dst long").df

    init = ctx.stream_iter([(v, v) for v in verts], "v long, comp long").key_by("v")

    def body(state, _it):
        cand = (
            state.df.join(edges, state.df["v"] == edges["src"])
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("comp").alias("new_comp"))
        )
        return state._stream(
            cand.join(state.df, "v")
            .filter(F.col("new_comp") < F.col("comp"))
            .select("v", F.col("new_comp").alias("comp"))
        )

    final = init.delta_iterate(50, body)
    got = {r.v: r.comp for r in final.df.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10}
