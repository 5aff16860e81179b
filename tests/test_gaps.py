"""Coverage for the round-2 gap-filling operators: rich_* named APIs,
map_async(+memo), collect_vec_all, CachedStream replay, generator
stream_par_iter, sink round-trips, for_each side effects."""

import pytest
from pyspark.sql import functions as F


def test_rich_filter_map(ctx):
    # keep every other row per partition (stateful drop)
    got = (
        ctx.stream_range(20)
        .replication(1)
        .rich_filter_map(
            lambda: {"i": 0},
            lambda st, row: (row, st.update(i=st["i"] + 1))[0]
            if st["i"] % 2 == 0
            else st.update(i=st["i"] + 1),
            "id long",
        )
        .collect_vec()
    )
    assert len(got) == 10


def test_rich_flat_map(ctx):
    got = (
        ctx.stream_range(5)
        .rich_flat_map(
            lambda: {},
            lambda _st, row: [{"v": row["id"]}, {"v": row["id"] * 10}],
            "v long",
        )
        .collect_vec()
    )
    assert sorted(r.v for r in got) == sorted(
        [i for i in range(5)] + [i * 10 for i in range(5)]
    )


def test_rich_map_custom_raw_batches(ctx):
    def op(batches):
        total = 0
        for pdf in batches:
            total += len(pdf)
            yield pdf.assign(seen=total)[["id", "seen"]]

    got = ctx.stream_range(10).replication(1).rich_map_custom(op, "id long, seen long").collect_vec()
    assert len(got) == 10
    assert max(r.seen for r in got) == 10  # state persisted across batches


def test_map_async(ctx):
    async def enrich(row):
        import asyncio

        await asyncio.sleep(0)
        return {"id": row["id"], "sq": row["id"] ** 2}

    got = ctx.stream_range(20).map_async(enrich, "id long, sq long").collect_vec()
    assert {r.id: r.sq for r in got} == {i: i * i for i in range(20)}


def test_map_async_memo_by(ctx):
    calls = []

    async def enrich(row):
        calls.append(row["k"])
        return {"k": row["k"], "v": row["k"] * 100}

    got = (
        ctx.stream_range(40)
        .map(k=F.col("id") % 4)
        .replication(1)
        .map_async_memo_by(enrich, lambda r: r["k"], "k long, v long")
        .collect_vec()
    )
    assert len(got) == 40
    assert all(r.v == r.k * 100 for r in got)


def test_collect_vec_all(ctx):
    s = ctx.stream_range(10)
    assert sorted(r.id for r in s.collect_vec_all()) == list(range(10))
    assert sorted(r.id for r in s.collect_all()) == list(range(10))


def test_collect_cache_stream_in(ctx):
    cached = ctx.stream_range(100).map(v=F.col("id") * 2).collect_cache()
    s1 = cached.stream_in(ctx).fold(total=F.sum("v")).collect_vec()[0]
    s2 = cached.stream_in(ctx).collect_count()
    assert s1.total == sum(2 * i for i in range(100))
    assert s2 == 100
    cached.unpersist()


def test_stream_par_iter_generator(ctx):
    def gen(pid, n):
        # each replica emits (pid, i) — renoir parallel_iterator semantics
        return iter([(pid, i) for i in range(3)])

    got = ctx.stream_par_iter(gen, partitions=4, schema="pid int, i int").collect_vec()
    assert len(got) == 12
    assert {r.pid for r in got} == {0, 1, 2, 3}


def test_stream_par_iter_int_fallback(ctx):
    got = ctx.stream_par_iter(7).collect_vec()
    assert sorted(r.id for r in got) == list(range(7))


def test_write_read_csv_roundtrip(ctx, tmp_path):
    p = str(tmp_path / "csv_out")
    src = ctx.stream_range(50).map(id="id", sq=F.col("id") * F.col("id"))
    src.write_csv(p, single_file=True)
    back = ctx.stream_csv(p, schema="id long, sq long")
    assert {r.id: r.sq for r in back.collect_vec()} == {i: i * i for i in range(50)}


def test_write_read_parquet_roundtrip(ctx, tmp_path):
    p = str(tmp_path / "pq_out")
    ctx.stream_range(50).map(id="id", neg=-F.col("id")).write_parquet(p)
    back = ctx.stream_parquet(p)
    assert {r.id: r.neg for r in back.collect_vec()} == {i: -i for i in range(50)}


def test_write_avro_gated(ctx, tmp_path):
    p = str(tmp_path / "avro_out")
    s = ctx.stream_range(5)
    try:
        s.write_avro(p)
    except RuntimeError as e:
        assert "avro" in str(e)  # classpath-gated, clear error
    else:
        assert ctx.stream_avro(p).collect_count() == 5


def test_stream_file_text(ctx, tmp_path):
    f = tmp_path / "lines.txt"
    f.write_text("\n".join(f"line {i}" for i in range(25)))
    s = ctx.stream_file(str(f))
    assert s.collect_count() == 25
    assert s.df.columns == ["value"]


def test_collect_channel_iterates_all(ctx):
    it = ctx.stream_range(30).collect_channel()
    assert sorted(r.id for r in it) == list(range(30))


def test_for_each_side_effect(ctx):
    acc = ctx.spark.sparkContext.accumulator(0)
    ctx.stream_range(25).for_each(lambda row: acc.add(row.id))
    assert acc.value == sum(range(25))


def test_split_branches_and_unpersist(ctx):
    a, b = ctx.stream_range(40).split(2)
    assert a.collect_count() == 40
    assert b.filter("id < 10").collect_count() == 10
    a.unpersist(blocking=True)


def test_write_read_json_roundtrip(ctx, tmp_path):
    rows = [(1, "a"), (2, "b"), (3, None)]
    s = ctx.stream_iter(rows, "k long, v string")
    path = str(tmp_path / "out_json")
    s.write_json(path)
    back = ctx.stream_json(path, "k long, v string")
    assert sorted((r.k, r.v) for r in back.collect_vec()) == sorted(rows)


def test_group_by_quantiles_exact_and_approx(ctx):
    import random

    rnd = random.Random(7)
    rows = [(i % 3, rnd.uniform(0, 1000)) for i in range(3000)]
    s = ctx.stream_iter(rows, "g long, x double")
    probs = {"p10": 0.1, "p50": 0.5, "p99": 0.99}
    exact = {r.g: r for r in s.group_by_quantiles("g", "x", probs).collect_vec()}
    # exact median of group 0 equals the Python reference
    import statistics

    xs = sorted(x for g, x in rows if g == 0)
    assert abs(exact[0].p50 - statistics.quantiles(xs, n=2, method="inclusive")[0]) < 1e-9
    # the sketch path (the 100 TB dial) lands within rank tolerance
    approx = {
        r.g: r
        for r in s.group_by_quantiles(
            "g", "x", probs, exact=False, accuracy=10000
        ).collect_vec()
    }
    for g in exact:
        for c in probs:
            a, b = getattr(exact[g], c), getattr(approx[g], c)
            assert abs(a - b) <= 25.0, (g, c, a, b)  # ~2.5% of the range


def test_group_by_count_distinct_exact_vs_hll(ctx):
    rows = [(i % 4, i % 500) for i in range(5000)]
    s = ctx.stream_iter(rows, "g long, u long")
    exact = {r.g: r.n_distinct for r in s.group_by_count_distinct("g", "u").collect_vec()}
    expected = {}
    for g, u in rows:
        expected.setdefault(g, set()).add(u)
    assert exact == {g: len(us) for g, us in expected.items()}
    hll = {
        r.g: r.n_distinct
        for r in s.group_by_count_distinct("g", "u", exact=False, rsd=0.02).collect_vec()
    }
    for g, v in exact.items():
        assert abs(hll[g] - v) <= 0.06 * v, (g, v, hll[g])


def test_unkey_vs_drop_key(ctx):
    ks = ctx.stream_iter([(1, 10.0), (2, 20.0)], "k long, v double").key_by("k")
    assert set(ks.unkey().df.columns) == {"k", "v"}
    assert ks.drop_key().df.columns == ["v"]
    assert sorted(r.v for r in ks.drop_key().collect_vec()) == [10.0, 20.0]


def test_to_view_sql_roundtrip(ctx):
    ctx.stream_iter([(1, 2.0), (2, 4.0)], "k long, v double").to_view("tv_gaps")
    got = ctx.sql("SELECT sum(v) AS s FROM tv_gaps").collect_vec()
    assert got[0].s == 6.0
