"""Round-2 regression tests: interval_join outer variants, CountWindow
slide>size, lazy inspect, arg-extreme key validation, window_join
descriptor restriction (VERDICT.md round 1 'What's wrong' items)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from renoir_spark.window import CountWindow


def _ts(s: int) -> datetime:
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _events(ctx, seconds):
    return ctx.stream_iter(
        [(i, _ts(s)) for i, s in enumerate(seconds)], "id long, ts timestamp"
    )


def test_interval_join_inner(ctx):
    left = _events(ctx, [0, 10, 100])
    right = _events(ctx, [2, 12, 500])
    got = left.interval_join(
        right, left_ts="ts", right_ts="ts", lower=0.0, upper=5.0
    ).collect_vec()
    assert sorted((r.id, r.id_r) for r in got) == [(0, 0), (1, 1)]


def test_interval_join_left_complement(ctx):
    left = _events(ctx, [0, 10, 100])
    right = _events(ctx, [2, 12, 500])
    got = left.interval_join(
        right, left_ts="ts", right_ts="ts", lower=0.0, upper=5.0, how="left"
    ).collect_vec()
    # matched left rows exactly once each; unmatched left row exactly once
    # with nulls (no spurious bucket duplicates)
    pairs = sorted((r.id, r.id_r) for r in got)
    assert pairs == [(0, 0), (1, 1), (2, None)]


def test_interval_join_full_complement(ctx):
    left = _events(ctx, [0, 10, 100])
    right = _events(ctx, [2, 12, 500])
    got = left.interval_join(
        right, left_ts="ts", right_ts="ts", lower=0.0, upper=5.0, how="full"
    ).collect_vec()
    pairs = sorted(
        ((r.id, r.id_r) for r in got),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    assert pairs == [(0, 0), (1, 1), (2, None), (None, 2)]


def test_interval_join_rejects_unknown_variant(ctx):
    left = _events(ctx, [0])
    with pytest.raises(ValueError):
        left.interval_join(left, left_ts="ts", right_ts="ts", lower=0.0,
                           upper=1.0, how="right")


def test_count_window_slide_gt_size(ctx):
    # size=2, slide=3 → window w covers positions [3w, 3w+2); positions
    # 2 and 5 belong to NO window (count.rs:112-124 allows slide>size).
    rows = ctx.stream_iter([(0, i, i * 10.0) for i in range(7)],
                           "k long, pos long, v double")
    got = (
        rows.key_by("k")
        .window(CountWindow.sliding("pos", size=2, slide=3, exact=True))
        .fold(s=F.sum("v"), n=F.count(F.lit(1)))
        .collect_vec()
    )
    by_win = {r.window_id: (r.s, r.n) for r in got}
    # w0 = pos 0,1 ; w1 = pos 3,4 ; w2 = pos 6 only → dropped by exact
    assert by_win == {0: (10.0, 2), 1: (70.0, 2)}


def test_count_window_slide_gt_size_inexact_keeps_partial(ctx):
    rows = ctx.stream_iter([(0, i, i * 10.0) for i in range(7)],
                           "k long, pos long, v double")
    got = (
        rows.key_by("k")
        .window(CountWindow.sliding("pos", size=2, slide=3, exact=False))
        .fold(n=F.count(F.lit(1)))
        .collect_vec()
    )
    assert {r.window_id: r.n for r in got} == {0: 2, 1: 2, 2: 1}


def test_inspect_is_lazy_and_schema_preserving(ctx):
    def boom(_row):
        raise RuntimeError("must not run at plan-build time")

    s = ctx.stream_range(10).map(x=F.col("id"))
    inspected = s.inspect(boom)  # must NOT raise here (lazy)
    assert inspected.df.schema == s.df.schema
    seen = []
    out = s.inspect(lambda r: seen.append(r)).collect_vec()
    assert sorted(r.x for r in out) == list(range(10))


def test_arg_extreme_rejects_column_keys(ctx):
    s = ctx.stream_range(10).map(k=F.col("id") % 2, v=F.col("id"))
    with pytest.raises(TypeError):
        s.group_by_max_element(F.col("k") + 0, "v")
    # str keys still fine
    got = s.group_by_max_element("k", "v").collect_vec()
    assert {r.k: r.v for r in got} == {0: 8, 1: 9}


def test_window_join_rejects_ordinal_descriptors(ctx):
    rows = ctx.stream_iter([(0, i, float(i)) for i in range(4)],
                           "k long, pos long, v double")
    win = rows.key_by("k").window(CountWindow.tumbling("pos", 2))
    with pytest.raises(ValueError):
        win.window_join(rows.key_by("k"))


def test_unpersist_releases_cache(ctx):
    s = ctx.stream_range(100).cache()
    assert s.collect_count() == 100
    assert s.df.is_cached
    s.unpersist(blocking=True)
    assert not s.df.is_cached
