"""asof_join unit semantics: direction, inclusivity, tolerance, how,
NULL-bearing right payloads, ties, and empty sides.

The operator is a pipeline extension (point-in-time join); its scale
design is one union + one window pass — see Stream.asof_join. The
sf-data version is q86 in the suite (DuckDB ASOF JOIN oracle)."""

from pyspark.sql import functions as F


LEFT = [(1, 10.0, "a"), (1, 20.0, "b"), (2, 15.0, "c"), (3, 5.0, "d")]
RIGHT = [(1, 10.0, 100.0), (1, 18.0, 200.0), (2, 30.0, 300.0)]
LS = "k long, ts double, tag string"
RS = "k long, ts double, rv double"


def _streams(ctx, left=LEFT, right=RIGHT):
    return ctx.stream_iter(left, LS), ctx.stream_iter(right, RS)


def _by_tag(rows):
    return {r.tag: r for r in rows}


def test_asof_backward_inclusive(ctx):
    l, r = _streams(ctx)
    out = _by_tag(l.asof_join(r, left_ts="ts", right_ts="ts", on=["k"]).collect_vec())
    # equal timestamps match (inclusive bound)
    assert out["a"].rv == 100.0
    # most recent prior, not just any prior
    assert out["b"].rv == 200.0
    # right row strictly in the future does not match backward
    assert out["c"].rv is None
    # key with no right rows at all survives with NULLs (how='left')
    assert out["d"].rv is None and out["d"].matched_ts is None


def test_asof_forward(ctx):
    l, r = _streams(ctx)
    out = _by_tag(
        l.asof_join(
            r, left_ts="ts", right_ts="ts", on=["k"], direction="forward"
        ).collect_vec()
    )
    assert out["a"].rv == 100.0  # inclusive at equal ts
    assert out["b"].rv is None  # nothing at/after 20 for k=1
    assert out["c"].rv == 300.0  # next future row


def test_asof_tolerance_and_inner(ctx):
    l, r = _streams(ctx)
    out = _by_tag(
        l.asof_join(
            r, left_ts="ts", right_ts="ts", on=["k"], tolerance=1.0
        ).collect_vec()
    )
    assert out["a"].rv == 100.0  # gap 0 <= 1s
    assert out["b"].rv is None  # gap 2s > 1s tolerance → nulled
    inner = l.asof_join(
        r, left_ts="ts", right_ts="ts", on=["k"], tolerance=1.0, how="inner"
    ).collect_vec()
    assert [r_.tag for r_ in inner] == ["a"]


def test_asof_null_payload_consistency(ctx):
    # a right row whose PAYLOAD is NULL must still count as the match
    # (the struct packing keeps row identity; per-column ignorenulls
    # would have leaked the older row's value)
    l = ctx.stream_iter([(1, 20.0, "x")], LS)
    r = ctx.stream_iter([(1, 10.0, 100.0), (1, 15.0, None)], RS)
    [row] = l.asof_join(r, left_ts="ts", right_ts="ts", on=["k"]).collect_vec()
    assert row.rv is None
    assert row.matched_ts is not None  # matched the ts=15 row


def test_asof_empty_right(ctx):
    l = ctx.stream_iter(LEFT, LS)
    r = ctx.stream_iter([], RS)
    rows = l.asof_join(r, left_ts="ts", right_ts="ts", on=["k"]).collect_vec()
    assert len(rows) == len(LEFT)
    assert all(x.rv is None for x in rows)
    assert (
        l.asof_join(
            r, left_ts="ts", right_ts="ts", on=["k"], how="inner"
        ).collect_vec()
        == []
    )


def test_asof_column_name_collision(ctx):
    # right payload column named like a left column gets the _r suffix
    l = ctx.stream_iter([(1, 10.0, "a")], LS)
    r = ctx.stream_iter([(1, 5.0, "zz")], "k long, ts double, tag string")
    [row] = l.asof_join(r, left_ts="ts", right_ts="ts", on=["k"]).collect_vec()
    assert row.tag == "a" and row.tag_r == "zz"


def test_asof_global_no_keys(ctx):
    # keyless as-of: one global ordering (single partition — the
    # documented renoir Replication::One analog for global ordered ops)
    l = ctx.stream_iter([(1, 10.0, "a"), (2, 30.0, "b")], LS)
    r = ctx.stream_iter([(9, 5.0, 1.0), (9, 25.0, 2.0)], RS)
    out = _by_tag(l.asof_join(r, left_ts="ts", right_ts="ts").collect_vec())
    assert out["a"].rv == 1.0
    assert out["b"].rv == 2.0


def test_keyed_asof_join_matches_unkeyed(ctx):
    l = ctx.stream_iter(LEFT, LS)
    r = ctx.stream_iter(RIGHT, RS)
    keyed = (
        l.key_by("k")
        .asof_join(r.key_by("k"), left_ts="ts", right_ts="ts")
        .collect_vec()
    )
    plain = l.asof_join(r, left_ts="ts", right_ts="ts", on=["k"]).collect_vec()
    norm = lambda rows: sorted((x.tag, x.rv) for x in rows)
    assert norm(keyed) == norm(plain)


def test_asof_null_keys_never_match(ctx):
    # SQL join semantics: NULL keys match nothing (the window
    # partitioning groups NULLs, so the operator must exclude them)
    l = ctx.stream_iter([(None, 10.0, "a"), (1, 10.0, "b")], LS)
    r = ctx.stream_iter([(None, 5.0, 1.0), (1, 5.0, 2.0)], RS)
    out = _by_tag(l.asof_join(r, left_ts="ts", right_ts="ts", on=["k"]).collect_vec())
    assert out["a"].rv is None  # NULL key left row: unmatched, kept
    assert out["b"].rv == 2.0


def test_asof_map_payload_rides_along(ctx):
    # a map-typed payload column can't appear in an ORDER BY; it must
    # still survive as data
    l = ctx.stream_iter([(1, 10.0, "a")], LS)
    r = ctx.spark.createDataFrame(
        [(1, 5.0, {"x": "1"})], "k long, ts double, props map<string,string>"
    )
    from renoir_spark import Stream

    [row] = l.asof_join(
        Stream(ctx, r), left_ts="ts", right_ts="ts", on=["k"]
    ).collect_vec()
    assert row.props == {"x": "1"}
