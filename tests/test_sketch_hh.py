"""Heavy-hitters (Misra-Gries two-pass) and bloom-decontamination unit
tests: the sketch's decrement path on skewed data with a tiny capacity,
the exact fallback when capacity is too small for the skew, and the
bloom operator's empty-reference passthrough and max_keys guard."""

import pytest
from pyspark.sql import functions as F


def _counts(rows):
    return {r[0]: r[1] for r in rows}


def test_heavy_hitters_skewed_small_capacity(ctx):
    # 3 heavy keys buried in 200 singletons; capacity=8 forces many
    # decrement rounds, yet the exact recount + validation must return
    # the true top-3
    data = [("hot_a",)] * 500 + [("hot_b",)] * 300 + [("hot_c",)] * 200
    data += [(f"tail_{i}",) for i in range(200)]
    s = ctx.stream_iter(data, "k string").shuffle()
    out = s.heavy_hitters("k", 3, capacity=8).collect_vec()
    assert [(r.k, r.cnt) for r in out] == [
        ("hot_a", 500), ("hot_b", 300), ("hot_c", 200)
    ]


def test_heavy_hitters_fallback_uniform(ctx):
    # uniform keys: kth count == N/50 <= N/(capacity+1) for capacity=4,
    # so the validation must reject the sketch and the exact fallback
    # must still produce the true (tie-broken) top-k
    data = [(f"u{i:02d}",) for i in range(50)] * 10
    s = ctx.stream_iter(data, "k string")
    out = s.heavy_hitters("k", 5, capacity=4).collect_vec()
    assert [(r.k, r.cnt) for r in out] == [
        (f"u{i:02d}", 10) for i in range(5)
    ]


def test_heavy_hitters_fewer_keys_than_k(ctx):
    s = ctx.stream_iter([("a",), ("a",), ("b",)], "k string")
    out = s.heavy_hitters("k", 10).collect_vec()
    assert _counts(out) == {"a": 2, "b": 1}


def test_heavy_hitters_nulls_ignored(ctx):
    s = ctx.stream_iter([("a",), (None,), (None,), ("b",), ("a",)],
                        "k string")
    out = s.heavy_hitters("k", 2).collect_vec()
    assert [(r.k, r.cnt) for r in out] == [("a", 2), ("b", 1)]


def test_heavy_hitters_int_keys(ctx):
    s = ctx.stream_iter([(7,)] * 5 + [(3,)] * 2 + [(9,)], "k long")
    out = s.heavy_hitters("k", 2, capacity=2).collect_vec()
    assert [(r.k, r.cnt) for r in out] == [(7, 5), (3, 2)]


# ------------------------------------------------------------------ #
# dedup_against_bloom
# ------------------------------------------------------------------ #

def test_bloom_empty_reference_passthrough(ctx):
    docs = ctx.stream_iter([(1, "aa"), (2, "bb")], "id long, text string")
    ref = ctx.stream_iter([], "id long, text string")
    out = docs.dedup_against_bloom(ref, "text").collect_vec()
    assert sorted(r.id for r in out) == [1, 2]


def test_bloom_matches_exact_operator(ctx):
    docs = ctx.stream_iter(
        [(i, f"doc {i % 5}") for i in range(50)], "id long, text string"
    )
    ref = ctx.stream_iter(
        [(99, "doc 0"), (98, "DOC  2")], "id long, text string"
    )
    bloom = sorted(r.id for r in docs.dedup_against_bloom(ref, "text").collect_vec())
    exact = sorted(r.id for r in docs.dedup_against(ref, "text").collect_vec())
    assert bloom == exact
    # normalization applies: "DOC  2" drops every i % 5 == 2 doc too
    assert all(i % 5 not in (0, 2) for i in bloom)


def test_bloom_null_text_kept(ctx):
    docs = ctx.stream_iter([(1, None), (2, "x")], "id long, text string")
    ref = ctx.stream_iter([(9, None), (8, "x")], "id long, text string")
    out = docs.dedup_against_bloom(ref, "text").collect_vec()
    # NULL never equals NULL — row 1 survives; "x" is contaminated
    assert [r.id for r in out] == [1]


def test_bloom_max_keys_guard(ctx):
    docs = ctx.stream_iter([(1, "a")], "id long, text string")
    ref = ctx.stream_iter(
        [(i, f"t{i}") for i in range(20)], "id long, text string"
    )
    with pytest.raises(ValueError, match="dedup_against"):
        docs.dedup_against_bloom(ref, "text", max_keys=10)
