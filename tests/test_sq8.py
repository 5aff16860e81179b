"""SQ8 scalar-quantized ANN: exact-rerank contract and codec edge
cases. The suite oracle (q99) pins bit-exactness vs DuckDB; these pin
the operator-level properties that hold for ANY corpus."""

from pyspark.sql import functions as F


def _key(r):
    d = r.asDict()
    return (d["qid"], d["vec_id"], d["cos"], d["rank"])


def test_sq8_full_rerank_equals_brute(ctx, sf_dir):
    """With rerank >= corpus size the candidate stage keeps everything,
    so the exact re-score must reproduce brute-force bit-for-bit —
    quantization error can reorder candidates but never the final
    top-k."""
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    queries = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").filter(
        "vec_id < 4"
    )
    brute = sorted(
        map(_key, emb.ann_cosine(queries, method="brute", k=3).collect_vec())
    )
    sq8 = sorted(
        map(
            _key,
            emb.ann_cosine(
                queries, method="sq8", k=3, rerank=10**6
            ).collect_vec(),
        )
    )
    assert sq8 == brute and len(sq8) == 12


def test_sq8_string_ids_and_constant_dims(ctx):
    """A dimension with zero spread (max == min) hits the scale-0 codec
    branch (code pinned to 0, dequantized back to mn); ids carry through
    with their own dtype — nothing assumes long."""
    rows = [
        (f"id{i:02d}", [float(i % 5), 7.0, float((i * 3) % 4)])
        for i in range(12)
    ]
    corpus = ctx.stream_iter(rows, "vec_id string, embedding array<double>")
    queries = ctx.stream_iter(
        rows[:2], "vec_id string, embedding array<double>"
    )
    out = corpus.ann_cosine(
        queries, method="sq8", k=2, rerank=6, dim=3
    ).collect_vec()
    assert len(out) == 4  # 2 queries x k=2
    assert all(isinstance(r.qid, str) and isinstance(r.vec_id, str) for r in out)
    assert all(r.qid != r.vec_id for r in out)
    assert all(-1.0 <= r.cos <= 1.0 for r in out)


def test_sq8_corpus_smaller_than_rerank_and_k(ctx):
    rows = [(i, [1.0, float(i)]) for i in range(3)]
    corpus = ctx.stream_iter(rows, "vec_id long, embedding array<double>")
    queries = ctx.stream_iter(rows[:1], "vec_id long, embedding array<double>")
    out = corpus.ann_cosine(
        queries, method="sq8", k=10, rerank=50, dim=2
    ).collect_vec()
    # 1 query, corpus of 3 minus self = 2 neighbors
    assert sorted(r.vec_id for r in out) == [1, 2]


def test_ivf_sq8_full_probe_and_rerank_equals_brute(ctx, sf_dir):
    """With nprobe == n_cells (probe everything) and rerank >= corpus,
    both approximation levels are disabled and the composed stack must
    reproduce brute force bit-for-bit."""
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    queries = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").filter(
        "vec_id < 4"
    )
    brute = sorted(
        map(_key, emb.ann_cosine(queries, method="brute", k=3).collect_vec())
    )
    stacked = sorted(
        map(
            _key,
            emb.ann_cosine(
                queries, method="ivf_sq8", k=3,
                n_cells=8, nprobe=8, rerank=10**6,
            ).collect_vec(),
        )
    )
    assert stacked == brute and len(stacked) == 12


def test_ivf_sq8_candidates_subset_of_ivf(ctx, sf_dir):
    """Same cells, same probes: the composed stack's results can only
    come from the cells plain IVF searches — its neighbor set per query
    is a subset of IVF's candidate cells' population (sanity that the
    SQ8 stage only reorders within the probed volume)."""
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    queries = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").filter(
        "vec_id < 4"
    )
    ivf = emb.ann_cosine(
        queries, method="ivf", k=50, n_cells=16, nprobe=4
    ).collect_vec()
    ivf_pop = {(r.qid, r.vec_id) for r in ivf}
    stacked = emb.ann_cosine(
        queries, method="ivf_sq8", k=3, n_cells=16, nprobe=4, rerank=50,
    ).collect_vec()
    assert {(r.qid, r.vec_id) for r in stacked} <= ivf_pop


def test_zero_vectors_cosine_is_zero_all_methods(ctx):
    """Zero-norm vectors: cosine is DEFINED as 0.0 family-wide (a zero
    vector is similar to nothing) — ANSI Spark would otherwise raise
    DIVIDE_BY_ZERO and DuckDB would emit inf/nan. Found by the
    hypothesis sweep; the SQL mirrors pin the same CASE."""
    rows = [
        (0, [0.0, 0.0, 0.0]),
        (1, [1.0, 2.0, 2.0]),
        (2, [0.0, 0.0, 0.0]),
        (3, [2.0, 4.0, 4.0]),
    ]
    corpus = ctx.stream_iter(rows, "vec_id long, embedding array<double>")
    queries = ctx.stream_iter(rows[:2], "vec_id long, embedding array<double>")
    for method, kw in [
        ("brute", {}),
        ("lsh", {"n_planes": 4, "dim": 3}),
        ("ivf", {"n_cells": 2, "nprobe": 2}),
        ("sq8", {"rerank": 8, "dim": 3}),
        ("ivf_sq8", {"n_cells": 2, "nprobe": 2, "rerank": 8, "dim": 3}),
    ]:
        out = corpus.ann_cosine(queries, method=method, k=3, **kw).collect_vec()
        by_q = {}
        for r in out:
            by_q.setdefault(r.qid, {})[r.vec_id] = r.cos
        # zero-vector query: every cosine is 0.0
        assert all(c == 0.0 for c in by_q.get(0, {}).values()), method
        # real query: parallel vector scores 1.0, zero vectors 0.0
        q1 = by_q.get(1, {})
        if 3 in q1:
            assert q1[3] == 1.0, method
        assert all(q1[v] == 0.0 for v in (0, 2) if v in q1), method

    # embedding dedup survives zero vectors: the two zero vectors score
    # cos 0.0 against everything (kept), 3 is parallel to 1 (dropped)
    d1 = corpus.dedup_embedding(threshold=0.95, n_planes=4, dim=3)
    assert {r.vec_id for r in d1.collect_vec()} == {0, 1, 2}
