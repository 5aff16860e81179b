"""LLM-data-pipeline operator tests (datapipe.py) — hand-computed golden
values on tiny inputs; the oracle suite (q27-q32) covers engine-vs-DuckDB
parity on the driver tables."""

from pyspark.sql import functions as F


def test_dedup_exact_collapses_whitespace(ctx):
    rows = [
        (1, "hello  world"),
        (2, "Hello world"),      # same after normalize+lower
        (3, "different text"),
    ]
    s = ctx.stream_iter(rows, "id long, text string")
    got = sorted(r.id for r in s.dedup_exact("text", order=["id"]).collect_vec())
    assert got == [1, 3]


def test_dedup_minhash_drops_near_duplicate(ctx):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),  # jaccard >> 0.6 → near-dup of 1
        (3, "completely unrelated words about spark catalyst optimizer plans"),
    ]
    s = ctx.stream_iter(rows, "id long, text string")
    got = sorted(
        r.id for r in s.dedup_minhash("text", "id", threshold=0.6).collect_vec()
    )
    assert got == [1, 3]


def test_dedup_minhash_keeps_distinct_docs(ctx):
    rows = [(i, f"document number {i} speaks only about topic {i} entirely") for i in range(5)]
    s = ctx.stream_iter(rows, "id long, text string")
    got = sorted(r.id for r in s.dedup_minhash("text", "id", threshold=0.9).collect_vec())
    assert got == [0, 1, 2, 3, 4]


def test_text_stats_golden(ctx):
    s = ctx.stream_iter([(1, "The cat of a hat.")], "id long, text string")
    row = s.text_stats("text").collect_vec()[0]
    # normalized: "the cat of a hat."
    assert row.stat_chars == 17
    assert row.stat_tokens == 5
    assert abs(row.stat_avg_token_len - (3 + 3 + 2 + 1 + 4) / 5) < 1e-9
    assert abs(row.stat_stopword_ratio - 3 / 5) < 1e-9  # the, of, a
    assert abs(row.stat_punct_ratio - 1 / 17) < 1e-6
    assert abs(row.stat_quality - round(min(1.0, 5 / 100) * (1 - 3 / 5), 6)) < 1e-9


def test_lang_id_heuristic(ctx):
    rows = [
        (1, "the house of the cat is red"),
        (2, "el perro que vive en la casa"),
        (3, "xyzzy plugh qwertz"),
    ]
    got = {
        r.id: r.pred_lang
        for r in ctx.stream_iter(rows, "id long, text string")
        .lang_id("text")
        .collect_vec()
    }
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"


def test_ann_brute_topk(ctx):
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),   # closest to 0
        (2, [0.0, 1.0]),   # orthogonal to 0
        (3, [-1.0, 0.0]),  # opposite
    ]
    s = ctx.stream_iter(vecs, "vec_id long, embedding array<float>")
    q = ctx.stream_iter(vecs[:1], "vec_id long, embedding array<float>")
    got = s.ann_cosine(q, method="brute", k=2).collect_vec()
    ranked = sorted(((r.rank, r.vec_id) for r in got))
    assert ranked == [(1, 1), (2, 2)]


def test_ann_lsh_finds_identical_vector(ctx):
    # i*0.01 offset keeps every base vector distinct (the %5 pattern alone
    # repeats with period 5)
    vecs = [
        (i, [i * 0.01 + float((i * 7 + d) % 5 - 2) for d in range(64)])
        for i in range(20)
    ]
    vecs.append((100, vecs[0][1]))  # exact copy of vec 0 → same bucket, cos=1
    s = ctx.stream_iter(vecs, "vec_id long, embedding array<float>")
    q = ctx.stream_iter(vecs[:1], "vec_id long, embedding array<float>")
    got = s.ann_cosine(q, method="lsh", k=1, n_planes=6).collect_vec()
    assert len(got) == 1
    assert got[0].vec_id == 100
    assert abs(got[0].cos - 1.0) < 1e-6


def test_token_count_whitespace_vs_bpe(ctx):
    rows = [(0, "hello world"), (1, "a,b c!"), (2, "x 42 y")]
    s = ctx.stream_iter(rows, "doc_id long, text string")
    got = {r.doc_id: (r.tok_ws, r.tok_bpe) for r in s.token_count("text").collect_vec()}
    # "hello world" → 2 ws tokens, 2 bpe tokens
    assert got[0] == (2, 2)
    # "a,b c!" → ws: ["a,b","c!"]; bpe: ["a", ",", "b", " c", "!"]
    assert got[1] == (2, 5)
    # "x 42 y" → digits split into their own run
    assert got[2] == (3, 3)


def test_fingerprint_winnow_shared_substring(ctx):
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # (5 + 4 - 1 = 8 chars) yields at least one shared fingerprint
    common = "the quick brown fox jumps"
    rows = [(0, common + " over the lazy dog"), (1, "prefix " + common), (2, "zzz completely different yyy")]
    s = ctx.stream_iter(rows, "doc_id long, text string")
    fps = s.fingerprint_winnow("text", "doc_id").collect_vec()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "docs sharing a long substring must share a fingerprint"
    # fingerprint sets are distinct hashes (no duplicates after explode)
    assert len([r for r in fps if r.doc_id == 0]) == len(by_doc[0])


def test_fingerprint_winnow_short_doc(ctx):
    # shorter than k chars → single whole-text hash
    s = ctx.stream_iter([(0, "ab")], "doc_id long, text string")
    fps = s.fingerprint_winnow("text", "doc_id").collect_vec()
    assert len(fps) == 1


def test_ann_ivf_matches_brute_on_probed_cells(ctx, sf_dir):
    """IVF with nprobe == n_cells degenerates to exhaustive search: every
    query probes every cell, so the top-k must equal the brute-force
    baseline exactly (same rounding, same tie-break)."""
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    qs = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").filter("vec_id < 4")
    ivf = emb.ann_cosine(qs, method="ivf", k=3, n_cells=8, nprobe=8)
    brute = emb.ann_cosine(qs, method="brute", k=3)
    got = {(r.qid, r.vec_id, r.cos, r.rank) for r in ivf.collect_vec()}
    want = {(r.qid, r.vec_id, r.cos, r.rank) for r in brute.collect_vec()}
    assert got == want and len(got) == 12


def test_kmv_distinct_partitioning_independent(ctx):
    """The KMV sketch is order statistics: the estimate must be identical
    regardless of partitioning, exact below k, and within ~3/sqrt(k) of
    the truth above k."""
    rows = [(i % 500,) for i in range(5000)]
    for parts in (1, 7):
        s = ctx.from_df(
            ctx.spark.createDataFrame(rows, "v long").repartition(parts)
        )
        [r] = s.approx_distinct_kmv(F.col("v").cast("string"), k=64).collect_vec()
        est = r.approx_distinct
        assert abs(est - 500) / 500 < 3 / 8, est
        if parts == 1:
            first = est
    assert est == first  # partitioning-independent
    # below k → exact
    small = ctx.stream_iter([(i,) for i in range(10)], "v long")
    [r] = small.approx_distinct_kmv(F.col("v").cast("string"), k=64).collect_vec()
    assert r.approx_distinct == 10.0


def test_dedup_embedding_ivf_auto_cells(ctx):
    # identical vectors dedup regardless of cell layout; n_cells=None
    # derives the cell count from target_cell_size (the 100 TB dial)
    rows = [(i, [float(i % 7), 1.0, float(i)]) for i in range(60)]
    rows += [(1000 + i, v) for i, v in [(i, v) for i, v in rows[:5]]]
    s = ctx.stream_iter(rows, "vec_id long, embedding array<double>")
    out = s.dedup_embedding_ivf(
        threshold=0.999999, n_cells=None, target_cell_size=10,
        vec_col="embedding", id_col="vec_id",
    )
    kept = {r.vec_id for r in out.collect_vec()}
    # every planted copy (same vector, larger id) is dropped
    assert all(1000 + i not in kept for i in range(5))
    assert all(i in kept for i in range(60))
