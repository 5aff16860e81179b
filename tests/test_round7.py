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
