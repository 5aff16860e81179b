# Round-9 regression tests: the ADVICE r8 fixes.
#
# 1. dedup_phash_stream must carry 54-62-bit signatures LOSSLESSLY
#    through the Arrow→pandas hop even when a NULL signature shares
#    the state group (nullable long → float64 widening corrupted the
#    low bits: exact only to 2^53).
# 2. dedup_phash's bits auto-dial must be mixed-codec-width-safe
#    (min width, not first-row width) and must refuse widths < bands.

import datetime

import pytest


# ------------------------------------------------------------------ #
# dedup_phash_stream: 62-bit signatures survive a NULL in the batch
# ------------------------------------------------------------------ #

def _ph62_survivors(ctx, rows, *, bits, bands, max_hamming):
    from renoir_spark.streaming import (
        dedup_phash_stream,
        minhash_survivors,
        run_to_completion,
    )

    ch = ctx.stream_channel("id long, ts timestamp, features array<float>")
    ch.push(rows)
    s = ch.stream(max_files_per_trigger=1)
    verdicts = dedup_phash_stream(
        s, "features", "id", ts_col="ts", delay="1 hour",
        bits=bits, bands=bands, max_hamming=max_hamming,
        state_groups=1,  # one group: every row shares the pandas batch
    )
    out_rows = run_to_completion(verdicts.df, output_mode="append")
    bounded = ctx.from_df(
        ctx.spark.createDataFrame(out_rows, verdicts.df.schema)
    )
    out = minhash_survivors(bounded, "id").collect_vec()
    return {r.id for r in out}


def test_streaming_phash_62bit_signature_exact_despite_null_row(ctx):
    # Signatures 2^61+1 and 2^61+2 (Hamming 2) BOTH round to 2^61 in
    # float64 — under the nullable-long→float64 widening (triggered by
    # the NULL-feature row in the same state group) they false-matched
    # at max_hamming=1. bit j set ⟺ feature_j ≥ mean, so features
    # hot at {0, 61} pack 2^61+1 and hot at {1, 61} pack 2^61+2.
    t0 = datetime.datetime(2024, 1, 1)

    def feats(*on_bits):
        f = [0.0] * 62
        for j in on_bits:
            f[j] = 1.0
        return f

    rows = [
        (1, t0, feats(0, 61)),   # sig = 2^61 + 1
        (2, t0, feats(1, 61)),   # sig = 2^61 + 2 — Hamming 2 from id 1,
        #                          shares the high 31-bit band (bit 61)
        (3, t0, None),           # NULL: forces the widening pre-fix
    ]
    got = _ph62_survivors(ctx, rows, bits=62, bands=2, max_hamming=1)
    assert got == {1, 2, 3}

    # and a REAL Hamming-≤1 pair at 62 bits still drops (the fix did
    # not break matching): sig 2^61+1 twice → Hamming 0
    rows = [
        (1, t0, feats(0, 61)),
        (2, t0, feats(0, 61)),
        (3, t0, None),
    ]
    got = _ph62_survivors(ctx, rows, bits=62, bands=2, max_hamming=1)
    assert got == {1, 3}


# ------------------------------------------------------------------ #
# dedup_phash: mixed-width auto-dial (min, not first-row)
# ------------------------------------------------------------------ #

_HI_LO_8 = [0.9, 0.1, 0.9, 0.1, 0.9, 0.1, 0.9, 0.1]
_LO_HI_8 = [0.1, 0.9, 0.1, 0.9, 0.1, 0.9, 0.1, 0.9]


def test_phash_auto_dial_uses_min_width_on_mixed_codecs(ctx):
    # 48-wide row FIRST (the order that used to dial bits=48 and band
    # the 8-wide rows against a constant-zero 40-bit tail). With the
    # min dial, bits=8: row 2's first 8 features repeat row 1's sign
    # pattern → Hamming 0 → dropped; row 3 is the complement → kept.
    rows = [
        (2, _HI_LO_8 + [0.5] * 40),  # 48-feature codec
        (1, _HI_LO_8),               # 8-feature codec, same sign pattern
        (3, _LO_HI_8),               # complement: Hamming 8 from row 1
    ]
    s = ctx.from_df(ctx.spark.createDataFrame(
        rows, "doc_id long, image_features array<float>"
    ))
    kept = s.dedup_phash("image_features", "doc_id")
    assert sorted(r.doc_id for r in kept.df.collect()) == [1, 3]


def test_phash_auto_dial_unchanged_on_uniform_corpus(ctx):
    rows = [(1, _HI_LO_8), (2, _HI_LO_8), (3, _LO_HI_8), (4, None)]
    s = ctx.from_df(ctx.spark.createDataFrame(
        rows, "doc_id long, image_features array<float>"
    ))
    kept = s.dedup_phash("image_features", "doc_id")
    # identical to the explicit-bits pin (the old dial's answer here)
    want = s.dedup_phash("image_features", "doc_id", bits=8)
    assert (sorted(r.doc_id for r in kept.df.collect())
            == sorted(r.doc_id for r in want.df.collect())
            == [1, 3, 4])


def test_phash_auto_dial_refuses_width_below_bands(ctx):
    s = ctx.from_df(ctx.spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.1, 0.9])],
        "doc_id long, image_features array<float>",
    ))
    with pytest.raises(ValueError, match="constant-zero bands"):
        s.dedup_phash("image_features", "doc_id", bands=4)


def test_phash_auto_dial_all_null_corpus_keeps_everything(ctx):
    s = ctx.from_df(ctx.spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, image_features array<float>"
    ))
    kept = s.dedup_phash("image_features", "doc_id")
    assert sorted(r.doc_id for r in kept.df.collect()) == [1, 2]


def test_phash_against_auto_dial_uses_min_width(ctx):
    # corpus mixes 8- and 48-wide rows; the reference is 8-wide. With
    # the min dial both sides hash the first 8 features, so the
    # 48-wide re-encode of the reference image is still caught.
    corpus = ctx.from_df(ctx.spark.createDataFrame(
        [(1, _HI_LO_8 + [0.5] * 40),   # re-encoded copy of the ref
         (2, _LO_HI_8),                # unrelated
         (3, None)],                   # no decoded evidence: kept
        "doc_id long, image_features array<float>",
    ))
    ref = ctx.from_df(ctx.spark.createDataFrame(
        [(100, _HI_LO_8)], "doc_id long, image_features array<float>"
    ))
    kept = corpus.dedup_phash_against(
        ref, "image_features", max_hamming=1
    )
    assert sorted(r.doc_id for r in kept.df.collect()) == [2, 3]


# ------------------------------------------------------------------ #
# bucket_cap: the df-cutoff for over-crowded band buckets (r8 verdict
# ask #2 — the posting-cutoff trick similar_pairs_ngram uses)
# ------------------------------------------------------------------ #

def _feat48(hot):
    # 48 features; bit j of the signature = (f_j >= mean). A few 0.9s
    # in a sea of 0.1s keeps the mean between the two levels.
    f = [0.1] * 48
    for j in hot:
        f[j] = 0.9
    return f


def test_phash_bucket_cap_keeps_planted_dups_drops_crowded_buckets(ctx):
    # crowd: 12 rows sharing band 0 (bits 0-11 all zero) with disjoint
    # hot triples upstairs — pairwise Hamming 6 > 3, so never dups. The
    # planted pair (100, 101) is identical with hot bits spread over
    # ALL FOUR bands, so each of its band values is unique in the
    # corpus: every bucket it occupies has size 2 <= cap.
    rows = [(i, _feat48([12 + 3 * i, 13 + 3 * i, 14 + 3 * i]))
            for i in range(12)]
    rows += [(100, _feat48([1, 13, 25, 37])), (101, _feat48([1, 13, 25, 37]))]
    s = ctx.from_df(ctx.spark.createDataFrame(
        rows, "doc_id long, image_features array<float>"
    ))
    capped = s.dedup_phash("image_features", "doc_id", bits=48, bucket_cap=4)
    uncapped = s.dedup_phash("image_features", "doc_id", bits=48)
    got = sorted(r.doc_id for r in capped.df.collect())
    want = sorted(r.doc_id for r in uncapped.df.collect())
    # identical output: the capped buckets held only non-dup pairs
    assert got == want == list(range(12)) + [100]


def test_phash_bucket_cap_miss_contract_boundary(ctx):
    # cap=1 drops EVERY bucket of size >= 2 — no candidates survive, so
    # even exact dups are kept: the documented miss rule at its limit
    rows = [(1, _feat48([1, 13, 25, 37])), (2, _feat48([1, 13, 25, 37]))]
    s = ctx.from_df(ctx.spark.createDataFrame(
        rows, "doc_id long, image_features array<float>"
    ))
    kept = s.dedup_phash("image_features", "doc_id", bits=48, bucket_cap=1)
    assert sorted(r.doc_id for r in kept.df.collect()) == [1, 2]


def test_video_phash_bucket_cap(ctx):
    # identical content -> identical frames -> every shared (frame,
    # band) bucket has size 2 <= cap: the dup drops under cap=4; under
    # cap=1 every size-2 bucket is gone and both survive
    texts = [(i, f"distinct video number {i} " * 4) for i in range(30)]
    texts += [(100, "the duplicated clip " * 8),
              (101, "the duplicated clip " * 8)]
    from pyspark.sql import functions as F
    s = ctx.from_df(ctx.spark.createDataFrame(
        texts, "doc_id long, text string"
    )).map(doc_id=F.col("doc_id"),
           content=F.encode(F.col("text"), "UTF-8"))
    capped = s.dedup_video_phash("doc_id", "content", bucket_cap=4)
    ids = {r.doc_id for r in capped.df.select("doc_id").collect()}
    assert 100 in ids and 101 not in ids
    off = s.dedup_video_phash("doc_id", "content", bucket_cap=1)
    ids1 = {r.doc_id for r in off.df.select("doc_id").collect()}
    assert {100, 101} <= ids1


# ------------------------------------------------------------------ #
# state_kmv: bounded per-doc streaming MinHash state (r8 verdict #4)
# ------------------------------------------------------------------ #

_KMV_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog in the park today"),
    (1, "completely unrelated text about stars planets and galaxies far away"),
    (2, "the quick brown fox jumps over the lazy dog in the park tonight"),
    (3, "bananas apples oranges pears and grapes make a fine fruit salad"),
    (4, "completely  unrelated text about stars planets and galaxies far away"),
    (5, "bananas apples oranges pears and grapes make a fine fruit bowl"),
]


def _mh_kmv_survivors(ctx, pushes, *, state_kmv, threshold=0.5):
    from renoir_spark.streaming import (
        dedup_minhash_stream,
        minhash_survivors,
        run_to_completion,
    )

    ch = ctx.stream_channel("doc_id long, ts timestamp, text string")
    for rows in pushes:
        ch.push(rows)
    s = ch.stream(max_files_per_trigger=1)
    verdicts = dedup_minhash_stream(
        s, "text", "doc_id", ts_col="ts", delay="1 hour",
        num_hashes=12, bands=4, shingle_n=3, threshold=threshold,
        state_kmv=state_kmv,
    )
    rows = run_to_completion(verdicts.df, output_mode="append")
    bounded = ctx.from_df(ctx.spark.createDataFrame(rows, verdicts.df.schema))
    out = minhash_survivors(bounded, "doc_id").collect_vec()
    return {r.doc_id for r in out}


def test_kmv_jaccard_ge_exact_when_union_fits():
    from renoir_spark.streaming import _kmv_jaccard_ge

    a, b = {1, 2, 3, 4}, {3, 4, 5, 6}
    # |A∩B|/|A∪B| = 2/6; k=10 >= |A∪B| -> exact
    assert _kmv_jaccard_ge(a, b, 10, 2 / 6)
    assert not _kmv_jaccard_ge(a, b, 10, 2 / 6 + 1e-9)
    # k=3: bottom-3 of the union = {1,2,3}; only 3 is shared -> 1/3
    assert _kmv_jaccard_ge(a, b, 3, 1 / 3)
    assert not _kmv_jaccard_ge(a, b, 3, 1 / 3 + 1e-9)
    # empty signatures never match (the exact path's empty-union pin)
    assert not _kmv_jaccard_ge(set(), set(), 5, 0.0)


def test_streaming_minhash_state_kmv_parity_at_large_k(ctx):
    # k >= every doc's distinct shingle count -> the estimator IS the
    # exact Jaccard (over injective md5 hashes): survivors identical
    # to the exact-state operator on the same pushes
    t0 = _ts9(1000)
    pushes = [
        [(i, t0, txt) for i, txt in _KMV_DOCS[:3]],
        [(i, t0, txt) for i, txt in _KMV_DOCS[3:]],
    ]
    kmv = _mh_kmv_survivors(ctx, pushes, state_kmv=10_000)
    exact = _mh_kmv_survivors(ctx, pushes, state_kmv=None)
    assert kmv == exact
    # sanity: duplicates were actually dropped
    assert kmv != {i for i, _ in _KMV_DOCS}


def test_streaming_minhash_state_kmv_small_k_catches_exact_dups(ctx):
    # identical content -> identical bottom-k signatures -> estimator
    # 1.0 at ANY k; distinct docs stay apart; the dropped-doc-drowns
    # greedy transitivity holds in kmv mode too
    a = "one two three four five six seven eight nine ten eleven twelve"
    b = "completely different words about other things entirely here now"
    pushes = [
        [(0, _ts9(1000), a)],
        [(1, _ts9(1001), a)],   # dup of 0 -> dropped
        [(2, _ts9(1002), b)],   # distinct -> kept
        [(3, _ts9(1003), a)],   # dup of 1 (dropped) -> still drowned
    ]
    got = _mh_kmv_survivors(ctx, pushes, state_kmv=8)
    assert got == {0, 2}


def _ts9(s):
    import datetime

    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


# ------------------------------------------------------------------ #
# mine_contrastive_pairs(cross_cell=): boundary negatives (r8 #6)
# ------------------------------------------------------------------ #

def test_contrastive_cross_cell_finds_planted_boundary_negative(ctx):
    import math

    # two Voronoi cells seeded by ids 0/1 (the order="id" rule); the
    # anchor (id 2) sits at 40deg inside cell 0, the planted hard
    # negative (id 3) at 78deg inside cell 1 — cos(38deg)=0.788 <= 0.8,
    # the hardest negative in the corpus, and in-cell-only mining
    # CANNOT see it (different cells)
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    rows = [(0, v(0)), (1, v(90)), (2, v(40)), (3, v(78))]
    s = ctx.from_df(ctx.spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ))
    def mined(cross):
        out = s.mine_contrastive_pairs(
            vec_col="embedding", id_col="vec_id",
            pos_threshold=0.95, neg_max_cos=0.8, neg_per_anchor=3,
            n_cells=2, cross_cell=cross,
        ).df.collect()
        return {(r.anchor_id, r.pair_id, r.label) for r in out}

    incell = mined(0)
    assert incell == {(0, 2, "neg"), (1, 3, "pos")}
    crossed = mined(1)
    # the planted boundary negative appears — and only negatives grew
    assert (2, 3, "neg") in crossed
    assert {x for x in crossed if x[2] == "pos"} == {(1, 3, "pos")}
    assert incell < crossed


# ------------------------------------------------------------------ #
# corpus_report(features_col=): the media rows (r8 verdict #7)
# ------------------------------------------------------------------ #

def test_corpus_report_media_rows(ctx):
    rows = [
        (1, "some document text one", _HI_LO_8),
        (2, "another document entirely", _HI_LO_8),   # same signature
        (3, "third doc", _LO_HI_8),                   # distinct signature
        (4, "no decoded evidence here", None),        # NULL features
    ]
    s = ctx.from_df(ctx.spark.createDataFrame(
        rows, "doc_id long, text string, image_features array<float>"
    ))
    rep = dict(
        (r.metric, r.value)
        for r in s.corpus_report(
            "doc_id", "text", features_col="image_features"
        ).df.collect()
    )
    assert rep["media_decoded_rate"] == 0.75      # 3 of 4 decoded
    assert rep["phash_dup_rate"] == 0.333333      # 2 distinct sigs of 3
    assert rep["n_docs"] == 4.0
    # without features_col the card is unchanged (no media rows)
    base = dict(
        (r.metric, r.value)
        for r in s.corpus_report("doc_id", "text").df.collect()
    )
    assert "phash_dup_rate" not in base and "media_decoded_rate" not in base
    assert {k: v for k, v in rep.items()
            if k not in ("phash_dup_rate", "media_decoded_rate")} == base


def test_kmv_signature_composability_property():
    # THE invariant that justifies storing only bottom-k per doc: the
    # verdict computed from the two per-set bottom-k SIGNATURES equals
    # the verdict computed from the FULL sets at the same k (any
    # union-bottom-k element is bottom-k of whichever side holds it) —
    # and at k >= |A ∪ B| it equals the exact Jaccard test.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from renoir_spark.streaming import _kmv_jaccard_ge

    sets = st.sets(st.integers(min_value=0, max_value=60), max_size=25)

    @settings(max_examples=200, deadline=None)
    @given(a=sets, b=sets, k=st.integers(min_value=1, max_value=30),
           thr=st.floats(min_value=0.0, max_value=1.0,
                         allow_nan=False, allow_infinity=False))
    def prop(a, b, k, thr):
        sig_a = set(sorted(a)[:k])
        sig_b = set(sorted(b)[:k])
        assert (_kmv_jaccard_ge(sig_a, sig_b, k, thr)
                == _kmv_jaccard_ge(a, b, k, thr))
        if k >= len(a | b):
            exact = (len(a | b) > 0
                     and len(a & b) / len(a | b) >= thr)
            assert _kmv_jaccard_ge(a, b, k, thr) == exact

    prop()


# ------------------------------------------------------------------ #
# dedup_phash_stream bucket_cap: bounded state under constant-band flood
# ------------------------------------------------------------------ #

def test_streaming_phash_bucket_cap_bounds_state_same_verdicts(ctx):
    import datetime

    from renoir_spark.streaming import dedup_phash_stream, run_to_completion

    t0 = datetime.datetime(2024, 1, 1)

    def run(cap):
        ch = ctx.stream_channel(
            "id long, ts timestamp, features array<float>")
        # a constant-signature flood: 300 identical items (the black-
        # frame regime) in two micro-batches
        rows = [(i, t0 + datetime.timedelta(seconds=i), _HI_LO_8)
                for i in range(300)]
        ch.push(rows[:150])
        ch.push(rows[150:])
        s = ch.stream(max_files_per_trigger=1)
        telem = []
        out = run_to_completion(
            dedup_phash_stream(
                s, "features", "id", ts_col="ts", delay="1 hour",
                bits=8, bands=4, max_hamming=1, state_groups=1,
                bucket_cap=cap,
            ).df,
            output_mode="append", telemetry=telem,
        )
        verdicts = {(r.id, r.bidx): r.matched for r in out}
        peak = telem[0].get("state_bytes_peak", 0) if telem else 0
        return verdicts, peak

    v_cap, b_cap = run(8)
    v_off, b_off = run(None)
    # identical verdicts: in a flooded bucket the newest entries match
    # a true duplicate just as well as the evicted ones did
    assert v_cap == v_off
    assert sum(1 for (i, b), m in v_cap.items() if b == 0 and m) == 299
    # and the capped state is a fraction of the unbounded one
    assert 0 < b_cap < b_off / 3


# ------------------------------------------------------------------ #
# bucket_cap across the banded-dedup family (minhash/simhash/embedding)
# ------------------------------------------------------------------ #

def test_bucket_cap_family_identity_and_boundary(ctx, sf_dir):
    # a generous cap (no bucket exceeds it on this corpus) must leave
    # every operator's output IDENTICAL to the uncapped form; cap=1
    # drops every shared bucket and disables matching entirely
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet").map(
        "doc_id", "text"
    )
    emb = ctx.stream_parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.df.count()
    n_emb = emb.df.count()

    def ids(s, col="doc_id"):
        return sorted(r[col] for r in s.df.select(col).collect())

    for op, kw in [
        ("dedup_minhash", dict(args=("text", "doc_id"))),
        ("dedup_simhash", dict(args=("text", "doc_id"))),
    ]:
        base = ids(getattr(docs, op)(*kw["args"]))
        capped = ids(getattr(docs, op)(*kw["args"], bucket_cap=10_000))
        assert capped == base, op
        off = ids(getattr(docs, op)(*kw["args"], bucket_cap=1))
        assert len(off) == n_docs, op
        # sanity: the corpus actually contains near-dups to drop
        assert len(base) < n_docs, op

    # plant one exact duplicate vector (sf0.001 has no cosine-0.95
    # near-dups of its own)
    from pyspark.sql import functions as F
    dup = emb.df.filter("vec_id = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    emb2 = ctx.from_df(emb.df.select("vec_id", "embedding").unionByName(dup))
    base = ids(emb2.dedup_embedding(), "vec_id")
    assert ids(emb2.dedup_embedding(bucket_cap=10_000), "vec_id") == base
    assert len(ids(emb2.dedup_embedding(bucket_cap=1), "vec_id")) == n_emb + 1
    assert len(base) == n_emb  # the planted copy dropped

    # the cluster variant passes the cap through to the pair machinery
    cl = docs.dedup_cluster_minhash("text", "doc_id")
    cl_cap = docs.dedup_cluster_minhash("text", "doc_id", bucket_cap=10_000)
    assert ids(cl) == ids(cl_cap)
