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
