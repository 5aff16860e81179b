"""Training-data prep operators (prep.py): plan properties and edge
cases beyond the per-query oracle parity in test_oracle.py (q70-q79).

Plan assertions pin the 100 TB design: map-side-only operators must not
shuffle, the tfidf/contamination small relations must broadcast, and
nothing here may degenerate to a cartesian product. Edge cases cover
degenerate strata, short documents, 0/1 fractions, and determinism of
hash-derived decisions under a different physical layout."""

import pytest
from pyspark.sql import functions as F

from renoir_spark import prep, suite

SF = "/root/testdata/sf0.001"


def _docs(ctx):
    return ctx.stream_parquet(f"{SF}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------- #
# plan properties
# --------------------------------------------------------------------- #

def test_pii_redact_is_shuffle_free(ctx):
    df = prep.pii_redact(_docs(ctx).map("doc_id", "text"), "text").df
    plan = _plan(df)
    assert "Exchange" not in plan, "PII redaction must stay map-side"


def test_quality_gopher_is_shuffle_free(ctx):
    df = prep.quality_gopher(_docs(ctx).map("doc_id", "text"), "text").df
    plan = _plan(df)
    assert "Exchange" not in plan


def test_sample_fraction_is_shuffle_free(ctx):
    df = prep.sample_fraction(_docs(ctx), "doc_id", 0.5).df
    plan = _plan(df)
    assert "Exchange" not in plan, "hash sampling must be a local filter"


def test_tfidf_broadcasts_the_df_relation(ctx):
    df = prep.tfidf_top_terms(_docs(ctx), "doc_id", "text", k=2).df
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_contaminated_ngrams_broadcasts_reference_grams(ctx):
    ref = _docs(ctx).filter("doc_id % 10 = 0").map("text")
    df = prep.contaminated_ngrams(
        _docs(ctx), ref, "doc_id", "text", "text", n=8
    ).df
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_filters_postings_before_the_shuffle(ctx):
    df = prep.bm25_rank(_docs(ctx), "doc_id", "text", ["spark"], k=5).df
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"


def test_pack_sequences_single_window_exchange(ctx):
    df = prep.pack_sequences(
        _docs(ctx).map("doc_id", "n_chars"), "doc_id", "n_chars",
        max_tokens=512, n_buckets=8,
    ).df
    plan = _plan(df)
    # one hash exchange on the bucket key (plus AQE reads) — never a
    # single-partition global window
    assert "SinglePartition" not in plan


# --------------------------------------------------------------------- #
# edge cases
# --------------------------------------------------------------------- #

def test_sample_fraction_bounds(ctx):
    total = _docs(ctx).df.count()
    assert prep.sample_fraction(_docs(ctx), "doc_id", 0.0).df.count() == 0
    assert prep.sample_fraction(_docs(ctx), "doc_id", 1.0).df.count() == total


def test_stratified_quota_larger_than_stratum_keeps_all(ctx):
    out = prep.sample_stratified(
        _docs(ctx), "doc_id", ["lang"], 10**6
    ).df.count()
    assert out == _docs(ctx).df.count()


def test_stratified_sample_is_deterministic_across_layouts(ctx):
    a = prep.sample_stratified(_docs(ctx), "doc_id", ["lang"], 3).df
    b = prep.sample_stratified(
        ctx.from_df(_docs(ctx).df.repartition(7)), "doc_id", ["lang"], 3
    ).df
    assert sorted(r.doc_id for r in a.select("doc_id").collect()) == sorted(
        r.doc_id for r in b.select("doc_id").collect()
    )


def test_pack_assignment_deterministic_across_layouts(ctx):
    base = _docs(ctx).map("doc_id", "n_chars")
    a = prep.pack_sequences(base, "doc_id", "n_chars",
                            max_tokens=256, n_buckets=4).df
    b = prep.pack_sequences(
        ctx.from_df(base.df.repartition(13)), "doc_id", "n_chars",
        max_tokens=256, n_buckets=4,
    ).df
    ka = {r.doc_id: r.pack_id for r in a.collect()}
    kb = {r.doc_id: r.pack_id for r in b.collect()}
    assert ka == kb


def test_pack_offsets_stay_within_chunk_arithmetic(ctx):
    out = prep.pack_sequences(
        _docs(ctx).map("doc_id", "n_chars"), "doc_id", "n_chars",
        max_tokens=512, n_buckets=4,
    ).df.collect()
    for r in out:
        local_pack = r.pack_id - r.pack_bucket * (1 << 32)
        assert local_pack == r.pack_offset // 512
        assert r.pack_offset >= 0


def test_rebalance_mix_missing_target_group_is_dropped(ctx):
    # zh absent from targets → frac 0 → no zh rows survive
    out = prep.rebalance_mix(
        _docs(ctx), "doc_id", "lang", {"en": 0.5, "de": 0.5}
    ).df
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "zh" not in langs and "fr" not in langs


def test_rebalance_mix_shares_approach_targets(ctx, spark):
    targets = {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.1, "zh": 0.1}
    out = prep.rebalance_mix(_docs(ctx), "doc_id", "lang", targets).df
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    for lang, share in targets.items():
        got = counts.get(lang, 0) / total
        # hash filter is binomial around the target share; sf0.001 has
        # only ~500 docs so allow a wide but meaningful band
        assert abs(got - share) < 0.12, (lang, got, share)


def test_repetition_short_doc_has_no_bigram(ctx, spark):
    df = spark.createDataFrame([(1, "hello"), (2, "a b a b a b")],
                               ["id", "txt"])
    out = prep.repetition_stats(
        ctx.from_df(df), "id", "txt"
    ).df.orderBy("id").collect()
    assert out[0].top_gram is None and out[0].top_gram_count == 0
    assert out[0].rep_keep  # vacuously repetition-free
    assert out[1].top_gram == "a b" and out[1].top_gram_count == 3
    assert not out[1].rep_keep  # 3*2/6 = 1.0 coverage


def test_contamination_short_and_clean_docs(ctx, spark):
    docs = ctx.from_df(spark.createDataFrame(
        [(1, "one two three four five six seven eight nine"),
         (2, "totally different words here"),
         (3, "short")],
        ["id", "txt"],
    ))
    ref = ctx.from_df(spark.createDataFrame(
        [("one two three four five six seven eight tail",)], ["rtxt"]
    ))
    out = {r.id: (r.overlap_ngrams, r.contaminated)
           for r in prep.contaminated_ngrams(
               docs, ref, "id", "txt", "rtxt", n=8).df.collect()}
    assert out[1] == (1, True)   # shares exactly one 8-gram
    assert out[2] == (0, False)
    assert out[3] == (0, False)  # shorter than n → no grams, clean


def test_pii_redact_counts_and_output(ctx, spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co and b@c.io ip 1.2.3.4 card 4111111111111111 "
             "tel +1 555 0100234 done")],
        ["id", "txt"],
    )
    r = prep.pii_redact(ctx.from_df(df), "txt").df.collect()[0]
    assert r.pii_email == 2 and r.pii_ipv4 == 1
    assert r.pii_ccn == 1 and r.pii_phone == 1
    assert "<EMAIL>" in r.text_redacted and "<CCN>" in r.text_redacted
    assert "4111111111111111" not in r.text_redacted
    assert "a@b.co" not in r.text_redacted


def test_quality_gopher_flags_degenerate_docs(ctx, spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on a mat and then the dog sat too today ok"),
         (2, "x y z"),  # too short
         (3, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16")],  # no alpha
        ["id", "txt"],
    )
    out = {r.id: r.q_keep for r in
           prep.quality_gopher(ctx.from_df(df), "txt").df.collect()}
    assert out[1] is True
    assert out[2] is False
    assert out[3] is False


def test_bm25_empty_query_hits_returns_no_rows(ctx):
    out = prep.bm25_rank(_docs(ctx), "doc_id", "text",
                         ["zzzznotaword"], k=5).df
    assert out.count() == 0


# --------------------------------------------------------------------- #
# properties (hypothesis)
# --------------------------------------------------------------------- #

from hypothesis import given, settings, strategies as st

SLOW = settings(max_examples=6, deadline=None, derandomize=True)


@SLOW
@given(
    ntoks=st.lists(st.integers(min_value=1, max_value=400),
                   min_size=1, max_size=40),
    max_tokens=st.integers(min_value=16, max_value=512),
)
def test_pack_offsets_are_contiguous_per_bucket(ctx, ntoks, max_tokens):
    """Within a bucket, offsets are a running sum in (hash, id) order —
    concat-and-chunk leaves no gaps and no overlaps."""
    rows = [(i, n) for i, n in enumerate(ntoks)]
    s = ctx.stream_iter(rows, "id long, ntok long")
    out = prep.pack_sequences(s, "id", "ntok", max_tokens=max_tokens,
                              n_buckets=3).df.collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.pack_bucket, []).append(r)
    n_by_id = dict(rows)
    for rows_b in by_bucket.values():
        rows_b.sort(key=lambda r: r.pack_offset)
        expect = 0
        for r in rows_b:
            assert r.pack_offset == expect
            assert r.pack_id == r.pack_bucket * (1 << 32) + r.pack_offset // max_tokens
            expect += n_by_id[r.id]


@SLOW
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**6),
                 min_size=1, max_size=60, unique=True),
    f1=st.floats(min_value=0.05, max_value=0.5),
    f2=st.floats(min_value=0.5, max_value=0.95),
)
def test_sample_fraction_is_monotone_in_fraction(ctx, ids, f1, f2):
    """Same salt: the f1 sample is a subset of the f2 sample when
    f1 <= f2 — hash thresholding nests, rand() sampling would not."""
    s = ctx.stream_iter([(i,) for i in ids], "id long")
    a = {r.id for r in prep.sample_fraction(s, "id", f1).df.collect()}
    b = {r.id for r in prep.sample_fraction(s, "id", f2).df.collect()}
    assert a <= b


# --------------------------------------------------------------------- #
# streaming applicability: the stateless prep stages are plain Column
# projections, so the SAME operator code runs on an unbounded frame —
# the full hygiene front (redact -> gate -> sample) works in a
# readStream pipeline with zero changes.
# --------------------------------------------------------------------- #

def test_stateless_prep_ops_run_on_unbounded_input(ctx, spark, tmp_path):
    from renoir_spark.streaming import run_to_completion

    src = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [(1, "the a of to in is big data mail a@b.co ok", "en"),
         (2, "x", "en")],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(src)

    sdf = spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).parquet(src)
    s = ctx.from_df(sdf)
    out = (
        s.pii_redact("text")
        .quality_gopher("text_redacted")
        .filter("q_keep")
        .sample_fraction("doc_id", 1.0)
    )
    assert out.df.isStreaming
    rows = run_to_completion(out.df, output_mode="append")
    assert [r.doc_id for r in rows] == [1]
    assert "<EMAIL>" in rows[0].text_redacted


def test_split_by_hash_is_disjoint_and_exhaustive(ctx):
    splits = prep.split_by_hash(_docs(ctx), "doc_id",
                                {"train": 0.8, "val": 0.1, "test": 0.1})
    ids = {k: {r.doc_id for r in v.df.select("doc_id").collect()}
           for k, v in splits.items()}
    total = _docs(ctx).df.count()
    assert sum(len(s) for s in ids.values()) == total
    assert not (ids["train"] & ids["val"])
    assert not (ids["train"] & ids["test"])
    assert not (ids["val"] & ids["test"])
    # roughly sized (binomial band at ~500 docs)
    assert len(ids["train"]) / total > 0.7


def test_assign_split_stable_under_salt_and_layout(ctx):
    a = prep.assign_split(_docs(ctx), "doc_id", {"a": 0.5, "b": 0.5}).df
    b = prep.assign_split(
        ctx.from_df(_docs(ctx).df.repartition(11)), "doc_id",
        {"a": 0.5, "b": 0.5},
    ).df
    ma = {r.doc_id: r.split for r in a.select("doc_id", "split").collect()}
    mb = {r.doc_id: r.split for r in b.select("doc_id", "split").collect()}
    assert ma == mb


def test_null_text_parity_with_duckdb(ctx, spark, duck):
    """Real corpora carry NULL text; both engines must agree. Spark and
    DuckDB share 3VL here: NULL tokens -> NULL metrics -> q_keep NULL
    (dropped by WHERE), NULL regexp counts, and concat_ws skipping NULL
    args in the sampling hash."""
    import pandas as pd

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [None, "the a of to in real words here okay fine then"],
    })
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    s = ctx.from_df(sdf)

    duck.register("null_docs", pdf)
    got = {
        r.doc_id: (r.q_tokens, r.q_keep)
        for r in prep.quality_gopher(s, "text").df.collect()
    }
    want = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            "SELECT doc_id, q_tokens, q_keep FROM ("
            + prep.sql_quality_gopher("null_docs", "text", "doc_id")
            + ")"
        ).fetchall()
    }
    assert got == want
    assert got[1] == (None, None)

    rg = {r.doc_id: r.pii_email
          for r in prep.pii_redact(s, "text").df.collect()}
    rw = {r[0]: r[1] for r in duck.execute(
        "SELECT doc_id, pii_email FROM ("
        + prep.sql_pii_redact("null_docs", "text", "doc_id")
        + ")").fetchall()}
    assert rg == rw and rg[1] is None


def test_sample_weighted_extremes_and_determinism(ctx):
    rows = [(i, 0.0 if i < 20 else (1.0 if i < 40 else 0.5)) for i in range(120)]
    s = ctx.stream_iter(rows, "id long, w double")
    kept = [r.id for r in s.sample_weighted("id", "w").collect_vec()]
    # weight 0 never keeps, weight 1 always keeps
    assert not any(i < 20 for i in kept)
    assert all(i in kept for i in range(20, 40))
    # deterministic across replans/retries: same result every run
    kept2 = [r.id for r in s.sample_weighted("id", "w").collect_vec()]
    assert sorted(kept) == sorted(kept2)
    # out-of-range weights clamp instead of misbehaving
    s2 = ctx.stream_iter([(1, -3.0), (2, 7.0)], "id long, w double")
    got = {r.id for r in s2.sample_weighted("id", "w").collect_vec()}
    assert got == {2}


def test_sample_weighted_null_weight_never_keeps(ctx):
    s = ctx.stream_iter([(1, None), (2, 1.0)], "id long, w double")
    got = {r.id for r in s.sample_weighted("id", "w").collect_vec()}
    assert got == {2}


def test_sample_weighted_k_exact_count_and_weight_rules(ctx):
    """A-Res exact-k: exactly k rows; NULL/zero/negative weights never
    sample; k >= eligible rows returns all eligible; deterministic
    across partition layouts (no rand())."""
    rows = [(i, [0.5, None, 0.0, -1.0, 2.0][i % 5]) for i in range(50)]
    s = ctx.stream_iter(rows, "doc_id long, w double")
    out = s.sample_weighted_k("doc_id", "w", 10)
    got = sorted(r.doc_id for r in out.collect_vec())
    assert len(got) == 10
    assert all(i % 5 in (0, 4) for i in got)  # only positive weights

    # k larger than the eligible population -> all eligible rows
    all_out = s.sample_weighted_k("doc_id", "w", 10**6).collect_vec()
    assert sorted(r.doc_id for r in all_out) == [
        i for i in range(50) if i % 5 in (0, 4)
    ]

    # layout-independent: same sample after an adversarial repartition
    got2 = sorted(
        r.doc_id
        for r in ctx.from_df(s.df.repartition(7))
        .sample_weighted_k("doc_id", "w", 10)
        .collect_vec()
    )
    assert got2 == got

    # weight monotonicity (statistical sanity on a deterministic draw):
    # weight-2.0 rows should win far more of the 10 slots than weight-.5
    heavy = sum(1 for i in got if i % 5 == 4)
    assert heavy >= 6


def test_sample_weighted_k_stratified_quota_per_group(ctx):
    """Stratified A-Res: exactly k winners per stratum (fewer when the
    stratum is smaller), only positive-weight rows eligible, and the
    global and per-stratum forms agree on a single-stratum input."""
    rows = [(i, "g%d" % (i % 3), float(i % 7 + 1)) for i in range(60)]
    s = ctx.stream_iter(rows, "doc_id long, g string, w double")
    out = s.sample_weighted_k("doc_id", "w", 5, strata=["g"]).collect_vec()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.doc_id)
    assert set(by_g) == {"g0", "g1", "g2"}
    assert all(len(v) == 5 for v in by_g.values())

    one = [(i, "only", float(i + 1)) for i in range(10)]
    s1 = ctx.stream_iter(one, "doc_id long, g string, w double")
    a = sorted(r.doc_id for r in s1.sample_weighted_k("doc_id", "w", 4).collect_vec())
    b = sorted(
        r.doc_id
        for r in s1.sample_weighted_k("doc_id", "w", 4, strata=["g"]).collect_vec()
    )
    assert a == b


def test_split_sentences_semantics(ctx):
    """Terminators stay attached, multi-terminator runs close one
    sentence, punctuation-only and sub-min_chars fragments drop, NULL
    text emits nothing, sent_ix indexes KEPT sentences."""
    rows = [
        (1, "First one. Second?! Third has no end"),
        (2, "..."),            # punctuation only: no sentence
        (3, None),
        (4, "  ab. x. abcd!"), # 'x.' shorter than min_chars=3
        (5, ""),
    ]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "id long, text string"))
    got = sorted(
        (r.id, r.sent_ix, r.sentence)
        for r in s.split_sentences("id", "text", min_chars=3).collect_vec()
    )
    assert got == [
        (1, 0, "First one."),
        (1, 1, "Second?!"),
        (1, 2, "Third has no end"),
        (4, 0, "ab."),
        (4, 1, "abcd!"),
    ]


def test_split_sentences_matches_duckdb(ctx, duck):
    """Cross-engine parity on the raw documents table (single-sentence
    docs: no terminators in the synthetic text — the qa22 suite query
    covers injected terminators)."""
    from renoir_spark import prep

    s = ctx.stream_parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        (r.doc_id, r.sent_ix, r.sentence)
        for r in s.split_sentences("doc_id", "text").collect_vec()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            prep.sql_split_sentences("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want


def test_split_sentences_property_cross_engine(ctx):
    """Randomized terminator placement: Spark and DuckDB must split,
    trim, gate, and index identically (derandomized hypothesis)."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        import pytest as _pt
        _pt.skip("hypothesis unavailable")
    import duckdb

    from renoir_spark import prep

    piece = st.sampled_from(
        ["word", "ab", "x", " ", ".", "!", "?", "?!", "..", "é ño", "a.b"]
    )
    texts = st.lists(
        st.lists(piece, min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=10,
    )

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(docs=texts)
    def run(docs):
        df = ctx.spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "id long, text string"
        )
        got = sorted(
            (r.id, r.sent_ix, r.sentence)
            for r in prep.split_sentences(
                ctx.from_df(df), "id", "text", min_chars=2
            ).df.collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?,?)",
                        [(i, t) for i, t in enumerate(docs)])
        want = sorted(tuple(r) for r in con.execute(
            prep.sql_split_sentences("t", "id", "text", min_chars=2)
        ).fetchall())
        assert got == want

    run()


def test_sentence_dedup_first_occurrence_and_reassembly(ctx):
    """First (doc, position) copy of a normalized sentence survives;
    later copies (even case/whitespace variants) are cut; documents
    rebuild in order; an all-duplicate doc reassembles to ''."""
    rows = [
        (1, "Common header. Unique body one. Tail!"),
        (2, "COMMON   header. Unique body two."),   # variant of doc 1's header
        (3, "common header."),                      # nothing of its own
        (4, None),
    ]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "id long, text string"))
    got = {r.id: (r.clean_text, r.n_sents, r.n_dropped)
           for r in s.sentence_dedup("id", "text").collect_vec()}
    assert got == {
        1: ("Common header. Unique body one. Tail!", 3, 0),
        2: ("Unique body two.", 2, 1),
        3: ("", 1, 1),
    }  # doc 4 (NULL) emits no row


def test_split_long_docs_windows(ctx):
    """Window starts advance by stride with the LAST window clamped to
    end at the doc end (always full-length); short docs emit one
    window; NULL text emits nothing; bad dials raise."""
    import pytest
    import duckdb

    from renoir_spark import prep

    rows = [
        (1, "a b c d e f g h i j"),                       # 10 toks
        (2, "x Y z"),                                     # casing preserved
        (3, None),
        (4, "   "),                                       # whitespace-only
        (5, " ".join(f"t{i}" for i in range(23))),        # 23 toks
        (6, ""),                                          # empty
    ]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "id long, text string"))
    got = sorted(
        (r.id, r.win_ix, r.win_start, r.win_text)
        for r in prep.split_long_docs(
            s, "id", "text", max_tokens=8, stride=5
        ).df.collect()
    )
    assert [(g[0], g[2]) for g in got] == [
        (1, 1), (1, 3),                  # 10 toks: start 6 clamps to 3
        (2, 1),
        (5, 1), (5, 6), (5, 11), (5, 16),  # 23 toks: last clamps to 16
    ]  # NULL (3), whitespace-only (4), and empty (6) emit nothing
    assert all(len(g[3].split()) == 8 for g in got if g[0] in (1, 5))
    assert got[2][3] == "x Y z"          # original casing preserved
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        prep.sql_split_long_docs("t", "id", "text", max_tokens=8, stride=5)
    ).fetchall())
    assert got == want

    with pytest.raises(ValueError):
        prep.split_long_docs(s, "id", "text", max_tokens=0)
    with pytest.raises(ValueError):
        prep.split_long_docs(s, "id", "text", max_tokens=8, stride=9)


def test_split_long_docs_coverage_property(ctx):
    """Randomized (n, max, stride): every token index is covered by at
    least one window, window starts strictly increase, and every window
    of a long doc is exactly max tokens (derandomized hypothesis)."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        import pytest as _pt
        _pt.skip("hypothesis unavailable")

    from renoir_spark import prep

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(
        n=st.integers(min_value=1, max_value=60),
        m=st.integers(min_value=2, max_value=16),
        frac=st.floats(min_value=0.25, max_value=1.0),
    )
    def run(n, m, frac):
        stride = max(1, int(m * frac))
        text = " ".join(f"t{i}" for i in range(n))
        df = ctx.spark.createDataFrame([(1, text)], "id long, text string")
        wins = sorted(
            (r.win_ix, r.win_start, r.win_text)
            for r in prep.split_long_docs(
                ctx.from_df(df), "id", "text",
                max_tokens=m, stride=stride,
            ).df.collect()
        )
        starts = [w[1] for w in wins]
        assert starts == sorted(set(starts))            # strictly increasing
        covered = set()
        for _, s, txt in wins:
            toks = txt.split()
            if n > m:
                assert len(toks) == m                   # always full-length
            covered.update(range(s, s + len(toks)))
        assert covered == set(range(1, n + 1))          # every token seen
        assert wins[-1][1] + len(wins[-1][2].split()) - 1 == n  # tail hits end

    run()
