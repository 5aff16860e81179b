"""Property-based tests (hypothesis) — randomized inputs against brute
Python references, the reference crate's proptest-style strategy
(SURVEY.md §5). Each property runs a handful of examples (Spark jobs are
~0.5 s each); shrinking still localizes failures to minimal inputs."""

import pytest

# Round-11 test-budget tier (see pytest.ini): this module is the
# slow tier — excluded from the default (driver-budgeted) run,
# executed with `pytest -m "" tests/` before every baseline refresh.
pytestmark = pytest.mark.slow
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SLOW = settings(max_examples=8, deadline=None, derandomize=True)


short_floats = st.lists(
    st.integers(min_value=0, max_value=500), min_size=1, max_size=25
)


@SLOW
@given(
    left=short_floats,
    right=short_floats,
    lower=st.integers(min_value=0, max_value=20),
    upper=st.integers(min_value=0, max_value=20),
)
def test_interval_join_inner_equals_bruteforce(ctx, left, right, lower, upper):
    """Bucketed interval_join == brute-force band filter: every (l, r)
    pair with r in [l - lower, l + upper] appears exactly once."""
    l_rows = [(i, float(t)) for i, t in enumerate(left)]
    r_rows = [(j, float(t)) for j, t in enumerate(right)]
    sl = ctx.stream_iter(l_rows, "lid long, lts double")
    sr = ctx.stream_iter(r_rows, "rid long, rts double")
    out = sl.interval_join(
        sr, left_ts=F.timestamp_seconds("lts"), right_ts=F.timestamp_seconds("rts"),
        lower=float(lower), upper=float(upper),
    )
    got = sorted((r.lid, r.rid) for r in out.df.select("lid", "rid").collect())
    want = sorted(
        (i, j)
        for i, lt in enumerate(left)
        for j, rt in enumerate(right)
        if lt - lower <= rt <= lt + upper
    )
    assert got == want


@SLOW
@given(
    n=st.integers(min_value=1, max_value=40),
    size=st.integers(min_value=1, max_value=6),
    slide=st.integers(min_value=1, max_value=8),
)
def test_count_window_matches_python_reference(ctx, n, size, slide):
    """CountWindow sliding (any size/slide combination, INCLUDING
    slide > size gaps — count.rs:112-124 allows it): per-window sums
    must equal the positional Python reference; gap elements belong to
    no window."""
    from renoir_spark.window import CountWindow

    rows = [(0, i, float(i * 7 % 13)) for i in range(n)]
    s = ctx.stream_iter(rows, "k long, pos long, v double")
    out = (
        s.key_by("k")
        .window(CountWindow.sliding("pos", size=size, slide=slide, exact=True))
        .fold(total=F.sum("v"))
        .df.collect()
    )
    got = {(r.window_id, r.total) for r in out}

    vals = [float(i * 7 % 13) for i in range(n)]
    want = set()
    w = 0
    while w * slide + size <= n:  # exact=True drops partial tails
        want.add((w, sum(vals[w * slide : w * slide + size])))
        w += 1
    assert got == want


@SLOW
@given(xs=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=30))
def test_zip_matches_python_zip(ctx, xs):
    """Distributed zip (global index join) == Python zip of the two
    order-sorted sequences, truncated to the shorter side."""
    a_rows = [(i, x) for i, x in enumerate(xs)]
    b_rows = [(i, x * 2) for i, x in enumerate(xs[: max(1, len(xs) // 2)])]
    sa = ctx.stream_iter(a_rows, "ia long, va long")
    sb = ctx.stream_iter(b_rows, "ib long, vb long")
    z = sa.zip(sb, order=["ia"], other_order=["ib"])
    got = sorted((r.va, r.vb) for r in z.df.select("va", "vb").collect())
    want = sorted(
        (x, y) for x, y in zip(xs, [x * 2 for x in xs[: max(1, len(xs) // 2)]])
    )
    assert got == want


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=12), min_size=1, max_size=15
    )
)
def test_dedup_exact_properties(ctx, texts):
    """dedup_exact: output ids are a subset keeping the SMALLEST id per
    normalized text, and the operator is idempotent."""
    rows = [(i, t) for i, t in enumerate(texts)]
    s = ctx.stream_iter(rows, "doc_id long, text string")
    out = s.dedup_exact("text", order=["doc_id"])
    got = sorted(r.doc_id for r in out.df.select("doc_id").collect())

    def norm(t):
        return " ".join(t.split()).lower()

    first = {}
    for i, t in enumerate(texts):
        first.setdefault(norm(t), i)
    assert got == sorted(first.values())
    again = sorted(
        r.doc_id
        for r in out.dedup_exact("text", order=["doc_id"]).df.select("doc_id").collect()
    )
    assert again == got


@SLOW
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=99), min_size=1, max_size=30
    ),
    commit_at=st.integers(min_value=1, max_value=9),
    discard_at=st.integers(min_value=90, max_value=99),
)
def test_transaction_window_matches_python_reference(
    ctx, vals, commit_at, discard_at
):
    """Batch TransactionWindow (transaction.rs:52-122) vs a pure-Python
    simulator: commit closes the window INCLUDING the element, discard
    drops it without output, ids stay monotonic, uncommitted tails are
    still emitted by the batch form (stream-end flush)."""
    from renoir_spark.window import TransactionWindow

    def logic(row, _state):
        if row["v"] % 10 == commit_at % 10:
            return "commit"
        if row["v"] == discard_at:
            return "discard"
        return "continue"

    rows = [(0, i, v) for i, v in enumerate(vals)]
    s = ctx.stream_iter(rows, "k long, pos long, v long")
    out = (
        s.key_by("k")
        .window(TransactionWindow("pos", logic))
        .fold(n=F.count(F.lit(1)), total=F.sum("v"))
        .df.collect()
    )
    got = {(r.window_id, r.n, r.total) for r in out}

    want, buf, wid = set(), [], 0
    for v in vals:
        action = logic({"v": v}, None)
        buf.append(v)
        if action == "commit":
            want.add((wid, len(buf), sum(buf)))
            wid, buf = wid + 1, []
        elif action == "discard":
            wid, buf = wid + 1, []
    if buf:
        want.add((wid, len(buf), sum(buf)))  # stream-end flush
    assert got == want


@SLOW
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
)
def test_asof_join_equals_pandas_merge_asof(ctx, left, right, tol):
    """asof_join (union + window pass) == pandas merge_asof, an
    INDEPENDENT reference implementation: per key, each left row takes
    the newest right value at-or-before its ts (within tolerance)."""
    import pandas as pd

    # unique right (key, ts) so the match is well-defined in both engines
    rd = {}
    for k, t in right:
        rd[(k, t)] = float(k * 1000 + t)
    r_rows = [(k, float(t), v) for (k, t), v in sorted(rd.items())]
    l_rows = [(i, k, float(t)) for i, (k, t) in enumerate(left)]

    sl = ctx.stream_iter(l_rows, "lid long, k long, ts double")
    sr = ctx.stream_iter(r_rows, "k long, ts double, rv double")
    out = sl.asof_join(
        sr, left_ts=F.timestamp_seconds("ts"), right_ts=F.timestamp_seconds("ts"),
        on=["k"], tolerance=None if tol is None else float(tol),
    )
    got = {r.lid: r.rv for r in out.df.select("lid", "rv").collect()}

    lp = pd.DataFrame(l_rows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(r_rows, columns=["k", "ts", "rv"]).sort_values("ts")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward",
        tolerance=None if tol is None else float(tol),
    )
    want = {
        int(row.lid): (None if pd.isna(row.rv) else float(row.rv))
        for row in merged.itertuples()
    }
    assert got == want


@SLOW
@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=32),
        min_size=1, max_size=60,
    ),
    p=st.integers(min_value=0, max_value=100),
)
def test_group_by_quantiles_equals_numpy(ctx, xs, p):
    """Exact grouped percentile == numpy's 'linear' interpolation — the
    shared definition that also makes it bit-match DuckDB quantile_cont
    (oracle q87)."""
    import numpy as np

    s = ctx.stream_iter([(1, float(x)) for x in xs], "g long, x double")
    [row] = s.group_by_quantiles("g", "x", {"q": p / 100.0}).collect_vec()
    want = float(np.percentile(np.array(xs, dtype=np.float64), p,
                               method="linear"))
    assert row.q == pytest.approx(want, rel=1e-12, abs=1e-9)


@SLOW
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=12), min_size=1, max_size=120
    ),
    k=st.integers(min_value=1, max_value=5),
    capacity=st.integers(min_value=2, max_value=16),
)
def test_heavy_hitters_always_exact(ctx, keys, k, capacity):
    """heavy_hitters is EXACT for any capacity: the sketch path only
    answers when the exactness check holds, otherwise the fallback
    aggregation does — either way the result equals the brute top-k
    with (count desc, key asc) tie-breaks."""
    import collections

    s = ctx.stream_iter([(x,) for x in keys], "k long").shuffle()
    got = [
        (r.k, r.cnt)
        for r in s.heavy_hitters("k", k, capacity=capacity).collect_vec()
    ]
    cnt = collections.Counter(keys)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from([None, 1, 2]),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t,
    ),
    parts=st.integers(min_value=1, max_value=6),
)
def test_running_sum_chunked_equals_window(ctx, rows, parts):
    """The skew-proof chunked running_sum equals the plain window form
    for any partition count, including NULL keys (which are a real
    group) — integer values keep both paths exact."""
    data = [(k, o, o + 1) for k, o in rows]
    s = ctx.from_df(
        ctx.spark.createDataFrame(data, "k int, o long, v long")
    ).key_by("k")
    a = {(r.k, r.o): r.cum
         for r in s.running_sum("o", partitions=parts,
                                cum=F.col("v")).collect_vec()}
    b = {(r.k, r.o): r.cum
         for r in s.running_sum("o", skew_proof=False,
                                cum=F.col("v")).collect_vec()}
    assert a == b


@SLOW
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-20, max_value=20),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=12,
    )
)
def test_ann_sq8_full_rerank_equals_brute_random(ctx, vecs):
    """SQ8 with rerank >= corpus must equal brute force on ANY corpus —
    including negative values, constant dimensions (scale-0 codec
    branch) and duplicate vectors (tie-break by id on equal cosines)."""
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = ctx.stream_iter(rows, "vec_id long, embedding array<double>")
    queries = ctx.stream_iter(rows[:2], "vec_id long, embedding array<double>")

    def key(r):
        d = r.asDict()
        return (d["qid"], d["vec_id"], d["cos"], d["rank"])

    brute = sorted(
        map(key, corpus.ann_cosine(queries, method="brute", k=3).collect_vec())
    )
    sq8 = sorted(
        map(
            key,
            corpus.ann_cosine(
                queries, method="sq8", k=3, rerank=10**6, dim=3
            ).collect_vec(),
        )
    )
    assert sq8 == brute


@settings(max_examples=5, deadline=None, derandomize=True)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0, max_size=8,
        ).map(" ".join),
        min_size=1, max_size=8,
    )
)
def test_streaming_minhash_parity_random(ctx, docs):
    """Streaming MinHash dedup == batch greedy rule on random corpora
    (including empty texts, exact duplicates, sub-shingle-length docs)
    when event-time order matches id order and the delay covers all."""
    from datetime import datetime, timezone

    from renoir_spark.streaming import (
        dedup_minhash_stream,
        minhash_survivors,
        run_to_completion,
    )

    t0 = datetime.fromtimestamp(1000, tz=timezone.utc).replace(tzinfo=None)
    ch = ctx.stream_channel("doc_id long, ts timestamp, text string")
    half = max(1, len(docs) // 2)
    ch.push([(i, t0, t) for i, t in enumerate(docs[:half])])
    if docs[half:]:
        ch.push([(i + half, t0, t) for i, t in enumerate(docs[half:])])
    verdicts = dedup_minhash_stream(
        ch.stream(max_files_per_trigger=1), "text", "doc_id",
        ts_col="ts", delay="1 hour", threshold=0.5,
    )
    rows = run_to_completion(verdicts.df, output_mode="append")
    bounded = ctx.from_df(ctx.spark.createDataFrame(rows, verdicts.df.schema))
    got = {r.doc_id for r in minhash_survivors(bounded, "doc_id").collect_vec()}

    batch = ctx.from_df(
        ctx.spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
    ).dedup_minhash("text", "doc_id", threshold=0.5)
    assert got == {r.doc_id for r in batch.collect_vec()}


# ------------------------------------------------------------------ #
# round-4 operators: randomized Spark-vs-DuckDB differential sweeps
# ------------------------------------------------------------------ #

_TOKENS = ["data", "spark", "merge", "the", "a", "é", "日本", "x!",
           "loss", "train"]

_doc_text = st.lists(
    st.sampled_from(_TOKENS), min_size=0, max_size=8
).map(" ".join)


def _duck_docs(rows):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, g VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    return con


@SLOW
@given(
    texts=st.lists(_doc_text, min_size=2, max_size=14),
    threshold=st.sampled_from([0.5, 0.7, 0.9]),
)
def test_dedup_index_matches_sql_mirror(ctx, tmp_path_factory, texts,
                                        threshold):
    """Persisted-index batch dedup == the flat cross-corpus SQL mirror
    on arbitrary corpora (unicode tokens, empty docs, exact dups)."""
    from renoir_spark.dedup_index import sql_dedup_index_batch

    rows = [(i, t, "x") for i, t in enumerate(texts)]
    spark = ctx.spark
    s = ctx.from_df(
        spark.createDataFrame(rows, "doc_id long, text string, g string")
    )
    corpus, batch = s.filter("doc_id % 2 = 0"), s.filter("doc_id % 2 = 1")
    path = str(tmp_path_factory.mktemp("pidx") / "i")
    corpus.dedup_index_build(path, text_col="text", id_col="doc_id",
                             bucket_dirs=4)
    surv = ctx.dedup_index(path).dedup_batch(batch, threshold=threshold)
    got = sorted(r.doc_id for r in surv.df.collect())

    con = _duck_docs(rows)
    want = sorted(r[0] for r in con.execute(sql_dedup_index_batch(
        "(SELECT * FROM d WHERE doc_id % 2 = 0)",
        "(SELECT * FROM d WHERE doc_id % 2 = 1)",
        "text", "doc_id", "doc_id", threshold=threshold)).fetchall())
    assert got == want


@SLOW
@given(texts=st.lists(_doc_text, min_size=1, max_size=14))
def test_dsir_weights_match_sql_mirror(ctx, texts):
    from renoir_spark.prep import sql_dsir_weights

    rows = [(i, t, "t" if i % 3 == 0 else "r") for i, t in enumerate(texts)]
    s = ctx.from_df(
        ctx.spark.createDataFrame(rows, "doc_id long, text string, g string")
    )
    got = sorted(
        (r.doc_id, r.dsir_logw)
        for r in s.dsir_weights(s.filter("g = 't'"), "text", "doc_id",
                                n_buckets=64).df.collect()
    )
    con = _duck_docs(rows)
    want = sorted(con.execute(sql_dsir_weights(
        "d", "(SELECT * FROM d WHERE g = 't')", "text", "doc_id",
        n_buckets=64)).fetchall())
    assert got == want


@SLOW
@given(
    texts=st.lists(_doc_text, min_size=2, max_size=14),
    labels=st.lists(st.sampled_from(["a", "b", "c"]), min_size=2,
                    max_size=14),
)
def test_nb_classify_matches_sql_mirror(ctx, texts, labels):
    from renoir_spark.prep import sql_nb_classify

    rows = [(i, t, labels[i % len(labels)]) for i, t in enumerate(texts)]
    s = ctx.from_df(
        ctx.spark.createDataFrame(rows, "doc_id long, text string, g string")
    )
    got = sorted(
        (r.doc_id, r.pred, r.score)
        for r in s.filter("doc_id % 2 = 1")
        .nb_classify(s.filter("doc_id % 2 = 0"), "text", "doc_id", "g",
                     n_buckets=64).df.collect()
    )
    con = _duck_docs(rows)
    want = sorted(con.execute(sql_nb_classify(
        "(SELECT * FROM d WHERE doc_id % 2 = 1)",
        "(SELECT * FROM d WHERE doc_id % 2 = 0)",
        "text", "doc_id", "g", n_buckets=64)).fetchall())
    assert got == want


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="abc XY.,\t", min_size=0, max_size=30),
        min_size=2, max_size=12,
    ),
    t=st.sampled_from([0.5, 0.8, 1.0]),
    n=st.sampled_from([1, 2]),
)
def test_containment_pairs_equals_bruteforce(ctx, texts, t, n):
    """containment_pairs_exact over arbitrary messy text (case, mixed
    whitespace, punctuation-in-words, empty docs) equals the directed
    brute-force answer — the prefix/positional filters must be lossless
    at every threshold including exact containment t=1."""
    rows = [(i, txt) for i, txt in enumerate(texts)]
    got = {
        (r.inner_id, r.outer_id): r.containment
        for r in ctx.stream_iter(rows, "doc_id long, text string")
        .containment_pairs_exact("text", "doc_id", shingle_n=n, threshold=t)
        .collect_vec()
    }

    def shingles(text):
        toks = " ".join(text.split()).lower().split(" ")
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sh = {i: shingles(txt) for i, txt in rows}
    want = {}
    for a in sh:
        for b in sh:
            if a == b:
                continue
            c = round(len(sh[a] & sh[b]) / len(sh[a]), 6)
            if c >= t:
                want[(a, b)] = c
    assert got == want


@SLOW
@given(
    ids=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                 min_size=1, max_size=40, unique=True),
    seed=st.sampled_from([0, 7]),
    epoch=st.sampled_from([0, 3]),
    parts=st.sampled_from([1, 7]),
)
def test_epoch_shuffle_equals_python_permutation(ctx, ids, seed, epoch,
                                                 parts):
    """epoch_shuffle's distributed zipWithIndex equals the pure-Python
    rank in (md5_int31(seed|epoch|id), id) order for arbitrary unique
    ids (negative, huge) under any input partitioning — the
    range-partition offsets must rebuild the exact global permutation,
    never just *a* permutation."""
    import hashlib

    P = 2_147_483_647

    def h(i):
        s = f"es{seed}e{epoch}|{i}"
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P

    want = {
        i: pos + 1
        for pos, i in enumerate(sorted(ids, key=lambda i: (h(i), i)))
    }
    df = ctx.spark.createDataFrame([(i,) for i in ids], "id long") \
        .repartition(parts)
    got = {
        r.id: r.shuffle_pos
        for r in ctx.from_df(df)
        .epoch_shuffle("id", seed=seed, epoch=epoch).collect_vec()
    }
    assert got == want
