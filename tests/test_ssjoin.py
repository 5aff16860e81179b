"""Exact set-similarity join (datapipe.similar_pairs_exact).

The contract is EXACTNESS: the prefix filter must be lossless, so every
test compares against plain brute force (DuckDB all-pairs or an
in-Python reference). Randomized corpora + multiple thresholds sweep
the prefix-length arithmetic (the ⌈t·n⌉ float-fuzz corner) harder than
any fixed corpus could."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from renoir_spark import datapipe


def _run(ctx, rows, *, shingle_n, threshold):
    df = ctx.spark.createDataFrame(rows, "id long, text string")
    out = datapipe.similar_pairs_exact(
        ctx.from_df(df), "text", "id",
        shingle_n=shingle_n, threshold=threshold,
    ).df.collect()
    return sorted((r.ida, r.idb, r.jaccard) for r in out)


def _brute(rows, *, shingle_n, threshold):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    sql = datapipe.sql_similar_pairs_exact(
        "t", "text", "id", shingle_n=shingle_n, threshold=threshold
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_planted_pairs_exact_values(ctx):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # 1 gram diff
        (3, "completely different words in this sentence here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    got = _run(ctx, rows, shingle_n=3, threshold=0.3)
    assert got == _brute(rows, shingle_n=3, threshold=0.3)
    by_pair = {(a, b): j for a, b, j in got}
    assert by_pair[(1, 4)] == 1.0          # exact duplicate
    assert (1, 2) in by_pair               # near duplicate found
    assert not any(3 in p for p in by_pair)  # unrelated doc pairs with no one


def test_threshold_one_finds_only_exact_dups(ctx):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma delta zeta"),
    ]
    got = _run(ctx, rows, shingle_n=2, threshold=1.0)
    assert got == [(1, 2, 1.0)]


@pytest.mark.parametrize("threshold", [0.3, 0.4, 0.5, 0.7, 0.9])
def test_lossless_vs_brute_on_random_corpus(ctx, threshold):
    # clustered vocabulary → plenty of borderline-similar pairs, and
    # doc lengths 1..12 words stress the ⌈t·n⌉ prefix arithmetic at
    # every small n (0.4·5, 0.3·10 … the float-fuzz corners)
    rng = random.Random(20260815 + int(threshold * 10))
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        base = rng.randrange(6)
        n = rng.randint(1, 12)
        words = [vocab[(base * 5 + rng.randrange(8)) % 30] for _ in range(n)]
        rows.append((i, " ".join(words)))
    got = _run(ctx, rows, shingle_n=3, threshold=threshold)
    want = _brute(rows, shingle_n=3, threshold=threshold)
    assert got == want, f"t={threshold}: {len(got)} vs {len(want)} pairs"


def test_plan_has_no_cartesian(ctx):
    df = ctx.stream_parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        datapipe.similar_pairs_exact(
            df.map("doc_id", "text"), "text", "doc_id",
            shingle_n=5, threshold=0.5,
        )
        .df._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "pythonUDF" not in plan.lower()


def test_short_and_empty_docs_survive(ctx):
    rows = [
        (1, "one"),            # shorter than shingle_n → whole-text shingle
        (2, "one"),
        (3, ""),               # empty → '' shingle
        (4, ""),
        (5, "one two three four"),
    ]
    got = _run(ctx, rows, shingle_n=3, threshold=0.5)
    assert got == _brute(rows, shingle_n=3, threshold=0.5)
    assert (1, 2, 1.0) in got and (3, 4, 1.0) in got
