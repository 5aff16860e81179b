"""Budget / quantile data selection (prep.take_token_budget,
prep.filter_by_score_quantile). Suite qa19/qa20 cover corpus-scale
parity; these pin the boundary semantics (exact fit vs first overflow,
inclusive quantile bounds, NULL handling) and the approx path."""

import pytest
from pyspark.sql import functions as F

from renoir_spark import prep


def _docs(ctx, rows):
    return ctx.from_df(
        ctx.spark.createDataFrame(rows, "id long, ntok long")
    )


def test_budget_exact_fit_and_overflow_cut(ctx):
    rows = [(1, 400), (2, 300), (3, 200), (4, 100)]
    s = _docs(ctx, rows)
    order = F.struct(F.col("id").alias("p"))
    out = {r.id: r.cum_tokens
           for r in prep.take_token_budget(s, "ntok", 900, order=order)
           .df.collect()}
    # 400+300+200 = 900 fits exactly; 4 would overflow (1000 > 900)
    assert out == {1: 400, 2: 700, 3: 900}
    out2 = {r.id for r in prep.take_token_budget(s, "ntok", 899, order=order)
            .df.collect()}
    assert out2 == {1, 2}  # 900 > 899: the crossing row is cut


def test_budget_priority_order_and_nulls(ctx):
    rows = [(1, 500), (2, None), (3, 100), (4, 300)]
    s = _docs(ctx, rows)
    # smallest-first priority: 3 (100), 4 (400), 1 (900)
    order = F.struct(F.col("ntok").alias("p"), F.col("id").alias("t"))
    kept = {r.id: r.cum_tokens
            for r in prep.take_token_budget(s, "ntok", 400, order=order)
            .df.collect()}
    assert kept == {3: 100, 4: 400}  # NULL-ntok row 2 dropped up front


def test_budget_zero_keeps_nothing(ctx):
    s = _docs(ctx, [(1, 10)])
    order = F.struct(F.col("id").alias("p"))
    assert prep.take_token_budget(s, "ntok", 0, order=order).df.count() == 0


def test_quantile_band_inclusive_bounds(ctx):
    rows = [(i, float(i)) for i in range(1, 11)]  # scores 1..10
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "id long, score double"))
    kept = sorted(
        r.id for r in prep.filter_by_score_quantile(s, "score", 0.25, 0.75)
        .df.collect()
    )
    # quantile_cont(0.25) = 3.25, (0.75) = 7.75 → scores 4..7 survive
    assert kept == [4, 5, 6, 7]
    # degenerate band keeps exactly the interpolated-median matches
    kept_all = sorted(
        r.id for r in prep.filter_by_score_quantile(s, "score", 0.0, 1.0)
        .df.collect()
    )
    assert kept_all == list(range(1, 11))


def test_quantile_band_null_scores_dropped(ctx):
    rows = [(1, 1.0), (2, None), (3, 2.0), (4, 3.0)]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "id long, score double"))
    kept = sorted(
        r.id for r in prep.filter_by_score_quantile(s, "score", 0.0, 1.0)
        .df.collect()
    )
    assert kept == [1, 3, 4]


def test_quantile_band_approx_path(ctx):
    rows = [(i, float(i % 100)) for i in range(2000)]
    s = ctx.from_df(ctx.spark.createDataFrame(rows, "id long, score double"))
    exact = prep.filter_by_score_quantile(s, "score", 0.1, 0.9).df.count()
    approx = prep.filter_by_score_quantile(
        s, "score", 0.1, 0.9, exact=False, accuracy=10000
    ).df.count()
    assert abs(exact - approx) <= 0.02 * 2000


def test_budget_plan_has_no_global_single_partition_window(ctx):
    s = ctx.stream_parquet("/root/testdata/sf0.001/documents.parquet").map(
        "doc_id", ntok=F.length("text").cast("long")
    )
    order = F.struct((-F.col("ntok")).alias("p"), F.col("doc_id").alias("t"))
    out = prep.take_token_budget(s, "ntok", 10000, order=order)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    # every window over the DATA must be per range-chunk (__pid in its
    # partition spec); the only window without __pid is the carry
    # prefix over the ≤P-row per-chunk-totals relation (keyed __bk) —
    # nothing serializes the corpus through one task
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window operators in the chunked-scan plan"
    for spec in specs:
        assert "__pid" in spec or "__bk" in spec, (
            f"unexpected global window partition spec: {spec}"
        )
