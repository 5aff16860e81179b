"""Physical-plan regression tests — the 100 TB design properties the
suite queries rely on, asserted against the EXECUTED plan string so a
refactor that silently reintroduces a cartesian product, loses a
broadcast, or stops pushing filters into the parquet scan fails CI, not
the cluster. (SURVEY.md §4: pushdown/pruning/broadcast are the plan
features Catalyst gives a declarative graph for free.)"""

import pytest

from renoir_spark import suite

SF = "/root/testdata/sf0.001"


def _plan(ctx, name: str) -> str:
    df = suite.QUERIES[name](ctx.spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_and_pruning_reach_the_scan(ctx):
    plan = _plan(ctx, "q01_pricing_summary")
    scan = next(
        l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l
    )
    # shipdate predicate pushed into the scan, unused wide columns pruned
    assert "l_shipdate" in scan
    assert "l_comment" not in scan and "l_orderkey" not in scan


def test_q05_broadcast_chain_never_shuffles_the_fact_table(ctx):
    plan = _plan(ctx, "q05_broadcast_chain")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q11_interval_join",
        "q28_dedup_minhash",
        "q33_dedup_simhash",
        "q34_ngram_jaccard",
        "q35_dedup_embedding",
        "q32_ann_lsh",
        "q50_ann_ivf",
        "q64_ann_lsh_multi",
        "q83_dedup_cluster",
        "q84_duplicate_spans",
        "q85_chunk_dedup",
        "q86_asof_join",
        "q88_dedup_embedding_ivf",
    ],
)
def test_no_cartesian_or_nested_loop_in_bucketed_operators(ctx, name):
    """Every dedup/similarity/band operator promises candidate
    generation via equi-joins on bucket keys — a cartesian product or
    nested-loop join in the plan means the bucketing silently stopped
    working."""
    plan = _plan(ctx, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q09_wordcount_parallelizes_the_single_file_scan(ctx):
    """The documents table is one small parquet file (one input split);
    tokenization must run AFTER a repartition or one task does all the
    work at any scale (round-1 verdict: 7.8 s -> 84 s tail)."""
    plan = _plan(ctx, "q09_wordcount")
    assert "RoundRobinPartitioning" in plan


def test_interval_join_band_is_residual_on_equi_join(ctx):
    """The band predicate must ride an equi-join (bucket + key), never a
    join-free theta filter."""
    plan = _plan(ctx, "q11_interval_join")
    assert "__bucket" in plan
    assert "CartesianProduct" not in plan


def test_q64_signatures_are_one_arrow_pass(ctx):
    """Multi-table LSH signatures must come from the vectorized
    mapInPandas stage (flat in n_tables), not per-row HOF expression
    dots (linear, measured 6.1 s), and never macro-expanded expressions
    (measured 10x worse)."""
    plan = _plan(ctx, "q64_ann_lsh_multi")
    assert "MapInPandas" in plan


def test_nexmark_winning_bids_broadcasts_the_auction_side(ctx):
    """q65/q66: the auction relation is one row per auction id — it must
    broadcast so the bid stream never shuffles for the join."""
    plan = _plan(ctx, "q65_nexmark_winning_bids")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_nexmark_item_suggestion_broadcasts_persons(ctx):
    plan = _plan(ctx, "q68_nexmark_item_suggestion")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nexmark_hot_items_is_two_hash_aggregates(ctx):
    """q61's chained argmax must stay aggregation-shaped: no sort to
    pick the per-window winner, no join between the two levels."""
    plan = _plan(ctx, "q61_nexmark_hot_items")
    assert "HashAggregate" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_q86_asof_is_one_window_pass_not_a_range_join(ctx):
    """asof_join promises union + ONE window pass — a refactor that
    degrades it to a per-key range join would show up as a second join
    (beyond the right side's pre-aggregation) or a cartesian."""
    plan = _plan(ctx, "q86_asof_join")
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1
    # no join operator at all: the match is carried by the window frame
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan, j


def test_running_sum_chunked_plan_shape(ctx):
    """The skew-proof running_sum promises: a range exchange splits hot
    keys across chunks, the carry re-attach is a null-safe equi-join
    (never a cartesian/nested loop), and no forced broadcast hint (AQE
    must stay free to hash-join a billion-key carry relation)."""
    from pyspark.sql import functions as F

    s = ctx.stream_iter(
        [(i % 3, i, float(i)) for i in range(100)], "k int, o long, v double"
    ).key_by("k")
    df = s.running_sum("o", partitions=4, cum=F.col("v")).df
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    s_null = ctx.stream_iter(
        [(None, 1, 1.0), (None, 2, 1.0)], "k int, o long, v double"
    ).key_by("k")
    out = {r.o: r.cum for r in
           s_null.running_sum("o", partitions=2, cum=F.col("v")).collect_vec()}
    assert out == {1: 1.0, 2: 2.0}


def test_qa36_diff_prunes_and_pushes_into_both_scans(ctx):
    """corpus_diff's 100 TB promise in the plan: each snapshot scan reads
    ONLY id + content columns (the hash replaces the row before the
    shuffle) and the snapshot predicates reach the parquet scan as
    DataFilters — a diff that read unused columns or filtered after the
    scan would drag the whole corpus through the join."""
    plan = _plan(ctx, "qa36_corpus_diff")
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert len(scans) == 2
    for s in scans:
        assert "n_chars" not in s  # unused wide column pruned
        assert "doc_id" in s and "text" in s
    joined = " ".join(scans)
    assert "% 7)" in joined and "% 11)" in joined  # pushed snapshot filters


def test_qa37_overlap_is_one_grouped_pass(ctx):
    """The round-7 rewrite, pinned: no join of distinct-key sets, no
    cross join — one union, one group shuffle, a 1-row aggregate; scans
    prune to (doc_id, text) with the slice predicates pushed."""
    plan = _plan(ctx, "qa37_corpus_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert len(scans) == 2
    for s in scans:
        assert "n_chars" not in s and "lang" not in s
        assert "% 3)" in s  # slice predicate pushed into the scan
