"""Storage-layout scale primitives: hive-partitioned writes (partition
pruning at file-listing time) and bucketed tables (write-once hash
layout → shuffle-free joins/aggs). These are the knobs a 100 TB
deployment uses so the EXPENSIVE side of a join/scan never moves; the
tests assert the resulting physical plans, not just the data."""

import pytest
from pyspark.sql import functions as F


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events(ctx, sf_dir):
    from renoir_spark.suite import _t

    return _t(ctx, sf_dir, "events")


def test_partitioned_write_prunes_at_listing(ctx, events, tmp_path):
    out = str(tmp_path / "events_by_type")
    events.write_parquet(out, partition_by=["event_type"])

    back = ctx.stream_parquet(out).filter("event_type = 'click'")
    plan = _executed(back.df)
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # the predicate lands in PartitionFilters (pruned directory listing),
    # NOT as a row-level data filter over every file
    assert "PartitionFilters" in scan and "event_type" in scan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    n = back.collect_count()
    assert n == events.filter("event_type = 'click'").collect_count()
    # partition column round-trips (moved to directory names and back)
    assert set(back.df.columns) == set(events.df.columns)


def test_partitioned_write_roundtrip_values(ctx, events, tmp_path):
    out = str(tmp_path / "events_part_rt")
    events.map("event_id", "event_type", "value").write_parquet(
        out, partition_by=["event_type"]
    )
    back = ctx.stream_parquet(out).df
    a = sorted((r.event_id, r.event_type) for r in back.collect())
    b = sorted(
        (r.event_id, r.event_type)
        for r in events.map("event_id", "event_type").collect_vec()
    )
    assert a == b


def test_bucketed_join_is_shuffle_free(ctx, tmp_path):
    spark = ctx.spark
    n = 10_000
    left = ctx.from_df(
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("a")
        )
    )
    right = ctx.from_df(
        spark.range(0, n, 2).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("b")
        )
    )
    left.write_table_bucketed(
        "t_bleft", by=["k"], num_buckets=8, sort_by=["k"],
        path=str(tmp_path / "bleft"),
    )
    right.write_table_bucketed(
        "t_bright", by=["k"], num_buckets=8, sort_by=["k"],
        path=str(tmp_path / "bright"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path a 100 TB⋈100 TB join would take
        # (locally both sides fit a broadcast, which would hide the
        # property under test)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = ctx.stream_table("t_bleft").join(ctx.stream_table("t_bright"), "k")
        plan = _executed(j.df)
        # the whole point: co-located bucket files join with NO exchange
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.collect_count() == n // 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_bucketed_groupby_is_shuffle_free(ctx, tmp_path):
    spark = ctx.spark
    s = ctx.from_df(
        spark.range(5_000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
    )
    s.write_table_bucketed(
        "t_bagg", by=["k"], num_buckets=4, path=str(tmp_path / "bagg")
    )
    try:
        g = ctx.stream_table("t_bagg").group_by_sum("k", "v")
        plan = _executed(g.df)
        assert "Exchange" not in plan, plan
        assert g.collect_count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bagg")


def test_compact_parquet_reduces_file_count(ctx, tmp_path):
    import glob

    src = str(tmp_path / "many_small")
    dst = str(tmp_path / "compacted")
    # 64 tiny files
    ctx.spark.range(10_000).repartition(64).write.parquet(src)
    n_small = len(glob.glob(f"{src}/part-*"))
    assert n_small == 64
    n_out = ctx.compact_parquet(src, dst, target_file_mb=1)
    parts = glob.glob(f"{dst}/part-*")
    assert len(parts) == n_out < n_small
    # values survive the rewrite
    assert (
        sorted(r.id for r in ctx.stream_parquet(dst).collect_vec())
        == list(range(10_000))
    )


def test_materialize_barrier_roundtrip(ctx, tmp_path):
    p = str(tmp_path / "phase1")
    s = ctx.stream_range(1000).map("id", sq=F.col("id") * F.col("id"))
    m = s.materialize(p)
    # downstream continues from a fresh file scan, not the old plan
    plan = _executed(m.df)
    assert "FileScan" in plan and "Range" not in plan
    assert m.fold(t=F.sum("sq")).collect_vec()[0].t == sum(i * i for i in range(1000))


def test_sorted_write_files_cover_disjoint_ranges(ctx, tmp_path):
    # write_parquet_sorted: every output file's footer min/max on the
    # sort key must be non-overlapping across files — the property
    # that lets a key-range predicate skip whole files.
    import glob

    import pyarrow.parquet as pq

    li = ctx.stream_parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "li_sorted")
    li.write_parquet_sorted(out, ["l_orderkey"], num_files=8)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["l_orderkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min); maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4  # range partitioner actually split
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary keys may touch)


def test_sorted_write_roundtrip_and_pushdown(ctx, spark, tmp_path):
    li = ctx.stream_parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "li_sorted2")
    li.write_parquet_sorted(out, ["l_orderkey"], num_files=4)
    back = spark.read.parquet(out).filter("l_orderkey = 1")
    want = li.df.filter("l_orderkey = 1")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, want.collect()))
    plan = _executed(back)
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "l_orderkey" in scan.split("PushedFilters")[-1]
