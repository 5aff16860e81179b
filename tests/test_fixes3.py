"""Round-3 hardening regressions (VERDICT r2 'What's wrong' #4-#7):
bounded write_kafka, outer interval_join id stability under AQE +
repartition, name-aware map_memo keys, deterministic cache release for
datapipe's internal persisted relations."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F


def _ts(s: int) -> datetime:
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _events(ctx, seconds):
    return ctx.stream_iter(
        [(i, _ts(s)) for i, s in enumerate(seconds)], "id long, ts timestamp"
    )


def test_outer_interval_join_stable_under_repartition(ctx):
    """The complement anti-join keys on persisted monotonic ids; a
    repartitioned source + AQE (on in conftest) must not mis-align the
    complement rows (VERDICT r2 #5)."""
    left = _events(ctx, [0, 10, 100, 101, 102]).shuffle()
    right = _events(ctx, [2, 12, 500, 501]).shuffle()
    out = left.interval_join(
        right, left_ts="ts", right_ts="ts", lower=0.0, upper=5.0, how="full"
    )
    got = out.collect_vec()
    pairs = sorted(
        ((r.id, r.id_r) for r in got),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    assert pairs == [
        (0, 0), (1, 1), (2, None), (3, None), (4, None), (None, 2), (None, 3),
    ]
    # the id-stamped frames were pinned; unpersist releases them
    assert len(out._retained) == 2
    assert all(d.is_cached for d in out._retained)
    out.unpersist(blocking=True)
    assert out._retained == []


def test_map_memo_name_aware_key_and_column_order(ctx):
    """map_memo keys on sorted(row.items()) — reordering the projected
    columns must neither alias cache entries nor change results
    (VERDICT r2 #6: the old positional-values key was order-dependent)."""
    rows = [(1, 10), (2, 20), (10, 1)]  # (10,1) vs (1,10): positional
    # value-tuples collide under reordering; named keys cannot
    for cols in (("a", "b"), ("b", "a")):
        s = ctx.stream_iter(rows, "a long, b long").map(*cols)
        got = s.map_memo(
            lambda r: {"a": r["a"], "b": r["b"], "d": r["a"] - r["b"]},
            "a long, b long, d long",
        ).collect_vec()
        assert sorted((r.a, r.b, r.d) for r in got) == [
            (1, 10, -9), (2, 20, -18), (10, 1, 9),
        ]


def test_map_memo_key_fn_memoizes_per_key(ctx):
    """renoir map_memo_by's fk: all rows sharing key_fn(row) get the
    FIRST computed result (single sorted partition so 'first' is
    deterministic)."""
    df = ctx.spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4)], "g long, v long"
    ).coalesce(1).sortWithinPartitions("g", "v")
    got = (
        ctx.from_df(df)
        .map_memo(
            lambda r: {"g": r["g"], "w": r["v"] * 100},
            "g long, w long",
            key_fn=lambda r: r["g"],
        )
        .collect_vec()
    )
    # per group, the first row's value is memoized and reused
    assert sorted((r.g, r.w) for r in got) == [
        (0, 100), (0, 100), (1, 300), (1, 300),
    ]


def test_write_kafka_bounded_uses_batch_writer(ctx, tmp_path):
    """Bounded input must route to df.write (no StreamingQueryException
    about writeStream on a batch frame); gated like avro — without the
    kafka package on the classpath a clear RuntimeError surfaces."""
    s = ctx.stream_range(3)
    assert not s.df.isStreaming
    try:
        ret = s.write_kafka("localhost:9092", "topic_t")
    except RuntimeError as e:
        assert "kafka" in str(e)  # classpath-gated, clear error
    else:  # pragma: no cover - broker-ful environment
        assert ret is None


def test_write_kafka_unbounded_requires_checkpoint(ctx):
    ch = ctx.stream_channel("k long, v double")
    ch.push([(1, 1.0)])
    s = ch.stream()
    assert s.df.isStreaming
    with pytest.raises(ValueError, match="checkpoint"):
        s.write_kafka("localhost:9092", "topic_t")


def test_dedup_minhash_unpersist_releases_signatures(ctx, sf_dir):
    """The dedup operators retain their internal persisted signature
    relations on the result; unpersist() frees them deterministically
    (VERDICT r2 #7)."""
    docs = ctx.stream_parquet(f"{sf_dir}/documents.parquet")
    out = docs.dedup_minhash("text", "doc_id")
    assert out.collect_count() > 0
    assert len(out._retained) == 1
    assert out._retained[0].is_cached
    out.unpersist(blocking=True)
    assert out._retained == []
    assert not out.df.is_cached


def test_stream_kafka_source_gated(ctx):
    """Kafka source option plumbing, classpath-gated like stream_avro:
    no broker/connector in this sandbox, so the load must fail with the
    connector-missing error (NOT an option/validation error — that would
    mean the plumbing is wrong)."""
    try:
        s = ctx.stream_kafka("localhost:9092", "topic_t",
                             starting_offsets="latest")
    except Exception as e:
        msg = str(e)
        assert "kafka" in msg.lower()
        assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg
    else:  # pragma: no cover - connector-ful environment
        assert s.df.isStreaming


def test_write_csv_seq_numbered_replica_files(ctx, tmp_path):
    """renoir write_csv_seq naming contract (csv.rs:116-133): template
    file -> prefix + 0000-numbered files keeping the extension;
    template directory -> bare numbered files; contents round-trip."""
    import os

    s = ctx.stream_range(100, partitions=3).map(id="id", sq=F.col("id") * 2)
    outs = s.write_csv_seq(str(tmp_path / "out.csv"))
    assert [os.path.basename(p) for p in outs] == [
        "out0000.csv", "out0001.csv", "out0002.csv",
    ]
    back = ctx.stream_csv(str(tmp_path / "out*.csv"), header=True,
                          inferSchema=True)
    assert {(r.id, r.sq) for r in back.collect_vec()} == {
        (i, i * 2) for i in range(100)
    }

    d = tmp_path / "dir_out"
    outs2 = s.write_csv_seq(str(d) + os.sep)
    assert [os.path.basename(p) for p in outs2] == [
        "0000.csv", "0001.csv", "0002.csv",
    ]


def test_batch_mode_timed_sets_streaming_trigger(ctx):
    """BatchMode::Timed (batcher.rs:19-38) maps to the processing-time
    trigger carried to streaming sinks; fixed/adaptive stay no-ops and
    unknown modes are rejected."""
    s = ctx.stream_range(5)
    assert not hasattr(s.batch_mode("adaptive"), "_trigger_interval") or \
        s.batch_mode("adaptive")._trigger_interval is None
    timed = s.batch_mode("timed", 2.5)
    assert timed._trigger_interval == 2.5
    with pytest.raises(ValueError):
        s.batch_mode("bogus")
    with pytest.raises(ValueError):
        s.batch_mode("timed")


def test_map_async_memo_dedups_inflight_same_key(ctx):
    """Duplicate keys arriving in ONE batch must share a single call:
    the async fn returns a per-call unique value, so any double-fire
    shows up as differing results for the same key."""
    df = ctx.spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (2, "d"), (1, "e")], "k long, tag string"
    ).coalesce(1)

    async def enrich(row):
        import random
        return {"k": row["k"], "nonce": random.random()}

    got = (
        ctx.from_df(df)
        .map_async_memo_by(enrich, lambda r: r["k"], "k long, nonce double")
        .collect_vec()
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r.k, set()).add(r.nonce)
    assert all(len(v) == 1 for v in by_key.values()), by_key
