"""NEXMark slice tests: the SAME builder runs bounded (vs DuckDB-shaped
expectation computed in the batch plan) and unbounded (availableNow drain
over file-backed micro-batches) — streaming/batch parity is the assert,
mirroring renoir's single-API streaming-first contract
(examples/nexmark.rs:92-396)."""

import json
import os
import time
from datetime import datetime, timezone

import pytest

from renoir_spark.nexmark import (
    currency_conversion,
    highest_bid,
    hot_items,
    monitor_new_users,
    selection,
)
from renoir_spark.streaming import run_to_completion


def _ts(s):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(eid, t, uid, etype, value, k):
    return (eid, _ts(t), uid, etype, value, json.dumps({"k": k}))


@pytest.fixture(scope="module")
def nex_dir(tmp_path_factory, ctx):
    """Three micro-batch files of marketplace events. Window size in the
    tests is 60s; bids for auction 7 dominate window [0,60), auction 9
    dominates [60,120). Signup+click pairs for users 1 (window 0) and
    2 (window 1) exercise the windowed join across files."""
    d = tmp_path_factory.mktemp("nexmark_stream")
    batches = [
        [
            _ev(0, 5, 1, "signup", 0.0, 0),
            _ev(1, 10, 1, "purchase", 10.0, 7),
            _ev(2, 15, 2, "purchase", 30.0, 7),
            _ev(3, 20, 3, "purchase", 20.0, 8),
            _ev(4, 25, 1, "click", 55.0, 0),
        ],
        [
            _ev(5, 40, 2, "purchase", 90.0, 7),
            _ev(6, 65, 2, "signup", 0.0, 0),
            _ev(7, 70, 4, "purchase", 40.0, 9),
            _ev(8, 75, 5, "purchase", 35.0, 9),
        ],
        [
            _ev(9, 80, 2, "click", 66.0, 0),
            _ev(10, 85, 6, "purchase", 25.0, 8),
            _ev(11, 95, 7, "purchase", 15.0, 9),
        ],
        # Watermark flush files: IN-BAND purchase events far past the
        # last interesting window. They must be purchases — Catalyst
        # pushes the bid filter into the parquet scan (the plan you want
        # at scale), so filtered-out event types never advance the
        # frontier. One per file because a watermark advance takes
        # effect one micro-batch later, and each chained stateful
        # operator lags one more batch. Tests compare only the
        # finalized windows (win_s < 120); the flush windows themselves
        # are excluded on both sides.
        [_ev(12, 200, 9, "purchase", 1.0, 0)],
        [_ev(13, 300, 9, "purchase", 1.0, 0)],
        [_ev(14, 400, 9, "purchase", 1.0, 0)],
    ]
    for i, rows in enumerate(batches):
        df = ctx.spark.createDataFrame(rows, _SCHEMA)
        path = str(d / f"batch_{i}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        t = time.time() - 400 + i * 60
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    return str(d)


def _unbounded(ctx, nex_dir):
    # one file per micro-batch so watermark advancement is observable
    # across batches (a wm update only takes effect in the NEXT batch)
    return ctx.from_df(
        ctx.spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{nex_dir}/*")
    )


def _bounded(ctx, nex_dir):
    return ctx.stream_parquet(f"{nex_dir}/*")


def test_currency_conversion_stream_equals_batch(ctx, nex_dir):
    got = run_to_completion(
        currency_conversion(_unbounded(ctx, nex_dir)).df, output_mode="append"
    )
    exp = currency_conversion(_bounded(ctx, nex_dir)).collect_vec()
    key = lambda rows: sorted(
        (r.event_id, r.auction, r.bidder, r.price_eur, r.ts_us) for r in rows
    )
    assert key(got) == key(exp) and len(got) == 11


def test_selection_filters_by_auction(ctx, nex_dir):
    rows = selection(_bounded(ctx, nex_dir), mod=7).collect_vec()
    # 7 % 7 == 0 and the auction-0 flush bids; 8, 9 dropped
    assert {r.auction for r in rows} == {0, 7}
    assert len(rows) == 6


def test_hot_items_stream_equals_batch(ctx, nex_dir):
    """Chained stateful aggs (windowed count -> per-window argmax) on an
    unbounded source: Spark's multiple-stateful-operators path."""
    got = run_to_completion(
        hot_items(
            _unbounded(ctx, nex_dir), size=60.0, watermark="10 seconds"
        ).df,
        output_mode="append",
    )
    exp = hot_items(_bounded(ctx, nex_dir), size=60.0).collect_vec()
    # compare finalized windows only — the flush bids' own windows may
    # legitimately still sit in state when the availableNow drain ends
    key = lambda rows: sorted(
        (r.win_s, r.auction, r.num) for r in rows if r.win_s < 120
    )
    assert key(got) == key(exp)
    assert key(exp) == [(0, 7, 3), (60, 9, 3)]


def test_highest_bid_stream_equals_batch(ctx, nex_dir):
    got = run_to_completion(
        highest_bid(
            _unbounded(ctx, nex_dir), size=60.0, watermark="10 seconds"
        ).df,
        output_mode="append",
    )
    exp = highest_bid(_bounded(ctx, nex_dir), size=60.0).collect_vec()
    key = lambda rows: sorted(
        (r.win_s, r.auction, r.price, r.bidder) for r in rows if r.win_s < 120
    )
    assert key(got) == key(exp)
    # window 0: auction 7 at 90.0 by user 2 arrives in batch 2 (ts=40)
    assert key(exp) == [(0, 7, 90.0, 2), (60, 9, 40.0, 4)]


def test_monitor_new_users_stream_equals_batch(ctx, nex_dir):
    """Windowed self-join of two legs of one stream across micro-batch
    files: user 1 pairs inside window 0; user 2's signup (ts=65) and
    click (ts=80) pair in window 1 ACROSS file boundaries."""
    got = run_to_completion(
        monitor_new_users(
            _unbounded(ctx, nex_dir), size=60.0, watermark="10 seconds"
        ).df,
        output_mode="append",
    )
    exp = monitor_new_users(_bounded(ctx, nex_dir), size=60.0).collect_vec()
    key = lambda rows: sorted(
        (r.win_s, r.user_id, r.signup_id, r.auction_id, r.reserve) for r in rows
    )
    assert key(got) == key(exp)
    assert key(exp) == [(0, 1, 0, 4, 55.0), (60, 2, 6, 9, 66.0)]


def test_hot_items_sliding_stream_equals_batch(ctx, nex_dir):
    """Sliding (overlapping) windows through the chained stateful aggs:
    each bid lands in TWO 60s windows (30s slide); per-window winners
    must match the bounded run for all finalized windows."""
    got = run_to_completion(
        hot_items(
            _unbounded(ctx, nex_dir), size=60.0, slide=30.0,
            watermark="10 seconds",
        ).df,
        output_mode="append",
    )
    exp = hot_items(
        _bounded(ctx, nex_dir), size=60.0, slide=30.0
    ).collect_vec()
    key = lambda rows: sorted(
        (r.win_s, r.auction, r.num) for r in rows if r.win_s < 120
    )
    assert key(got) == key(exp) and len(key(exp)) >= 4
