"""NEXMark benchmark slice — the reference's main streaming benchmark.

Renoir's primary benchmark surface is NEXMark q0-q8
(``benches/nexmark.rs:358-400``, queries ``examples/nexmark.rs:92-396``):
an auction marketplace of Person / Auction / Bid events. This module
restates the representative query shapes over the driver's ``events``
table with a documented entity mapping:

=========  =====================  =======================================
NEXMark    events encoding        columns
=========  =====================  =======================================
Bid        event_type='purchase'  auction = props.k, bidder = user_id,
                                  price = value, datetime = ts
Person     event_type='signup'    id = user_id, datetime = ts
Auction    event_type='click'     seller = user_id, reserve = value,
                                  datetime = ts
=========  =====================  =======================================

Every builder takes a renoir_spark ``Stream`` (bounded OR unbounded) and
returns a ``Stream`` — the identical declarative plan runs as a batch job
(driver oracle path) and as a Structured Streaming job (watermarked
windows / chained stateful aggregation), which is exactly how renoir's
single API covers both; the parity tests drain the streaming plan with
``availableNow`` and compare to the batch run of the same files.

Scale: every shape here is a filter → (windowed) keyed aggregation or a
windowed equi-join — hash exchanges on (window, key), no all-pairs, no
driver-side loops. The bid filter is pushed to the scan; windowed counts
use map-side partial aggregation; winner-per-window is ``max_by`` (a
single-pass agg), never a sort.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from .util import to_col
from .window import _dur

DOL_TO_EUR = 0.908  # examples/nexmark.rs:106 (`price * 0.908`)


def _with_ets(stream, ts):
    return stream.df.withColumn("__ets", to_col(ts).cast("timestamp"))


def _maybe_watermark(df, watermark: Optional[str]):
    if watermark is not None and df.isStreaming:
        return df.withWatermark("__ets", watermark)
    return df


def bids(stream, ts="ts", watermark: Optional[str] = None):
    """The Bid sub-stream (``filter_bid``, examples/nexmark.rs:64-69):
    purchases projected to (event_id, auction, bidder, price, __ets).

    The watermark is stamped before the event-type filter, but note the
    scale-vs-semantics interplay: Catalyst pushes the deterministic
    ``event_type`` predicate through the EventTimeWatermark node into
    the parquet scan (the RIGHT plan at 100 TB — non-bid rows are never
    even decoded), which means only rows surviving the scan advance the
    frontier. Renoir behaves the same way when timestamps are assigned
    after a source-side filter; streams whose time must advance without
    bids need a periodic in-band element (see test_nexmark.py's flush
    bids)."""
    df = _maybe_watermark(_with_ets(stream, ts), watermark)
    out = df.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("auction"),
        F.col("user_id").alias("bidder"),
        F.col("value").alias("price"),
        "__ets",
    )
    return stream._new(out)


def currency_conversion(stream, ts="ts", rate: float = DOL_TO_EUR):
    """NEXMark q1 (examples/nexmark.rs:92-110): stateless per-bid map —
    dollar price converted to euro. Pure narrow pipeline: filter +
    project fused into the scan, streamable with zero state."""
    b = bids(stream, ts)
    return stream._new(
        b.df.select(
            "event_id",
            "auction",
            "bidder",
            F.round(F.col("price") * rate, 6).alias("price_eur"),
            F.unix_micros(F.col("__ets")).alias("ts_us"),
        )
    )


def selection(stream, ts="ts", mod: int = 123):
    """NEXMark q2 (examples/nexmark.rs:112-124): bid selection by auction
    id predicate (the reference uses ``auction % 123 == 0``)."""
    b = bids(stream, ts)
    return stream._new(
        b.df.filter(F.col("auction") % mod == 0).select(
            "event_id", "auction", F.round("price", 6).alias("price")
        )
    )


def hot_items(
    stream,
    ts="ts",
    *,
    size: float,
    slide: Optional[float] = None,
    watermark: Optional[str] = None,
):
    """NEXMark q5 Hot Items (examples/nexmark.rs:302-330): per sliding
    window, the auction with the most bids.

    Two chained aggregations — (window, auction) counts, then the
    per-window argmax — exactly renoir's ``window().count()`` +
    ``window_all().max_by_key()``. On unbounded input this is Spark's
    *multiple stateful operators* path (chained windowed aggs over the
    carried event-time window column); on bounded input the same plan is
    two hash aggregates. The winner is ``max_by(struct(num, auction))``:
    a single-pass agg (no per-window sort), deterministic tie-break on
    the higher auction id (the reference's ``max_by_key`` keeps an
    unspecified tie winner; ours is pinned for the oracle)."""
    df = bids(stream, ts, watermark).df
    win = F.window("__ets", _dur(size), _dur(slide or size))
    counts = df.groupBy(win.alias("__win"), "auction").agg(
        F.count(F.lit(1)).alias("num")
    )
    top = counts.groupBy("__win").agg(
        F.max_by(
            F.struct("auction", "num"), F.struct("num", "auction")
        ).alias("__top")
    )
    return stream._new(
        top.select(
            F.unix_seconds(F.col("__win.start")).alias("win_s"),
            F.col("__top.auction").alias("auction"),
            F.col("__top.num").alias("num"),
        )
    )


def highest_bid(
    stream,
    ts="ts",
    *,
    size: float,
    watermark: Optional[str] = None,
):
    """NEXMark q7 Highest Bid (examples/nexmark.rs:361-380): per tumbling
    window, the single highest-priced bid (auction, price, bidder).

    The reference does a two-level max (per-key then window_all) to keep
    the reduction parallel; Catalyst's partial/final ``max_by`` is that
    same two-phase plan generated automatically. Tie-break: higher
    event_id (reference keeps an unspecified winner)."""
    df = bids(stream, ts, watermark).df
    win = F.window("__ets", _dur(size))
    top = df.groupBy(win.alias("__win")).agg(
        F.max_by(
            F.struct("auction", "price", "bidder"),
            F.struct("price", "event_id"),
        ).alias("__top")
    )
    return stream._new(
        top.select(
            F.unix_seconds(F.col("__win.start")).alias("win_s"),
            F.col("__top.auction").alias("auction"),
            F.col("__top.price").alias("price"),
            F.col("__top.bidder").alias("bidder"),
        )
    )


def monitor_new_users(
    stream,
    ts="ts",
    *,
    size: float,
    watermark: Optional[str] = None,
):
    """NEXMark q8 Monitor New Users (examples/nexmark.rs:382-396): people
    who registered AND opened an auction in the same tumbling window —
    renoir routes the event stream into Person/Auction legs and
    ``window_join``s them.

    Spark-first: both legs get the same ``window()`` assignment and the
    join key is ``(user_id, window)`` — a plain hash equi-join, which on
    unbounded input is a stream-stream join whose state Spark bounds by
    the window + watermark (the window struct carries event time). No
    band predicate needed: window equality IS the time condition."""
    df = _with_ets(stream, ts)
    df = _maybe_watermark(df, watermark)
    win = F.window("__ets", _dur(size))
    persons = (
        df.filter(F.col("event_type") == "signup")
        .select(
            win.alias("__win"),
            "user_id",
            F.col("event_id").alias("signup_id"),
        )
    )
    auctions = (
        df.filter(F.col("event_type") == "click")
        .select(
            win.alias("__win"),
            F.col("user_id").alias("seller"),
            F.col("event_id").alias("auction_id"),
            F.col("value").alias("reserve"),
        )
    )
    joined = persons.join(
        auctions,
        (persons["user_id"] == auctions["seller"])
        & (persons["__win"] == auctions["__win"]),
    )
    return stream._new(
        joined.select(
            F.unix_seconds(persons["__win.start"]).alias("win_s"),
            "user_id",
            "signup_id",
            "auction_id",
            "reserve",
        )
    )
