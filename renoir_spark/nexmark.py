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
    event_id (reference keeps an unspecified winner).

    Stated on ``Stream.window_all`` — the reference's one-line global
    window API (src/operator/window/mod.rs:353-362); the descriptor
    compiles to the same ``groupBy(window)`` + single-pass ``max_by``
    plan as writing the aggregation by hand."""
    from .window import EventTimeWindow

    b = bids(stream, ts, watermark)
    top = b.window_all(EventTimeWindow.tumbling("__ets", size)).fold(
        top=F.max_by(
            F.struct("auction", "price", "bidder"),
            F.struct("price", "event_id"),
        )
    )
    return stream._new(
        top.df.select(
            F.unix_seconds(F.col("win_start")).alias("win_s"),
            F.col("top.auction").alias("auction"),
            F.col("top.price").alias("price"),
            F.col("top.bidder").alias("bidder"),
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


def auctions(stream, ts="ts"):
    """The Auction sub-stream: the FIRST click event per ``props.k``
    opens auction ``k`` (seller = user_id, reserve = value, expires =
    open + 7 days, category = k % 10). Mirrors the Person/Auction route
    split of examples/nexmark.rs:131-160."""
    df = _with_ets(stream, ts)
    clicks = df.filter(F.col("event_type") == "click").select(
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.col("user_id").alias("seller"),
        F.col("value").alias("reserve"),
        F.col("__ets"),
        "event_id",
    )
    first = clicks.groupBy("k").agg(
        F.min_by(
            F.struct("seller", "reserve", "__ets", "event_id"),
            F.col("event_id"),
        ).alias("__a")
    )
    out = first.select(
        "k",
        F.col("__a.seller").alias("seller"),
        F.col("__a.reserve").alias("reserve"),
        F.col("__a.__ets").alias("open_ts"),
        (F.col("__a.__ets") + F.expr("INTERVAL 7 DAYS")).alias("expires"),
        (F.col("k") % 10).alias("category"),
    )
    return stream._new(out)


def winning_bids(stream, ts="ts"):
    """``winning_bids`` (examples/nexmark.rs:64-90, the q4/q6 input):
    per auction, the highest valid bid — valid means inside
    [open, expires) and price ≥ reserve (`is_valid_bid`,
    examples/nexmark.rs:202-206); deterministic tie-break on event_id.

    Scale: the auction side is tiny by construction (one row per
    auction id), so it BROADCASTS and the bid stream never shuffles for
    the join; the per-auction argmax is a partial/final ``max_by``."""
    b = bids(stream, ts)
    a = auctions(stream, ts)
    joined = (
        b.df.join(F.broadcast(a.df), b.df["auction"] == a.df["k"])
        .filter(
            (F.col("__ets") >= F.col("open_ts"))
            & (F.col("__ets") < F.col("expires"))
            & (F.col("price") >= F.col("reserve"))
        )
    )
    win = joined.groupBy("k").agg(
        F.max_by(
            F.struct("seller", "category", "price", "bidder", "event_id"),
            F.struct("price", "event_id"),
        ).alias("__w")
    )
    return stream._new(
        win.select(
            "k",
            F.col("__w.seller").alias("seller"),
            F.col("__w.category").alias("category"),
            F.col("__w.price").alias("price"),
            F.col("__w.bidder").alias("bidder"),
            F.col("__w.event_id").alias("bid_event_id"),
        )
    )


def avg_price_by_category(stream, ts="ts"):
    """NEXMark q4 Average Price for a Category
    (examples/nexmark.rs:173-196): winning bids → per-category average."""
    w = winning_bids(stream, ts)
    return stream._new(
        w.df.groupBy("category").agg(
            F.round(F.avg("price"), 6).alias("avg_final"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def avg_selling_by_seller(stream, ts="ts", *, size: int = 3):
    """NEXMark q6 Average Selling Price by Seller
    (examples/nexmark.rs:332-359): per seller, the rolling average of
    the last ``size`` winning bids (renoir: CountWindow::sliding(10,1)
    — sized down for the test corpus; partial windows kept, as renoir
    emits a window per new element)."""
    from .window import CountWindow

    w = winning_bids(stream, ts)
    return (
        stream._new(w.df)
        .key_by("seller")
        .window(CountWindow.sliding("bid_event_id", size=size, slide=1,
                                    exact=False))
        .fold(
            avg_price=F.round(F.avg("price"), 6),
            n=F.count(F.lit(1)),
        )
    )


def local_item_suggestion(stream, ts="ts", *, category: int = 4,
                          person_mod: int = 3):
    """NEXMark q3 Local Item Suggestion (examples/nexmark.rs:126-160):
    filtered persons joined to filtered auctions on seller. Person =
    each user's FIRST signup; the reference's state/category predicates
    map to ``user_id % person_mod == 0`` and ``k % 10 == category``.
    Both filters sit below the join (pushed into the scans); the person
    side is small after filtering, so it broadcasts."""
    df = _with_ets(stream, ts)
    persons = (
        df.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("event_id").alias("signup_id"))
        .filter(F.col("user_id") % person_mod == 0)
    )
    auctions_all = df.filter(F.col("event_type") == "click").select(
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.col("user_id").alias("seller"),
        F.col("event_id").alias("open_id"),
    ).filter(F.col("k") % 10 == category)
    joined = auctions_all.join(
        F.broadcast(persons),
        auctions_all["seller"] == persons["user_id"],
    )
    return stream._new(joined.select("user_id", "signup_id", "k", "open_id"))
