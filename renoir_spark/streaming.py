"""Structured Streaming slice — unbounded sources, watermarks, windows.

Reference parity: renoir is streaming-first; every operator consumes
``StreamElement::{Item, Timestamped, Watermark}`` and event-time windows
close on the watermark frontier (src/operator/start/watermark_frontier.rs:
7-60, contract src/operator/mod.rs:142-144 — a watermark t promises no later
element ≤ t; late data is assumed not to exist). Spark's equivalents:
``readStream`` sources, ``withWatermark`` (drop-late-rows semantics), and
``window``/``session_window`` grouped aggregations, with watermark
propagation across shuffles built in.

The aggregation helpers here take EITHER a batch or a streaming DataFrame —
the same declarative plan runs both ways, which is exactly how the tests
assert streaming/batch parity (run the stream with an ``availableNow``
trigger, compare to the batch run over the same files).

Scale notes: stateful streaming aggs keep per-(key, window) state in the
state store — watermarks bound it; shuffle partitioning of the state is the
same hash exchange as batch, so the sizing rules (partitions vs executor
memory) carry over unchanged.
"""

from __future__ import annotations

import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import named_cols, to_col
from .window import _dur


def event_time_agg(
    stream,
    ts,
    *,
    size: float,
    slide: Optional[float] = None,
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
    **aggs,
):
    """Tumbling/sliding event-time windowed aggregation — the streaming
    form of ``EventTimeWindow`` (src/operator/window/descr/event_time.rs:
    112-129). Works identically on bounded input (parity harness)."""
    df = stream.df.withColumn("__ets", to_col(ts).cast("timestamp"))
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("__ets", watermark)
    win = F.window("__ets", _dur(size), _dur(slide or size))
    out = df.groupBy(*[F.col(k) for k in keys], win.alias("__win")).agg(
        *named_cols((), aggs)
    )
    return stream._new(
        out.select(
            *keys,
            F.col("__win.start").alias("win_start"),
            F.col("__win.end").alias("win_end"),
            *aggs.keys(),
        )
    )


def session_agg(
    stream,
    ts,
    *,
    gap: float,
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
    **aggs,
):
    """Session-windowed aggregation via the native ``session_window``
    (streaming state-store implementation; also runs on bounded input) —
    the streaming form of ``SessionWindow`` (session.rs:67-76)."""
    df = stream.df.withColumn("__ets", to_col(ts).cast("timestamp"))
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("__ets", watermark)
    win = F.session_window("__ets", _dur(gap))
    out = df.groupBy(*[F.col(k) for k in keys], win.alias("__win")).agg(
        *named_cols((), aggs)
    )
    return stream._new(
        out.select(
            *keys,
            F.col("__win.start").alias("win_start"),
            F.col("__win.end").alias("win_end"),
            *aggs.keys(),
        )
    )


def run_to_completion(
    df: DataFrame,
    *,
    output_mode: str = "complete",
    max_files_per_trigger: Optional[int] = None,
    timeout_s: int = 120,
) -> list:
    """Test/verification harness: drain a streaming DataFrame with an
    ``availableNow`` trigger into a memory sink and return the collected
    rows. ``max_files_per_trigger`` (set on the source) splits the drain
    into multiple micro-batches so watermark advancement between batches
    is exercised (renoir's WatermarkFrontier analog)."""
    name = "mem_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:  # pragma: no cover - timeout path
            q.stop()
    return df.sparkSession.table(name).collect()


def foreach_batch(df: DataFrame, fn, *, timeout_s: int = 120):
    """renoir ``collect_channel``/``for_each`` for streams: ``fn(batch_df,
    batch_id)`` runs per micro-batch (``foreachBatch``); drains with
    availableNow and blocks until done."""
    q = df.writeStream.foreachBatch(fn).trigger(availableNow=True).start()
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:  # pragma: no cover
            q.stop()
    return q
