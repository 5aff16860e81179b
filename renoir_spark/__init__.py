"""renoir_spark — a PySpark-native analytics engine with the query surface
of deib-polimi/renoir (see SURVEY.md), re-expressed Spark-first.

Quick start::

    from renoir_spark import StreamContext
    ctx = StreamContext(shuffle_partitions=32)
    res = (ctx.stream_parquet("lineitem.parquet")
              .filter("l_shipdate <= timestamp'1998-09-02'")
              .group_by("l_returnflag", "l_linestatus")
              .fold(sum_qty=F.sum("l_quantity"))
              .collect_vec())
"""

from .context import ChannelSource, StreamContext
from .iteration import IterationStateHandle
from .keyed import KeyedStream
from .stream import Stream
from .streaming import (
    count_window_fold_stream,
    dedup_exact_stream,
    dedup_minhash_stream,
    dedup_phash_stream,
    event_time_agg,
    foreach_batch,
    interval_join_stream,
    keyed_map_with_state,
    last_k_window_stream,
    minhash_survivors,
    run_to_completion,
    session_agg,
    transaction_window_stream,
    windowed_top_k_stream,
)
from .window import (
    AllWindow,
    CountWindow,
    EventTimeWindow,
    LastKWindow,
    ProcessingTimeWindow,
    SessionWindow,
    TransactionWindow,
    WindowedStream,
)

__version__ = "0.1.0"

__all__ = [
    "StreamContext",
    "ChannelSource",
    "IterationStateHandle",
    "Stream",
    "KeyedStream",
    "WindowedStream",
    "CountWindow",
    "EventTimeWindow",
    "SessionWindow",
    "LastKWindow",
    "AllWindow",
    "ProcessingTimeWindow",
    "TransactionWindow",
    "event_time_agg",
    "session_agg",
    "interval_join_stream",
    "dedup_exact_stream",
    "dedup_minhash_stream",
    "dedup_phash_stream",
    "minhash_survivors",
    "keyed_map_with_state",
    "count_window_fold_stream",
    "last_k_window_stream",
    "transaction_window_stream",
    "windowed_top_k_stream",
    "run_to_completion",
    "foreach_batch",
]
