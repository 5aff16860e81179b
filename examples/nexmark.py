"""NEXMark benchmark queries — mirrors /root/reference/examples/nexmark.rs
(q0-q8) over the driver's events table using renoir_spark.nexmark's
documented Bid/Person/Auction mapping.

Usage: python examples/nexmark.py <events.parquet-path> [query]
       query in {0..8} (default: run all)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from renoir_spark import StreamContext  # noqa: E402
from renoir_spark.nexmark import (  # noqa: E402
    avg_price_by_category,
    avg_selling_by_seller,
    bids,
    currency_conversion,
    highest_bid,
    hot_items,
    local_item_suggestion,
    monitor_new_users,
    selection,
)

DAY = 86400.0


def main(path: str, which: str = "all") -> None:
    from renoir_spark.util import normalize_event_ts

    ctx = StreamContext(shuffle_partitions=8)
    ev = ctx.from_df(normalize_event_ts(ctx.stream_parquet(path).df))

    queries = {
        "0": lambda: bids(ev).collect_count(),                      # passthrough
        "1": lambda: currency_conversion(ev).collect_count(),
        "2": lambda: selection(ev, mod=7).collect_count(),
        "3": lambda: local_item_suggestion(ev).collect_count(),
        "4": lambda: avg_price_by_category(ev).collect_vec(),
        "5": lambda: hot_items(ev, size=2 * DAY, slide=DAY).collect_vec(),
        "6": lambda: avg_selling_by_seller(ev, size=3).collect_count(),
        "7": lambda: highest_bid(ev, size=DAY).collect_vec(),
        "8": lambda: monitor_new_users(ev, size=DAY).collect_count(),
    }
    for q in ([which] if which != "all" else sorted(queries)):
        out = queries[q]()
        shown = out if isinstance(out, int) else f"{len(out)} rows"
        print(f"nexmark q{q}: {shown}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "/root/testdata/sf0.001/events.parquet",
         sys.argv[2] if len(sys.argv) > 2 else "all")
