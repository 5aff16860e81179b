"""Rolling top words — mirrors /root/reference/examples/rolling_top_words.rs:
per sliding event-time window, the k most frequent tokens.

Usage: python examples/rolling_top_words.py [sf_dir] [k]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext
from renoir_spark.window import EventTimeWindow


def main(sf_dir: str, k: int) -> None:
    from renoir_spark.util import normalize_event_ts

    ctx = StreamContext(shuffle_partitions=8)
    ev = ctx.from_df(
        normalize_event_ts(ctx.stream_parquet(f"{sf_dir}/events.parquet").df)
    )
    top = (
        ev.map("event_type", "ts")
        .key_by("event_type")
        .window(EventTimeWindow.sliding("ts", 172800.0, 86400.0))
        .fold(n=F.count(F.lit(1)))
        .map("event_type", "n", win_s=F.col("win_start").cast("long"))
        .sorted_limit_by([F.col("n").desc(), F.col("event_type")], k, per="win_s")
        .sorted_by(F.col("win_s"), F.col("n").desc())
        .collect_vec()
    )
    for r in top:
        print(f"window@{r.win_s}: {r.event_type} x{r.n}")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(sf, int(sys.argv[2]) if len(sys.argv) > 2 else 3)
