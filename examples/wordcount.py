"""Wordcount — mirrors /root/reference/examples/wordcount.rs (and the
_assoc/_opt variants, which differ only in fold shape; declaratively they
are all one groupBy count).

Usage: python examples/wordcount.py <text-or-parquet-path>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(path: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    src = (
        ctx.stream_parquet(path).map(line=F.col("text"))
        if path.endswith(".parquet")
        else ctx.stream_file(path).map(line=F.col("value"))
    )
    counts = (
        src.flat_map(F.split(F.lower("line"), r"[^a-z0-9]+"), alias="word")
        .filter("word <> ''")
        .group_by("word")
        .count(alias="n")
        .sorted_limit_by([F.col("n").desc(), F.col("word")], 20)
    )
    for row in counts.collect_vec():
        print(f"{row.word}\t{row.n}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet")
