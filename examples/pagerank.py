"""PageRank — mirrors /root/reference/examples/pagerank.rs:42-70: the rank
stream feeds back through `iterate`; the invariant (edge, out-degree) side is
cached once.

Usage: python examples/pagerank.py [sf_dir] [iterations]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(sf_dir: str, iterations: int) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    nation = ctx.stream_parquet(f"{sf_dir}/nation.parquet")
    # bidirectional nation<->region graph (same shape as the suite's q26)
    edges = nation.map(src=F.col("n_nationkey"), dst=F.col("n_regionkey") + 100).merge(
        nation.map(src=F.col("n_regionkey") + 100, dst=F.col("n_nationkey"))
    )
    verts = edges.map(v=F.col("src")).unique_assoc()
    deg = edges.group_by("src").count(alias="deg")
    ew = ctx.from_df(edges.df.join(deg.df, "src")).cache()
    n = verts.df.count()

    init = ctx.from_df(verts.df.withColumn("r", F.lit(1.0 / n)))

    def body(s, _handle):
        contrib = (
            s.df.join(ew.df, s.df["v"] == ew.df["src"])
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("c"))
        )
        out = verts.df.join(contrib, "v", "left").select(
            "v", (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce(F.col("c"), F.lit(0.0))).alias("r")
        )
        return ctx.from_df(out)

    _state, ranks = init.iterate(iterations, 0, body, lambda st, _df: st + 1,
                                 shuffle_partitions=4)
    for row in ranks.sorted_by(F.col("r").desc()).limit(10).collect_vec():
        print(f"{row.v}\t{row.r:.6f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         int(sys.argv[2]) if len(sys.argv) > 2 else 5)
