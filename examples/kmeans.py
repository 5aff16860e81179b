"""K-means — mirrors /root/reference/examples/kmeans.rs: centroids are the
replayed state; the SAME point set is re-fed every round (`replay`).

Usage: python examples/kmeans.py [sf_dir] [k] [rounds]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(sf_dir: str, k: int, rounds: int) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    pts = ctx.stream_parquet(f"{sf_dir}/events.parquet").map(
        pid=F.col("event_id"), x=F.col("value"),
        y=(F.col("event_id") % 97).cast("double") / F.lit(9.7),
    )
    init = [
        (i, r.x, r.y)
        for i, r in enumerate(pts.df.orderBy("pid").limit(k).collect())
    ]

    def assign(centroids):
        dists = [
            (F.col("x") - F.lit(cx)) ** 2 + (F.col("y") - F.lit(cy)) ** 2
            for _c, cx, cy in centroids
        ]
        expr = F.lit(len(centroids) - 1)
        for i in range(len(centroids) - 2, -1, -1):
            cond = None
            for j in range(i + 1, len(centroids)):
                c = dists[i] <= dists[j]
                cond = c if cond is None else (cond & c)
            expr = F.when(cond, F.lit(i)).otherwise(expr)
        return expr

    def body(s, handle):
        return s.map("pid", "x", "y", cluster=assign(handle.get()))

    def update(state, df):
        means = {
            r.cluster: (r.cx, r.cy)
            for r in df.groupBy("cluster")
            .agg(F.avg("x").alias("cx"), F.avg("y").alias("cy")).collect()
        }
        return [(cid, *means.get(cid, (cx, cy))) for cid, cx, cy in state]

    final = pts.replay(rounds, init, body, update, shuffle_partitions=4)
    for cid, cx, cy in final:
        print(f"centroid {cid}: ({cx:.4f}, {cy:.4f})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         int(sys.argv[2]) if len(sys.argv) > 2 else 4,
         int(sys.argv[3]) if len(sys.argv) > 3 else 3)
