"""Logistic regression — mirrors /root/reference/examples/logistic_regression.rs:
the point set replays every round; the weight vector is the replayed state;
each round is one gradient aggregation.

Usage: python examples/logistic_regression.py [sf_dir] [rounds]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(sf_dir: str, rounds: int) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    pts = ctx.stream_parquet(f"{sf_dir}/events.parquet").map(
        x1=F.col("value"),
        x2=(F.col("event_id") % 97).cast("double") / F.lit(9.7),
        y=(F.col("value") > 0.5).cast("double"),
    )

    def body(s, handle):
        w1, w2, b = handle.get()
        z = F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2") + F.lit(b)
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        return s.map(
            "x1", "x2", "y",
            g1=(sig - F.col("y")) * F.col("x1"),
            g2=(sig - F.col("y")) * F.col("x2"),
            g0=sig - F.col("y"),
        )

    def update(state, df):
        w1, w2, b = state
        r = df.agg(
            F.sum("g1").alias("s1"), F.sum("g2").alias("s2"),
            F.sum("g0").alias("s0"), F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        lr = 0.1
        return (w1 - lr * r.s1 / r.n, w2 - lr * r.s2 / r.n, b - lr * r.s0 / r.n)

    w1, w2, b = pts.replay(rounds, (0.0, 0.0, 0.0), body, update)
    z = F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2") + F.lit(b)
    acc = pts.fold(
        acc=F.round(F.avg(F.when((z > 0).cast("double") == F.col("y"), 1.0).otherwise(0.0)), 4)
    ).collect_vec()[0].acc
    print(f"w=({w1:.6f}, {w2:.6f}) b={b:.6f} train_accuracy={acc}")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(sf, int(sys.argv[2]) if len(sys.argv) > 2 else 5)
