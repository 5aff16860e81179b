"""Stateful PageRank — mirrors /root/reference/examples/pagerank_stateful.rs:
the adjacency list is BROADCAST to every worker (reference: driver-built
HashMap behind an Arc, :32-46), each round carries (old, new) per page
(reference rich_map :70-76), and the loop's shared state is a CONVERGENCE
flag — iteration stops early when no page's relative rank change exceeds
EPS (reference condition closure :79-81), not after a fixed count.

Spark-first: the invariant adjacency side is a cached+broadcast relation
(Catalyst replicates it to every task — the Arc<HashMap> analog); the
convergence flag is the `iterate` loop's shared state, folded from the
per-round delta aggregate exactly like renoir's `state_update`.

Usage: python examples/pagerank_stateful.py [sf_dir] [max_iterations]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext

EPS = 1e-8
DAMPENING = 0.85


def main(sf_dir: str, max_iterations: int) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    nation = ctx.stream_parquet(f"{sf_dir}/nation.parquet")
    edges = nation.map(src=F.col("n_nationkey"), dst=F.col("n_regionkey") + 100).merge(
        nation.map(src=F.col("n_regionkey") + 100, dst=F.col("n_nationkey"))
    )
    verts = edges.map(v=F.col("src")).unique_assoc()
    deg = edges.group_by("src").count(alias="deg")
    # the broadcast adjacency — renoir ships it to every host via Arc;
    # Spark ships it to every task via a broadcast relation
    ew = ctx.from_df(F.broadcast(edges.df.join(deg.df, "src"))).cache()
    n = verts.df.count()

    init = ctx.from_df(verts.df.withColumn("r", F.lit(1.0 / n)))

    def body(s, _handle):
        sdf = s.df.select("v", "r")  # drop the previous round's old column
        contrib = (
            sdf.join(ew.df, sdf["v"] == ew.df["src"])
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("c"))
        )
        out = (
            verts.df.join(contrib, "v", "left")
            .join(sdf.withColumnRenamed("r", "old"), "v")
            .select(
                "v",
                "old",
                (
                    F.lit((1.0 - DAMPENING) / n)
                    + F.lit(DAMPENING) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
        )
        return ctx.from_df(out)

    def state_update(_changed, out_df):
        # renoir folds `changed |= |new-old|/new > EPS` element-wise; the
        # Spark fold is ONE aggregate over the round's (old, new) pairs
        [row] = (
            out_df.agg(
                F.max(F.abs(F.col("r") - F.col("old")) / F.col("r")).alias("d")
            ).collect()
        )
        return row.d is not None and row.d > EPS

    _changed, ranks = init.iterate(
        max_iterations,
        True,
        body,
        state_update,
        loop_condition=lambda changed: changed,
        shuffle_partitions=4,
    )
    for row in (
        ranks.map("v", "r").sorted_by(F.col("r").desc()).limit(10).collect_vec()
    ):
        print(f"{row.v}\t{row.r:.6f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         int(sys.argv[2]) if len(sys.argv) > 2 else 30)
