"""Connected components — mirrors
/root/reference/examples/connected_components.rs: min-label propagation as a
`delta_iterate` (only CHANGED labels flow per round; termination on empty
delta).

Usage: python examples/connected_components.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(sf_dir: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    nation = ctx.stream_parquet(f"{sf_dir}/nation.parquet")
    edges_one = nation.map(src=F.col("n_nationkey"), dst=F.col("n_regionkey") + 100)
    edges = edges_one.merge(
        nation.map(src=F.col("n_regionkey") + 100, dst=F.col("n_nationkey"))
    ).cache()
    verts = edges.map(v=F.col("src")).unique_assoc()

    init = ctx.from_df(verts.df.withColumn("comp", F.col("v"))).key_by("v")

    def body(state, _it):
        cand = (
            state.df.join(F.broadcast(edges.df), state.df["v"] == edges.df["src"])
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("comp").alias("new_comp"))
        )
        delta = (
            cand.join(state.df, "v")
            .filter(F.col("new_comp") < F.col("comp"))
            .select("v", F.col("new_comp").alias("comp"))
        )
        return ctx.from_df(delta)

    final = init.delta_iterate(20, body, shuffle_partitions=4)
    comps = final.df.groupBy("comp").count().orderBy("comp")
    for row in comps.collect():
        print(f"component {row.comp}: {row['count']} vertices")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
