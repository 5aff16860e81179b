"""Triangle counting — mirrors /root/reference/examples/triangles_fold.rs
(group_by_fold adjacency → candidate wedges → validating join → count)
and triangles_rich_map.rs (same shape with per-key state). Declaratively
both collapse to the canonical ordered wedge join: edges (u<v) grouped on
u emit (v, w) candidate closures, validated against the edge set — every
hop an equi-join, no cartesian.

Usage: python examples/triangles.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main(sf_dir: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    nation = ctx.stream_parquet(f"{sf_dir}/nation.parquet")
    # nations sharing a region form a complete subgraph (same graph as
    # the suite's q56); edges canonically ordered u < v
    edges = ctx.from_df(
        nation.df.alias("a")
        .join(
            nation.df.alias("b"),
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_nationkey").alias("u"),
            F.col("b.n_nationkey").alias("v"),
        )
    ).cache()

    # wedges: two edges out of the same u → candidate closing edge (v, w)
    e1 = edges.df.select(F.col("u"), F.col("v").alias("x"))
    e2 = edges.df.select(F.col("u"), F.col("v").alias("y"))
    wedges = (
        e1.join(e2, "u")
        .filter(F.col("x") < F.col("y"))
        .select(F.col("x").alias("u"), F.col("y").alias("v"))
    )
    # validate the closure against the edge set, then one global fold —
    # the reference's fold_assoc(0, |x,_| x+=1, |x,y| x+=y)
    triangles = ctx.from_df(wedges).join(edges, ["u", "v"]).fold(
        n=F.count(F.lit(1))
    )
    [row] = triangles.collect_vec()
    print(f"triangles: {row.n}")
    edges.unpersist()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
