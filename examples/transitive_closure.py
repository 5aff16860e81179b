"""Transitive closure — mirrors
/root/reference/examples/transitive_closure.rs: grow the reachable-pair set
until a fixpoint (`iterate` with a loop condition on the new-pair count).

Usage: python examples/transitive_closure.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def main() -> None:
    ctx = StreamContext(shuffle_partitions=4)
    edges = ctx.stream_iter(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    ).cache()

    def body(s, _handle):
        # new pairs = closure ∘ edges; union + distinct = next closure
        grown = (
            s.df.alias("c")
            .join(edges.df.alias("e"), F.col("c.dst") == F.col("e.src"))
            .select(F.col("c.src").alias("src"), F.col("e.dst").alias("dst"))
        )
        return ctx.from_df(s.df.union(grown).distinct())

    def update(state, df):
        # (previous round's pair count, this round's) — the fixpoint test
        return (state[1], df.count())

    (_prev, n_pairs), closure = edges.iterate(
        10, (-1, 0), body, update,
        loop_condition=lambda s: s[0] != s[1],  # stop at the fixpoint
        shuffle_partitions=4,
    )
    pairs = sorted((r.src, r.dst) for r in closure.collect_vec())
    print(f"{len(pairs)} reachable pairs")
    for s, d in pairs:
        print(f"{s} -> {d}")


if __name__ == "__main__":
    main()
