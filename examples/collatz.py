"""Collatz — mirrors /root/reference/examples/collatz.rs (and the
benches/collatz.rs harness shape): for each n in 1..limit run the 3n+1
loop (cap 1000 steps) and reduce to the (steps, n) maximum.

The per-element while-loop is the one workload SQL can't express, so it
runs as an Arrow-batched numpy mask loop: each batch advances all its
still-active elements one step per pass — vectorized across the batch,
never per-row Python. Suite query q82 verifies the same computation
against a DuckDB recursive CTE.

Usage: python examples/collatz.py [limit]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from renoir_spark import StreamContext


def collatz_steps(pdf: pd.DataFrame, cap: int = 1000) -> pd.DataFrame:
    n = pdf["id"].to_numpy(dtype=np.int64)
    cur = n.copy()
    steps = np.zeros_like(n)
    active = np.ones(len(n), dtype=bool)
    it = 0
    while active.any() and it < cap:
        even = active & (cur % 2 == 0)
        odd = active & ~even
        cur[even] //= 2
        cur[odd] = cur[odd] * 3 + 1
        steps[active] += 1
        active &= cur > 1
        it += 1
    return pd.DataFrame({"n": n, "steps": steps})


def main(limit: int) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    best = (
        ctx.stream_par_iter(limit, partitions=8)
        .filter("id >= 1")
        .rich_map_batches(lambda: None, lambda _s, pdf: collatz_steps(pdf),
                          "n long, steps long")
        .fold(best=F.max(F.struct(F.col("steps"), F.col("n"))))
        .map(steps=F.col("best.steps"), n=F.col("best.n"))
        .collect_vec()
    )
    print(f"Best: ({best[0].steps}, {best[0].n})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
