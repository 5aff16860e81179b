"""Driver-mimic correctness check.

Replicates the driver's CORRECTNESS protocol more faithfully than
tests/test_oracle.py: the driver materializes BOTH sides as *pandas*
frames (DuckDB via ``res.df()``), sorts columns by name, sorts rows, and
hashes the values.  That path surfaces dtype-level artifacts the
fetchall()-based pytest oracle can't see — e.g. DuckDB window-sum
HUGEINT columns materializing as float64 (CORRECTNESS_r02 q13/q36), or
array columns that pandas can't sort (q36 -> q39).

Usage:
    python tools/driver_check.py            # all queries at sf0.01
    python tools/driver_check.py q13 q36    # subset (prefix match ok)
"""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype == object:
            for v in s:
                h.update(str(v).encode("utf-8"))
                h.update(b"\x00")
        else:
            h.update(s.to_numpy().tobytes())
    return h.hexdigest()


def main(argv: list[str]) -> int:
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    wanted = argv or sorted(qs)
    names = [n for n in sorted(qs) if any(n.startswith(w) for w in wanted)]

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        try:
            sdf = _canon(qs[name](spark, sf_dir).toPandas())
            if name not in oracles:
                print(f"{name}: rows={len(sdf)} (no oracle — rows-only)")
                continue
            ddf = _canon(con.execute(oracles[name]).df())
            rows_ok = len(sdf) == len(ddf)
            cols_ok = list(sdf.columns) == list(ddf.columns)
            dtypes_ok = rows_ok and cols_ok and all(
                sdf[c].dtype == ddf[c].dtype for c in sdf.columns
            )
            hash_ok = (rows_ok and cols_ok
                       and _value_hash(sdf) == _value_hash(ddf))
            ok = rows_ok and cols_ok and hash_ok
            flag = "OK  " if ok else "FAIL"
            detail = ""
            if not ok:
                failures += 1
                if not cols_ok:
                    detail = f" cols {list(sdf.columns)} vs {list(ddf.columns)}"
                elif not rows_ok:
                    detail = f" rows {len(sdf)} vs {len(ddf)}"
                elif not dtypes_ok:
                    detail = " dtypes " + str(
                        [(c, str(sdf[c].dtype), str(ddf[c].dtype))
                         for c in sdf.columns
                         if sdf[c].dtype != ddf[c].dtype]
                    )
                else:
                    diff = sdf.compare(ddf) if sdf.shape == ddf.shape else None
                    detail = f" value mismatch; first diffs:\n{diff.head(3) if diff is not None else '?'}"
            print(f"{flag} {name} rows={len(sdf)}{detail}")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    print(f"\n{len(names) - failures}/{len(names)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
