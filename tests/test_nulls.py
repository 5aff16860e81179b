"""NULL-differential gate: inject deterministic NULLs into the
value-typed columns of the test tables and require every suite query to
STILL agree with its DuckDB oracle. NULL semantics are where engines
quietly diverge (DuckDB's min_by/max_by skip NULL values, Spark's
don't; array_to_string drops NULL elements; pandas cumsum poisons the
tail with NaN) — each of those was found and pinned by this sweep."""

import math
import struct

import pytest

# Round-11 test-budget tier (see pytest.ini): this module is the
# slow tier — excluded from the default (driver-budgeted) run,
# executed with `pytest -m "" tests/` before every baseline refresh.
pytestmark = pytest.mark.slow

from renoir_spark import suite

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# deterministic NULL injection: value-typed / optional columns (ids and
# join keys stay non-null — NULL-key semantics are covered per-operator
# in tests/test_edges.py and tests/test_round4.py)
RULES = {
    "events": {"value": "event_id % 7 = 0", "props": "event_id % 11 = 0"},
    "documents": {"lang": "doc_id % 5 = 0", "source": "doc_id % 9 = 0"},
    "lineitem": {"l_comment": "l_orderkey % 13 = 0"},
    "orders": {"o_comment": "o_orderkey % 13 = 0"},
}


@pytest.fixture(scope="module")
def null_dir(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("sfnull"))
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for col, cond in RULES.get(t, {}).items():
            if col in df.columns:
                df = df.withColumn(
                    col, F.expr(f"CASE WHEN {cond} THEN NULL ELSE {col} END")
                )
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def null_duck(null_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_dir}/{t}.parquet/*.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else struct.pack(">d", v).hex()
    return v


@pytest.mark.parametrize("name", sorted(suite.QUERIES))
def test_query_matches_oracle_with_nulls(name, spark, null_dir, null_duck):
    sdf = suite.QUERIES[name](spark, null_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(_norm(r.asDict(recursive=True)[c]) for c in scols)
         for r in sdf.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )
    res = null_duck.execute(suite.ORACLE[name])
    dcols = [d[0] for d in res.description]
    idx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(
        (tuple(_norm(r[i]) for i in idx) for r in res.fetchall()),
        key=lambda t: tuple(str(x) for x in t),
    )
    assert scols == sorted(dcols), f"{name}: columns {scols} vs {sorted(dcols)}"
    assert len(srows) == len(drows), (
        f"{name}: {len(srows)} vs {len(drows)} rows"
    )
    mism = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mism, f"{name}: first mismatches: {mism[:3]}"
    spark.catalog.clearCache()
