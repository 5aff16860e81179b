"""Empty-input robustness gate: every suite query must run — and agree
with its DuckDB oracle — when every table is EMPTY (same schemas, zero
rows). At 100 TB scale empty inputs are routine (a filter that matches
nothing, an empty partition of a date range, a cold-start corpus); an
operator that divides by a global count or indexes into collected seeds
crashes exactly here, not at sf0.1."""

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


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf0"))
    for t in TABLES:
        (spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0)
         .coalesce(1).write.mode("overwrite").parquet(f"{d}/{t}.parquet"))
    return d


@pytest.fixture(scope="module")
def empty_duck(empty_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            # Spark writes a directory; DuckDB needs the part-file glob
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_dir}/{t}.parquet/*.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else struct.pack(">d", v).hex()
    return v


# Documented empty-input divergences (spark_rows, oracle_rows) — each is a
# formulation difference, not an operator bug, and is pinned here so a
# behavior change still fails the gate:
# - q57: a global fold emits ONE row even on empty input (renoir's fold
#   emits the folded init at end-of-stream; Spark global aggregates
#   agree), while the unrolled SQL oracle's final join yields none.
# - q89: the recursive-CTE oracle seeds the source vertex literally, so
#   it reports (100, 0) even when the graph has no vertices; the Spark
#   side derives vertices from the (empty) tables.
# - q91: Spark's rollup on empty input emits no rows; SQL GROUP BY
#   ROLLUP emits the grand-total row (the divergence already documented
#   in the operator's edge-case tests).
KNOWN_EMPTY_DIVERGENCES = {
    "q57_logistic_regression": (1, 0),
    "q89_sssp": (0, 1),
    "q91_rollup": (0, 1),
}


@pytest.mark.parametrize("name", sorted(suite.QUERIES))
def test_query_survives_empty_input(name, spark, empty_dir, empty_duck):
    sdf = suite.QUERIES[name](spark, empty_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(_norm(r.asDict(recursive=True)[c]) for c in scols)
         for r in sdf.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )
    res = empty_duck.execute(suite.ORACLE[name])
    dcols = [d[0] for d in res.description]
    idx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(
        (tuple(_norm(r[i]) for i in idx) for r in res.fetchall()),
        key=lambda t: tuple(str(x) for x in t),
    )
    assert scols == sorted(dcols), f"{name}: columns {scols} vs {sorted(dcols)}"
    if name in KNOWN_EMPTY_DIVERGENCES:
        assert (len(srows), len(drows)) == KNOWN_EMPTY_DIVERGENCES[name], (
            f"{name}: documented empty-input divergence changed: "
            f"{len(srows)} vs {len(drows)}"
        )
    else:
        assert srows == drows, f"{name}: {srows[:3]} vs {drows[:3]}"
    spark.catalog.clearCache()
