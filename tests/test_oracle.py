"""Every suite query vs its DuckDB oracle, mirroring the driver protocol:
row count + column set + order-insensitive values. Floats compare
BIT-EXACT (IEEE bytes): the queries control rounding on both engines, so
any representation drift — sum association, libm ulp noise, rounding-mode
divergence — is a real regression the driver's value hash would also
catch."""

import math
import struct

import pytest

from renoir_spark import suite


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return struct.pack(">d", v).hex()
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        out.append(tuple(_normalize(d[c]) for c in cols))
    return cols, sorted(out, key=lambda t: tuple(str(x) for x in t))


def _duck_rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in res.fetchall():
        out.append(tuple(_normalize(r[i]) for i in idx))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(suite.QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = suite.QUERIES[name](spark, sf_dir)
    scols, srows = _spark_rows(sdf)
    dcols, drows = _duck_rows(duck, suite.ORACLE[name])
    assert scols == dcols, f"{name}: column sets differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row counts differ: {len(srows)} vs {len(drows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"
