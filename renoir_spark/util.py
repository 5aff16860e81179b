"""Small shared helpers for the renoir_spark engine."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_col(c) -> Column:
    """Accept a Column or a column-name/SQL-expression string."""
    if isinstance(c, Column):
        return c
    if isinstance(c, str):
        return F.expr(c)
    raise TypeError(f"expected Column or str, got {type(c).__name__}")


def to_cols(cols) -> list[Column]:
    return [to_col(c) for c in cols]


def named_cols(exprs, named) -> list[Column]:
    """Positional exprs + keyword exprs aliased by keyword name."""
    out = to_cols(exprs)
    out.extend(to_col(e).alias(name) for name, e in named.items())
    return out


def ts_seconds(c) -> Column:
    """Numeric epoch seconds for a timestamp/numeric column.

    Timestamps become DOUBLE seconds since epoch (UTC); numeric columns
    pass through as DOUBLE. Keeps band/interval arithmetic type-stable.
    """
    col = to_col(c)
    return col.cast("timestamp").cast("double")


def ts_micros(c) -> Column:
    """Exact epoch microseconds (LONG) — integer arithmetic so band/range
    boundaries are bit-exact (no double rounding at the 16th digit)."""
    return F.unix_micros(to_col(c).cast("timestamp"))
