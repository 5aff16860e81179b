"""Windows — descriptors + WindowedStream aggregators (batch semantics).

Reference parity: renoir builds a per-key ``WindowManager`` from a
``WindowDescription`` and feeds ``WindowAccumulator`` clones
(src/operator/window/mod.rs:23-44,61-78). Spark-first: every descriptor
compiles to either

- **group mode**: a derived window-id column + ``groupBy(keys, window_id)``
  (tumbling/sliding event-time, session, count, transaction, all), or
- **frame mode**: a ``Window.partitionBy(keys).orderBy(...).rowsBetween``
  frame (LastK), i.e. one aggregate row PER ELEMENT.

Streaming variants live in streaming.py; these are the bounded-data
semantics (renoir aggregations are terminal folds, src/operator/mod.rs:702).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import named_cols, to_col, ts_micros


def _dur(seconds: float) -> str:
    if float(seconds).is_integer():
        return f"{int(seconds)} seconds"
    return f"{int(seconds * 1000)} milliseconds"


@dataclass
class _Assigned:
    df: DataFrame
    group_cols: list  # names of grouping columns (beyond keys)
    out_cols: list  # Columns projecting window identity into the result
    order_col: Optional[str]  # intra-window ordering column (for first/last)
    exact_size: Optional[int] = None  # count windows: keep only full windows


class WindowDescription:
    mode = "group"

    def assign(self, keyed) -> _Assigned:  # pragma: no cover - abstract
        raise NotImplementedError


class EventTimeWindow(WindowDescription):
    """Event-time tumbling/sliding windows — renoir ``EventTimeWindow``
    (src/operator/window/descr/event_time.rs:112-129). Batch: the built-in
    ``F.window`` bucketing (multi-assignment for sliding)."""

    def __init__(self, ts, size: float, slide: Optional[float] = None) -> None:
        self.ts = ts
        self.size = size
        self.slide = slide or size

    @classmethod
    def tumbling(cls, ts, size: float) -> "EventTimeWindow":
        return cls(ts, size)

    @classmethod
    def sliding(cls, ts, size: float, slide: float) -> "EventTimeWindow":
        return cls(ts, size, slide)

    def assign(self, keyed) -> _Assigned:
        df = keyed.df
        # an already-cast timestamp column passes through untouched: a
        # withColumn would REPLACE it with a new expression, and on
        # streaming input that silently discards the watermark tag
        # (Spark then rejects append-mode aggregation)
        if isinstance(self.ts, str) and dict(df.dtypes).get(self.ts) == "timestamp":
            ets = self.ts
        else:
            df = df.withColumn("__ets", to_col(self.ts).cast("timestamp"))
            ets = "__ets"
        df = df.withColumn(
            "__win", F.window(ets, _dur(self.size), _dur(self.slide))
        )
        out = [
            F.col("__win.start").alias("win_start"),
            F.col("__win.end").alias("win_end"),
        ]
        return _Assigned(df, ["__win"], out, ets)


class SessionWindow(WindowDescription):
    """Session windows by inactivity gap — renoir ``SessionWindow``
    (src/operator/window/descr/session.rs:67-76; renoir gap is wall-clock,
    ours is event-time which is the deterministic superset). Batch:
    lag + cumulative-sum island labelling — one shuffle, no UDF.

    All time arithmetic is EXACT integer epoch-microseconds (``__sts`` is
    a LONG): gap comparison and durations are bit-exact, never subject to
    double rounding. Aggregate durations from ``__sts`` as integers and
    divide only at the final projection."""

    def __init__(self, ts, gap: float) -> None:
        self.ts = ts
        self.gap_us = int(round(float(gap) * 1_000_000))

    def assign(self, keyed) -> _Assigned:
        w = Window.partitionBy(*keyed.keys).orderBy("__sts")
        df = keyed.df.withColumn("__sts", ts_micros(self.ts))
        new_sess = (
            (F.col("__sts") - F.lag("__sts").over(w) > F.lit(self.gap_us))
            .cast("int")
        )
        df = df.withColumn("__sess", F.coalesce(new_sess, F.lit(0)))
        df = df.withColumn("__sess", F.sum("__sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        return _Assigned(df, ["__sess"], [F.col("__sess").alias("session_id")], "__sts")


class CountWindow(WindowDescription):
    """Count-based windows — renoir ``CountWindow``
    (src/operator/window/descr/count.rs:99-131): per key, window w covers
    element positions [w*slide, w*slide+size); ``exact`` drops the final
    partial windows. Arrival order is nondeterministic in renoir; we
    require an explicit ``order`` column (deterministic, testable).

    Scale note: position = row_number per key (one shuffle+sort); sliding
    multi-assignment via ``sequence``+``explode`` (≤ size/slide copies),
    all JVM-side."""

    def __init__(self, order, size: int, slide: Optional[int] = None,
                 exact: bool = True) -> None:
        self.order = order
        self.size = int(size)
        self.slide = int(slide or size)
        self.exact = exact

    @classmethod
    def tumbling(cls, order, size: int, exact: bool = True) -> "CountWindow":
        return cls(order, size, size, exact)

    @classmethod
    def sliding(cls, order, size: int, slide: int, exact: bool = True) -> "CountWindow":
        return cls(order, size, slide, exact)

    def assign(self, keyed) -> _Assigned:
        w = Window.partitionBy(*keyed.keys).orderBy(to_col(self.order))
        df = keyed.df.withColumn("__pos", F.row_number().over(w) - 1)
        lo = F.greatest(
            F.lit(0),
            F.floor((F.col("__pos") - F.lit(self.size - self.slide)) / F.lit(self.slide)),
        )
        hi = F.floor(F.col("__pos") / F.lit(self.slide))
        # slide > size is legal (count.rs:112-124 asserts only slide > 0):
        # gap positions belong to NO window (lo > hi) — emit an empty
        # array so explode drops them instead of producing a descending
        # sequence that pollutes neighboring windows.
        wids = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<bigint>")
        )
        df = df.withColumn("__wid", F.explode(wids))
        return _Assigned(
            df,
            ["__wid"],
            [F.col("__wid").alias("window_id")],
            "__pos",
            exact_size=self.size if self.exact else None,
        )


class LastKWindow(WindowDescription):
    """Per-element trailing window of ≤k elements — renoir ``LastKWindow``
    (src/operator/window/descr/last_k.rs:90-105). Exactly a sliding row
    frame: ``rowsBetween(-(k-1), 0)``."""

    mode = "frame"

    def __init__(self, order, k: int) -> None:
        self.order = order
        self.k = int(k)

    def frame(self, keyed):
        return (
            Window.partitionBy(*keyed.keys)
            .orderBy(to_col(self.order))
            .rowsBetween(-(self.k - 1), 0)
        )


class AllWindow(WindowDescription):
    """Everything-until-end window — renoir ``AllWindow``
    (src/operator/window/descr/all.rs:51-58) → plain groupBy(keys)."""

    def assign(self, keyed) -> _Assigned:
        return _Assigned(keyed.df, [], [], None)


class ProcessingTimeWindow(WindowDescription):
    """Wall-clock windows — renoir ``ProcessingTimeWindow``
    (src/operator/window/descr/processing_time.rs:92-107). Documented
    divergence: micro-batch Spark has no per-element wall clock; in batch
    we stamp ``current_timestamp`` at evaluation, so bounded input lands
    in ONE window — semantically renoir's behavior when data arrives
    faster than the window size."""

    def __init__(self, size: float, slide: Optional[float] = None) -> None:
        self.size = size
        self.slide = slide or size

    def assign(self, keyed) -> _Assigned:
        df = keyed.df.withColumn("__pts", F.current_timestamp())
        df = df.withColumn("__win", F.window("__pts", _dur(self.size), _dur(self.slide)))
        out = [F.col("__win.start").alias("win_start"), F.col("__win.end").alias("win_end")]
        return _Assigned(df, ["__win"], out, None)


class TransactionWindow(WindowDescription):
    """User-logic-closed windows — renoir ``TransactionWindow``
    (src/operator/window/descr/transaction.rs:99-122), ops
    Continue/Commit/Discard (:4-17). One active window per key; the
    user fn sees each row (dict) + a mutable state dict and returns one of
    'continue' | 'commit' | 'discard'. Batch: per-key ordered pandas pass
    assigning window ids (Arrow grouped-map), then group mode."""

    def __init__(self, order, logic: Callable) -> None:
        self.order = order
        self.logic = logic

    def assign(self, keyed) -> _Assigned:
        import pandas as pd

        order = self.order
        logic = self.logic
        schema_df = keyed.df.withColumn("__txn", F.lit(0).cast("long"))
        schema = schema_df.schema

        def _assign(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(order).reset_index(drop=True)
            wids, cur, state = [], 0, {}
            drop_mask = []
            for row in pdf.to_dict("records"):
                action = logic(row, state)
                wids.append(cur)
                drop_mask.append(action == "discard")
                if action in ("commit", "discard"):
                    cur += 1
                    state = {}
            pdf["__txn"] = pd.Series(wids, dtype="int64")
            if any(drop_mask):
                import numpy as np

                bad = pdf["__txn"].isin(pdf["__txn"][np.array(drop_mask)])
                pdf = pdf[~bad]
            return pdf

        # one sorted-partition Python pass, not a per-key Arrow round trip
        # (1 500 user groups cost more in per-group overhead than the rows)
        from .util import grouped_apply_sorted

        df = grouped_apply_sorted(
            keyed.df, keyed.keys, [order] if isinstance(order, str) else list(order),
            _assign, schema,
        )
        return _Assigned(df, ["__txn"], [F.col("__txn").alias("window_id")], None)


class WindowedStream:
    """A keyed stream + window description — renoir ``WindowedStream``
    (src/stream.rs:92-101). Aggregators mirror
    src/operator/window/aggr/*: sum/count/min/max/first/last/fold/
    to_vec/map(to_arrow)/window_join."""

    def __init__(self, keyed, descr: WindowDescription) -> None:
        self.keyed = keyed
        self.descr = descr

    # -- generic fold over window contents ----------------------------- #

    def fold(self, *aggs, **named):
        """renoir window ``fold`` (aggr/fold.rs:126-142) for expression
        aggregates — with frame descriptors this is a per-element
        analytic; with group descriptors a grouped aggregate."""
        from .stream import Stream

        if self.descr.mode == "frame":
            if aggs:
                raise ValueError("frame windows need keyword aggregates (name=expr)")
            frame = self.descr.frame(self.keyed)
            df = self.keyed.df
            for name, e in named.items():
                df = df.withColumn(name, to_col(e).over(frame))
            return self.keyed._stream(df)

        a = self.descr.assign(self.keyed)
        gcols = [*self.keyed.keys, *a.group_cols]
        agg_list = list(named_cols(aggs, named))
        if a.exact_size is not None:
            agg_list.append(F.count(F.lit(1)).alias("__wcount"))
        out = a.df.groupBy(*gcols).agg(*agg_list)
        if a.exact_size is not None:
            out = out.filter(F.col("__wcount") == a.exact_size).drop("__wcount")
        names = [c for c in out.columns if not c.startswith("__")]
        proj = [F.col(k) for k in self.keyed.keys] + a.out_cols + [
            F.col(n) for n in names if n not in self.keyed.keys
        ]
        return self.keyed._stream(out.select(*proj))

    # -- named aggregators (aggr/{sum,count,min,max,first,last}.rs) ---- #

    def sum(self, col, alias: str = "sum"):
        return self.fold(**{alias: F.sum(to_col(col))})

    def count(self, alias: str = "count"):
        return self.fold(**{alias: F.count(F.lit(1))})

    def min(self, col, alias: str = "min"):
        return self.fold(**{alias: F.min(to_col(col))})

    def max(self, col, alias: str = "max"):
        return self.fold(**{alias: F.max(to_col(col))})

    def _ordered(self, col, alias, pick):
        if self.descr.mode == "frame":
            order = to_col(self.descr.order)
        else:
            a = self.descr.assign(self.keyed)
            if a.order_col is None:
                raise ValueError("first/last need an ordered window descriptor")
            order = F.col(a.order_col)
        return self.fold(**{alias: pick(to_col(col), order)})

    def first(self, col, alias: str = "first"):
        """renoir window ``first`` (aggr/first.rs:32) — by window order."""
        return self._ordered(col, alias, F.min_by)

    def last(self, col, alias: str = "last"):
        """renoir window ``last`` (aggr/last.rs:30)."""
        return self._ordered(col, alias, F.max_by)

    def to_vec(self, col, alias: str = "items"):
        """renoir ``to_vec`` (aggr/collect_vec.rs:44-56): window contents
        as an array, in window order (deterministic via sort_array on
        (order, value) structs)."""
        if self.descr.mode == "frame":
            return self.fold(**{alias: F.collect_list(to_col(col))})
        a = self.descr.assign(self.keyed)
        if a.order_col is not None:
            packed = F.array_sort(
                F.collect_list(F.struct(F.col(a.order_col).alias("o"),
                                        to_col(col).alias("v")))
            )
            expr = F.transform(packed, lambda x: x["v"])
        else:
            expr = F.array_sort(F.collect_list(to_col(col)))
        return self.fold(**{alias: expr})

    def map(self, fn: Callable, schema):
        """renoir window ``map``/``to_arrow`` (aggr/collect.rs:47,
        aggr/to_arrow.rs:60-70): the window contents arrive as ONE pandas
        DataFrame (Arrow batch) — ``fn(pdf) -> pdf``."""
        from .stream import Stream

        if self.descr.mode == "frame":
            raise ValueError("map over frame windows: use LastK via fold exprs")
        from .util import grouped_apply_sorted

        a = self.descr.assign(self.keyed)
        gcols = [*self.keyed.keys, *a.group_cols]
        order = [a.order_col] if a.order_col is not None else []
        # one sorted-partition Python pass (not per-group Arrow round
        # trips — dominant with many small windows); pdf arrives in
        # window order when the descriptor defines one
        return Stream(
            self.keyed.ctx,
            grouped_apply_sorted(a.df, gcols, order, fn, schema),
        )

    def window_join(self, other, *, allow_ordinal: bool = False):
        """Join same-key same-window elements — renoir ``window_join``
        (src/operator/window/aggr/join.rs:79). Both sides get the same
        descriptor assignment; equi-join on (key, window).

        Only TIME-ALIGNED descriptors (EventTimeWindow) give the
        reference's same-window semantics: ordinal descriptors (count /
        session / transaction) number windows independently per side, so
        window #N left has no temporal relation to #N right. Pass
        ``allow_ordinal=True`` to accept that divergence explicitly."""
        from .stream import Stream

        if not isinstance(self.descr, EventTimeWindow) and not allow_ordinal:
            raise ValueError(
                "window_join needs a time-aligned descriptor (EventTimeWindow); "
                "ordinal descriptors number windows independently per side — "
                "pass allow_ordinal=True to accept the divergence"
            )
        a = self.descr.assign(self.keyed)
        if isinstance(self.descr, EventTimeWindow):
            descr_r = EventTimeWindow(self.descr.ts, self.descr.size, self.descr.slide)
        else:
            descr_r = self.descr
        b = descr_r.assign(other)
        lgroup = [*self.keyed.keys, *a.group_cols]
        ldf = a.df
        rdf = b.df
        overlap = (set(ldf.columns) & set(rdf.columns)) - set(lgroup)
        for c in overlap:
            rdf = rdf.withColumnRenamed(c, f"{c}_r")
        out = ldf.join(rdf, lgroup, "inner")
        proj = [F.col(k) for k in self.keyed.keys] + a.out_cols + [
            F.col(c) for c in out.columns
            if c not in lgroup and not c.startswith("__")
        ]
        return self.keyed._stream(out.select(*proj))


class GlobalWindowedStream:
    """Whole-stream windows — renoir ``Stream::window_all``
    (src/operator/window/mod.rs:353-362): the reference forces
    ``Replication::One`` plus a unit key and windows everything. Here the
    unit key is a literal column and the aggregation stays PARALLEL —
    Catalyst's partial/final two-phase aggregate combines executor-side
    before the single-key exchange, so the plan keeps map-side combining
    where renoir funnels raw elements to one replica. Every
    ``WindowedStream`` aggregator is available; the synthetic key never
    appears in results."""

    UNIT = "__unit"

    def __init__(self, windowed: "WindowedStream") -> None:
        self._windowed = windowed

    def __getattr__(self, name):
        attr = getattr(self._windowed, name)
        if not callable(attr):
            return attr

        def call(*args, **kwargs):
            return self._strip(attr(*args, **kwargs))

        return call

    @staticmethod
    def _strip(res):
        from .stream import Stream

        if isinstance(res, Stream) and GlobalWindowedStream.UNIT in res.df.columns:
            return res._new(res.df.drop(GlobalWindowedStream.UNIT))
        return res
