"""Join strategy builder.

Reference parity: renoir decomposes a join into ship strategy × local
strategy × variant (src/operator/join/mod.rs:230-246):

- ``ship_hash``            → shuffle both sides on the key
- ``ship_broadcast_right`` → broadcast the right side (join/mod.rs:320-324)
- ``local_hash``           → hash join          (join/local_hash.rs)
- ``local_sort_merge``     → sort-merge join    (join/local_sort_merge.rs)
- ``inner/left/outer``     → variant            (join/mod.rs:29-53)

On Spark these are HINTS, not separate implementations: Catalyst + AQE pick
the physical join; the builder forwards the user's choice as
``broadcast`` / ``shuffle_hash`` / ``merge`` hints.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from .stream import Stream


class JoinBuilder:
    def __init__(self, left: "Stream", right: "Stream", left_on, right_on) -> None:
        self._left = left
        self._right = right
        self._lon = [left_on] if isinstance(left_on, str) else list(left_on)
        self._ron = [right_on] if isinstance(right_on, str) else list(right_on)
        self._ship = "hash"
        self._local = None  # let Catalyst choose unless forced

    def ship_hash(self) -> "JoinBuilder":
        """Hash-partition both sides (join/mod.rs:267-285)."""
        self._ship = "hash"
        return self

    def ship_broadcast_right(self) -> "JoinBuilder":
        """Left stays put, right broadcast (join/mod.rs:320-324)."""
        self._ship = "broadcast"
        return self

    def local_hash(self) -> "JoinBuilder":
        """Hash join locally (join/ship.rs:92-97)."""
        self._local = "shuffle_hash"
        return self

    def local_sort_merge(self) -> "JoinBuilder":
        """Sort-merge join locally (join/ship.rs:99-110)."""
        self._local = "merge"
        return self

    def inner(self) -> "Stream":
        return self._run("inner")

    def left(self) -> "Stream":
        return self._run("left")

    def outer(self) -> "Stream":
        return self._run("full")

    def _run(self, how: str) -> "Stream":
        ldf, rdf = self._left.df, self._right.df
        overlap = set(ldf.columns) & set(rdf.columns)
        renames = {c: f"{c}_r" for c in overlap}
        for old, new in renames.items():
            rdf = rdf.withColumnRenamed(old, new)
        ron = [renames.get(c, c) for c in self._ron]

        if self._ship == "broadcast":
            rdf = F.broadcast(rdf)
        elif self._local:  # explicit local strategy → hint on the right side
            rdf = rdf.hint(self._local)

        cond = None
        for lc, rc in zip(self._lon, ron):
            c = ldf[lc] == rdf[rc]
            cond = c if cond is None else (cond & c)
        out = ldf.join(rdf, cond, how)
        from .stream import Stream

        return Stream(self._left.ctx, out)
