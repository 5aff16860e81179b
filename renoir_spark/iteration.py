"""Iteration — driver-side loops over DataFrames (SURVEY.md §2.9).

Reference parity: renoir's iteration subsystem
(src/operator/iteration/{iterate.rs,replay.rs,iterate_delta.rs,mod.rs}) wires
a feedback edge into the dataflow graph with a leader block coordinating a
shared read-only state. Spark has no feedback edges, so the idiomatic mapping
is a DRIVER loop over DataFrames — which is exactly what renoir's
IterationLeader does too (collect state updates, decide, broadcast), just
expressed in the host language.

Scale discipline (the part renoir gets for free from its runtime):

- every iteration's output is ``persist()``-ed and the previous one released,
  so the feedback never recomputes the whole history;
- lineage is cut with ``localCheckpoint(eager=True)`` every
  ``checkpoint_every`` iterations — without this the logical plan doubles
  per round and Catalyst analysis time explodes long before the data does;
- the per-iteration driver synchronization is ONE small action (the state
  fold / delta count), mirroring renoir's leader barrier
  (src/operator/iteration/leader.rs:26-100).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import free_local_checkpoint, is_local_checkpoint


def _release_round(df: DataFrame, stale: list) -> None:
    """Release a superseded per-round frame. ``persist``-ed frames are
    freed immediately (later rounds recompute through lineage if ever
    evicted — slow, never wrong). Checkpointed frames are DEFERRED onto
    ``stale``: a live persist may still hold a recompute path through
    them (freeing a checkpoint severs lineage — a cache-evicted
    descendant would die with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), so
    their blocks are only freed after the loop's final eager checkpoint
    makes every intermediate unreachable. Bounds the old behavior —
    Dataset.unpersist silently NO-OPs on checkpoint blocks, leaking
    ~num_iterations/checkpoint_every state copies per call until
    session end — to the loop's own lifetime."""
    if is_local_checkpoint(df):
        stale.append(df)
    else:
        df.unpersist()


@contextmanager
def _loop_confs(spark, adaptive: Optional[bool], shuffle_partitions: Optional[int]):
    """Temporarily pin loop-relevant session confs for the iteration body.

    ``adaptive``: AQE re-optimizes EVERY shuffle stage; for an iteration
    of many small rounds that planning latency dominates (measured 4-6×
    on the CC query at sf0.1). Default for loops is therefore ``False``;
    pass ``True`` when each round shuffles enough data for skew/coalesce
    re-planning to pay for itself (the 100 TB regime), or ``None`` to
    leave the session setting untouched.

    ``shuffle_partitions``: per-round shuffles should be sized to the
    STATE volume, not the session default — an iteration over a 15k-row
    state with 32 (or 200) shuffle partitions pays round-count ×
    partition-count task-scheduling latency for near-empty partitions.
    Size it as state_bytes / target_partition_size; ``None`` leaves the
    session setting untouched."""
    pins = {}
    if adaptive is not None:
        pins["spark.sql.adaptive.enabled"] = str(adaptive).lower()
    if shuffle_partitions is not None:
        pins["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if not pins:
        yield
        return
    defaults = {"spark.sql.adaptive.enabled": "true",
                "spark.sql.shuffle.partitions": "200"}
    old = {k: spark.conf.get(k, defaults[k]) for k in pins}
    for k, v in pins.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


class IterationStateHandle:
    """Read-only view of the loop state inside the body — renoir
    ``IterationStateHandle`` (src/operator/iteration/mod.rs:88-118). The
    body must only read (renoir enforces this at runtime; here the value
    is a plain Python object handed to driver code, so the contract is
    documented, not policed)."""

    def __init__(self, value) -> None:
        self._value = value

    def get(self):
        return self._value


def _materialize(df: DataFrame, it: int, checkpoint_every: int) -> DataFrame:
    """Persist an iteration result; cut lineage periodically."""
    if checkpoint_every and (it + 1) % checkpoint_every == 0:
        # localCheckpoint truncates the logical plan (eager) — the driver
        # loop's plan would otherwise grow linearly and analysis cost
        # super-linearly with the iteration count.
        return df.localCheckpoint(eager=True)
    return df.persist()


def iterate(
    stream,
    num_iterations: int,
    initial_state,
    body: Callable,
    state_update: Callable[[object, DataFrame], object],
    loop_condition: Optional[Callable[[object], bool]] = None,
    *,
    checkpoint_every: int = 4,
    adaptive: Optional[bool] = False,
    shuffle_partitions: Optional[int] = None,
):
    """Feedback loop — renoir ``iterate``
    (src/operator/iteration/iterate.rs:306-439): the body's output is fed
    back as the next iteration's input; a shared state is folded from the
    body output each round and consulted by ``loop_condition``.

    Spark-first restatement of renoir's (local_fold, global_fold) pair:
    ``state_update(state, df) -> new_state`` receives the iteration's
    output DataFrame and may run any aggregation on it — Catalyst plans
    the local/global two phases renoir makes the user write by hand.

    Returns ``(final_state, last_iteration_stream)`` — the same two
    results as the reference (state stream + elements of the last
    iteration).
    """
    df = stream.df
    state = initial_state
    prev_cached: Optional[DataFrame] = None
    stale: list = []
    with _loop_confs(df.sparkSession, adaptive, shuffle_partitions):
        for it in range(num_iterations):
            out = body(stream._new(df), IterationStateHandle(state)).df
            out = _materialize(out, it, checkpoint_every)
            state = state_update(state, out)
            # materialize BEFORE releasing the previous round (renoir's
            # leader barrier, leader.rs:26-100): unpersisting a parent of
            # a lazy cache would silently rebuild the whole chain later
            out.count()
            if prev_cached is not None:
                _release_round(prev_cached, stale)
            prev_cached = out
            df = out
            if loop_condition is not None and not loop_condition(state):
                break
    # cut the returned lineage (see delta_iterate): analysis of the
    # final plan otherwise replays every round's logical history, and a
    # cache eviction would recompute the whole chain; once the checkpoint
    # holds the data every intermediate (incl. deferred checkpoint
    # blocks) is unreachable and freed for real
    if df is not stream.df:
        final = df.localCheckpoint(eager=True)
        if prev_cached is not None:
            stale.append(prev_cached)
        for d in stale:
            free_local_checkpoint(d)
        df = final
    return state, stream._new(df)


def replay(
    stream,
    num_iterations: int,
    initial_state,
    body: Callable,
    state_update: Callable[[object, DataFrame], object],
    loop_condition: Optional[Callable[[object], bool]] = None,
    *,
    checkpoint_every: int = 4,
    adaptive: Optional[bool] = False,
    shuffle_partitions: Optional[int] = None,
):
    """Replay loop — renoir ``replay``
    (src/operator/iteration/replay.rs:256-300): the SAME input is re-fed
    to the body every iteration; only the state evolves. Returns the final
    state (the reference returns a one-element state stream).

    The input is cached once (renoir replays from the source block's
    buffer — ``persist`` is the analog; side-input caching is
    src/stream.rs:213-228)."""
    cached_in = stream.df.persist()
    replay_stream = stream._new(cached_in)
    state = initial_state
    prev: Optional[DataFrame] = None
    stale: list = []
    with _loop_confs(cached_in.sparkSession, adaptive, shuffle_partitions):
        for it in range(num_iterations):
            out = body(replay_stream, IterationStateHandle(state)).df
            out = _materialize(out, it, checkpoint_every)
            state = state_update(state, out)
            out.count()  # round barrier — see iterate()
            if prev is not None:
                _release_round(prev, stale)
            prev = out
            if loop_condition is not None and not loop_condition(state):
                break
    # replay returns only the driver-side state: every per-round frame
    # (including deferred checkpoint blocks) is dead here
    if prev is not None:
        stale.append(prev)
    for d in stale:
        free_local_checkpoint(d)
    cached_in.unpersist()
    return state


def delta_iterate(
    keyed,
    num_iterations: int,
    body: Callable,
    merge: Optional[Callable] = None,
    *,
    checkpoint_every: int = 4,
    adaptive: Optional[bool] = False,
    shuffle_partitions: Optional[int] = None,
):
    """Keyed incremental iteration — renoir ``delta_iterate``
    (src/operator/iteration/iterate_delta.rs:104-140): per-key state,
    the body turns the current state into a stream of per-key DELTAS,
    deltas are merged into the state, and the loop ends when an iteration
    produces no deltas (renoir's ``condition``/``something_changed``
    machinery) or after ``num_iterations``.

    Spark-first (Pregel shape, cf. GraphX): the per-key state is a
    DataFrame keyed by ``keyed.keys``;

    - ``body(state: KeyedStream, iteration: int) -> Stream`` emits delta
      rows with the same key columns (only keys that CHANGE — emptiness
      is the termination test, exactly the reference's contract);
    - ``merge(state: KeyedStream, delta: KeyedStream) -> Stream`` folds
      deltas into the state; the default keeps the state row unless a
      delta for its key exists (delta overrides — renoir's
      ``process_delta`` for simple replacement semantics).

    Each round costs one shuffle for the body's aggregation plus one
    key-partitioned merge join; both sides hash-partition on the same key
    so Spark reuses the exchange (EnsureRequirements).
    """
    from .keyed import KeyedStream

    keys = list(keyed.keys)
    if merge is None:
        def merge(state: "KeyedStream", delta: "KeyedStream"):
            value_cols = [c for c in state.df.columns if c not in keys]
            d = delta.df
            for c in value_cols:
                d = d.withColumnRenamed(c, f"__d_{c}")
            joined = state.df.join(d, keys, "left")
            out = joined.select(
                *keys,
                *[
                    F.coalesce(F.col(f"__d_{c}"), F.col(c)).alias(c)
                    for c in value_cols
                ],
            )
            return state._stream(out)

    state_df = keyed.df
    # ONE action per round (the delta count — renoir's leader barrier,
    # leader.rs:26-100): counting round r's delta executes the persisted
    # state_{r-1} plan and thereby populates its cache, so generation
    # r-2 (state and delta) can be released AFTER that barrier instead
    # of paying a second materializing count per round.
    prev_state: Optional[DataFrame] = None
    prev_delta: Optional[DataFrame] = None
    stale: list = []
    with _loop_confs(state_df.sparkSession, adaptive, shuffle_partitions):
        for it in range(num_iterations):
            state_ks = KeyedStream(keyed.ctx, state_df, keys)
            delta_df = body(state_ks, it).df.persist()
            n_delta = delta_df.count()  # leader barrier
            if prev_state is not None:
                _release_round(prev_state, stale)
                prev_state = None
            if prev_delta is not None:
                prev_delta.unpersist()  # deltas are always persists
                prev_delta = None
            if n_delta == 0:
                delta_df.unpersist()
                break
            new_state = merge(
                KeyedStream(keyed.ctx, state_df, keys),
                KeyedStream(keyed.ctx, delta_df, keys),
            ).df
            new_state = _materialize(new_state, it, checkpoint_every)
            if it > 0:
                prev_state = state_df
            prev_delta = delta_df
            state_df = new_state
    # cut the returned lineage: each round's merge references the prior
    # state TWICE (body + merge), so the logical plan doubles per round
    # between checkpoints — execution is cache-saved, but ANALYSIS of the
    # final plan is exponential in rounds-since-checkpoint (measured: the
    # q83 component loop compiled to a 1000-exchange plan string). The
    # eager checkpoint re-reads the already-persisted state once and
    # hands callers an O(1) plan that also survives cache eviction.
    if state_df is not keyed.df:
        final = state_df.localCheckpoint(eager=True)
        # the checkpoint copied the data, so the loop's last relations —
        # and every deferred checkpoint generation — are unreachable
        # through the returned stream; free them for real
        for d in (state_df, prev_state, prev_delta):
            if d is not None:
                stale.append(d)
        for d in stale:
            free_local_checkpoint(d)
        state_df = final
    return KeyedStream(keyed.ctx, state_df, keys)
