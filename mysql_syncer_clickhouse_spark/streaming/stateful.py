"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps exactly one piece of cross-batch state: per-op
insert/update/delete counters served by /stat (river/status.go:14-47,
river/sync.go:202-234). Spark's built-in streaming aggregation could
compute the same counts, but this module implements them through the
GENERAL mechanism -- applyInPandasWithState with explicit GroupState --
because that is the extension point every custom stateful operator
(rate limiting, anomaly windows, per-key dedup with TTL) plugs into
at scale: state lives in the state store, partitioned by key across
executors, checkpointed with the query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long"
OUTPUT_SCHEMA = "op string, n long"


def _update_op_counts(key: tuple, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    """Accumulate a running row count for one op key; emit the updated
    total each micro-batch. Arrow-batched: each call sees whole pandas
    chunks, never Python-per-row."""
    (total,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"op": [key[0]], "n": [total]})


def running_op_counts(changelog_stream: DataFrame,
                      op_col: str = "op") -> DataFrame:
    """Streaming running totals per op -- the /stat counters analog,
    as an explicit-state operator. Input must be a streaming DataFrame
    carrying `op_col`; output emits one updated (op, n) row per key per
    micro-batch."""
    return (changelog_stream
            .groupBy(op_col)
            .applyInPandasWithState(
                _update_op_counts,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


SESS_STATE = "start long, last long, n long"
SESS_OUT = ("user_id long, session_start timestamp, n_events long, "
            "closed_by string")


def _update_sessions(key: tuple, pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    """Gap-based sessionization with explicit state + event-time
    timeout: events extend the open session; when the watermark passes
    last_event + gap, the timeout fires and the session is emitted.
    This is the customizable form of session_window (arbitrary session
    logic could live here: caps, value sums, early emission)."""
    gap_s = 30 * 60
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [key[0]],
                            "session_start": [pd.Timestamp(start, unit="s")],
                            "n_events": [n], "closed_by": ["timeout"]})
        return
    ts = []
    for pdf in pdfs:
        ts.extend(int(t.timestamp()) for t in pdf["ts"])
    ts.sort()
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = ts[0], ts[0], 0
    out = []
    for t in ts:
        if t - last > gap_s:                     # gap inside the batch
            out.append((start, n))
            start, n = t, 0
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    state.setTimeoutTimestamp((last + gap_s) * 1000)
    if out:
        yield pd.DataFrame({
            "user_id": [key[0]] * len(out),
            "session_start": [pd.Timestamp(s, unit="s") for s, _ in out],
            "n_events": [c for _, c in out],
            "closed_by": ["gap"] * len(out)})


def sessionize_with_timeout(events_stream: DataFrame,
                            user_col: str = "user_id",
                            ts_col: str = "ts") -> DataFrame:
    """Streaming sessionizer over (user, ts) with EventTimeTimeout.
    Input must carry a watermark on ts_col."""
    return (events_stream
            .groupBy(user_col)
            .applyInPandasWithState(
                _update_sessions,
                outputStructType=SESS_OUT,
                stateStructType=SESS_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


FUNNEL_STATE = "starts array<double>, level int"
FUNNEL_OUT = "user long, level int"


def funnel_with_state(events_stream: DataFrame, conds, window_s: float,
                      user_col: str = "user_id",
                      ts_col: str = "ts",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Streaming windowFunnel (the incremental form of
    operators/funnel.window_funnel): per-user funnel depth maintained
    across micro-batches with explicit GroupState -- the per-level
    latest-chain-start array IS the state, so memory per user is
    O(n_steps) floats forever, not O(events).

    Ordering contract: exact when each user's events arrive in event-
    time order across batches (the binlog/append contract this engine's
    sources provide; within a batch events are sorted). A step event
    arriving BEFORE its predecessor reached the store cannot extend a
    chain retroactively -- single-pass semantics; the sink DB avoids
    this only by re-scanning stored history per query. The reported
    level is monotone nondecreasing either way. Emits (user, level) in
    update mode whenever a user's depth deepens."""
    import math

    from ..operators.funnel import _with_step

    n = len(conds)
    stepped = _with_step(events_stream, user_col, ts_col, conds,
                         tiebreak_col)

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            raw, level = state.get
            starts = [None if math.isnan(x) else x for x in raw]
        else:
            starts, level = [None] * (n + 1), 0
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["ts_s"], pdf["tb"], pdf["step"]))
        rows.sort(key=lambda r: (r[0], r[1]))
        for ts, _, step in rows:                 # same greedy as batch
            k = int(step)
            if k == 1:
                starts[1] = float(ts)
            elif starts[k - 1] is not None \
                    and ts - starts[k - 1] <= window_s:
                if starts[k] is None or starts[k - 1] > starts[k]:
                    starts[k] = starts[k - 1]
        new_level = max((k for k in range(1, n + 1)
                         if starts[k] is not None), default=0)
        state.update((
            [math.nan if x is None else x for x in starts], new_level))
        if new_level > level:
            yield pd.DataFrame({"user": [key[0]], "level": [new_level]})

    return (stepped.groupBy("user")
            .applyInPandasWithState(
                update,
                outputStructType=FUNNEL_OUT,
                stateStructType=FUNNEL_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
