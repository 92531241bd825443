"""Behavioral event analytics: the sink DB's windowFunnel /
sequenceCount surface (ClickHouse parametric aggregate functions for
conversion analysis) over an events stream.

Semantics (matching the public ClickHouse definitions):
- window_funnel(window, cond1..condN): per user, the deepest step k
  such that events matching cond1, cond2, ... condk occur in time
  order with the WHOLE chain inside `window` seconds of its first
  event. Chains may start at any cond1 event; the LATEST viable
  chain start is tracked per level (dominant, and so optimal for
  "max level reached" -- see the scan comment). The `modes`
  modifiers match ClickHouse's: strict_dedup (a repeated-condition
  event stops the scan), strict_order (an intervening foreign or
  out-of-order event stops it), strict_increase (chain timestamps
  must strictly increase).
- sequence_count(cond1..condN): per user, the number of
  NON-OVERLAPPING cond1 -> ... -> condN chains in time order
  (a restart-on-match automaton; ClickHouse's sequenceCount with the
  '.*' separators).
- sequence_match(pattern, cond1..condN): the full sequenceMatch
  pattern grammar -- (?N) conditions (reusable), strict adjacency
  between bare neighbors, `.*` any-gap separators, and (?t op secs)
  time constraints between matched events; events matching no
  condition are invisible to the pattern.
- sequence_next_node(direction, base)(ts, value, cond1..condN): the
  value of the event ADJACENT to a matched chain of consecutive
  events -- "what did users do right after (or before) this exact
  sequence"; non-matching events occupy stream positions and can be
  the answer, unlike every other scan here.

Implementation: steps are classified JVM-side (one CASE expression --
filters stay codegen'd and pushable), non-step events are dropped
BEFORE the shuffle, then the per-user scan runs as ONE applyInPandas
over user groups: the state machine is inherently sequential per user
but embarrassingly parallel across users, which is exactly the shape
applyInPandas distributes (same pattern as the streaming sessionizer,
streaming/stateful.py). Events per user are bounded by app behavior,
not corpus size -- the same per-user-memory contract ClickHouse's own
implementation assumes. Results are partitioning-independent: groups
are whole by construction and each group is sorted by (ts, tiebreak)
before the scan (test-asserted).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pin_user_parallelism(stepped: DataFrame) -> DataFrame:
    """Explicit user-keyed repartition to defaultParallelism before a
    per-user applyInPandas scan. Without it AQE coalesces the (byte-
    wise tiny) shuffle to ONE partition and the whole Python scan runs
    serially on one core -- AQE sizes partitions by bytes and cannot
    see that the downstream cost is per-GROUP Python CPU, not IO
    (measured 3.6s -> 0.4s on the sf0.1 fixture scan). The explicit
    count is AQE-stable, and groupBy(user) reuses the partitioning
    (ClusteredDistribution is satisfied by any hash partitioning on
    the key), so this costs no extra exchange."""
    n = stepped.sparkSession.sparkContext.defaultParallelism
    return stepped.repartition(n, "user")


# --- bucketed per-user scan (round 15, guide §4) -------------------------
#
# applyInPandas pays a fixed per-GROUP price: one Arrow slice, one
# pandas frame in, one (often 1-row!) frame out, one Python dispatch.
# With per-USER groups that price multiplies by the user count and
# dominated every scan in this module (the per-user math itself is
# numpy). The scans below therefore group by a HASH BUCKET of the user
# instead: each group holds ~|users|/n_buckets whole users, the bucket
# frame is sorted once by (user, ts, tiebreak), and per-user slices are
# cut out with numpy run boundaries. Results are identical by
# construction -- the bucket is a pure function of the user (groups
# still hold whole users) and each user's slice is sorted exactly as
# its per-user group was.
#
# n_buckets = defaultParallelism x _BUCKETS_PER_CORE keeps per-group
# memory at matching_rows / (P x 32) -- cluster-adaptive, and 32
# groups per task keep AQE-independent load balance without paying
# per-group overhead again.

_BUCKET = "__ubucket"
_BUCKETS_PER_CORE = 32


def _user_bounds(users: np.ndarray) -> np.ndarray:
    """Offsets of each user's run in a user-sorted array, with a
    trailing len sentinel: zip(b[:-1], b[1:]) yields the slices."""
    starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
    return np.r_[starts, len(users)]


def _lowest_bit_steps(maskall: np.ndarray, n_conds: int) -> np.ndarray:
    """Funnel step from a condition bitmask, vectorized: the LOWEST set
    bit wins -- the same first-condition-wins rule _with_step applies.
    Shared by sequence_and_funnel and the fused
    sequence_funnel_next_node (r15 ADVICE: inlined copies could
    silently diverge)."""
    low = maskall & -maskall
    stepall = np.zeros(len(maskall), dtype=np.int64)
    for k in range(1, n_conds + 1):
        stepall[low == (1 << (k - 1))] = k
    return stepall


def _chain_starts(masks: np.ndarray, n: int) -> np.ndarray:
    """sequence_next_node's adjacency core: indices i where conds 1..n
    match at stream positions i..i+n-1 (shift-and-AND over the bitmask
    array, no per-event loop). Empty when the stream is shorter than
    the chain. Shared by the standalone and fused operators (r15
    ADVICE)."""
    ln = len(masks)
    if ln < n:
        return np.array([], dtype=np.int64)
    start = ((masks[:ln - n + 1] >> 0) & 1).astype(bool)
    for j in range(1, n):
        start &= ((masks[j:ln - n + 1 + j] >> j) & 1).astype(bool)
    return np.flatnonzero(start)


def _apply_user_bucketed(stepped: DataFrame, scan_bucket,
                         schema: str) -> DataFrame:
    """Run `scan_bucket(pdf)` over (user, ts_s, tb)-sorted bucket
    frames; scan_bucket returns one result frame covering every user
    in the bucket. The explicit repartition pins Python parallelism
    for the same byte-blind-AQE reason as _pin_user_parallelism, and
    groupBy(_BUCKET) reuses it (no second exchange)."""
    n = stepped.sparkSession.sparkContext.defaultParallelism
    n_buckets = max(1, n * _BUCKETS_PER_CORE)
    bucketed = (stepped.withColumn(
                    _BUCKET,
                    F.pmod(F.xxhash64(F.col("user")),
                           F.lit(n_buckets)).cast("int"))
                .repartition(n, _BUCKET))
    return bucketed.groupBy(_BUCKET).applyInPandas(
        lambda pdf: scan_bucket(
            pdf.sort_values(["user", "ts_s", "tb"], kind="mergesort")),
        schema)


def _with_step(events: DataFrame, user_col: str, ts_col: str,
               conds: Sequence[Column], tiebreak_col: str,
               keep_others: bool = False,
               pin: bool = True) -> DataFrame:
    """(user, ts_s, tiebreak, step): first matching condition wins
    (documented simplification of ClickHouse's multi-assign); events
    matching no condition are filtered out before any shuffle --
    except under `keep_others` (strict_order needs them as chain
    breakers), where they survive as step 0. `pin=False` skips the
    user-keyed repartition for callers that bucket-and-repartition
    themselves (_apply_user_bucketed)."""
    step = F.lit(None).cast("int")
    for i in range(len(conds) - 1, -1, -1):
        step = F.when(conds[i], F.lit(i + 1)).otherwise(step)
    tagged = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_s"),
        F.col(tiebreak_col).alias("tb"),
        step.alias("step"))
    if keep_others:
        tagged = tagged.fillna({"step": 0})
    else:
        tagged = tagged.filter(F.col("step").isNotNull())
    return _pin_user_parallelism(tagged) if pin else tagged


def _funnel_level(ts: np.ndarray, step: np.ndarray, n: int,
                  window_s: float) -> int:
    """Vectorized windowFunnel core over ONE user's time-sorted events:
    the deepest level k whose chain fits in `window_s` of its start.

    The sequential scan tracks start[k] = LATEST chain-start among
    chains that reached level k (latest dominates: the window is
    measured from the chain start, so of two chains at the same level
    the later-started one is extendable by every event the earlier one
    is). Because every start[k] is MONOTONE non-decreasing over the
    scan, the whole recurrence is a per-level prefix max -- numpy's
    maximum.accumulate -- instead of a Python loop over events:

        s_1[i] = max over j<=i of (ts[j] where step[j]==1)
        s_k[i] = max over j<=i of (s_{k-1}[j-1] where step[j]==k
                                   and ts[j] - s_{k-1}[j-1] <= window)

    The j-1 shift reproduces the loop's read-before-write order for
    same-timestamp events. O(n_levels x n_events) vectorized; measured
    ~30x over the per-event Python loop on the fixture scan."""
    NEG = -np.inf
    s_prev = np.maximum.accumulate(np.where(step == 1, ts, NEG))
    level = 1 if s_prev[-1] > NEG else 0
    for k in range(2, n + 1):
        shifted = np.empty_like(s_prev)
        shifted[0] = NEG
        shifted[1:] = s_prev[:-1]
        s_k = np.maximum.accumulate(
            np.where((step == k) & (ts - shifted <= window_s),
                     shifted, NEG))
        if s_k[-1] > NEG:
            level = k
        s_prev = s_k
    return level


_FUNNEL_MODES = ("strict_dedup", "strict_order", "strict_increase")


def _funnel_level_modes(ts, step, n: int, window_s: float,
                        dedup: bool, order: bool,
                        increase: bool) -> int:
    """windowFunnel scan with ClickHouse's mode flags, per the public
    algorithm (AggregateFunctionWindowFunnel): per level keep the
    latest-start chain as (start_ts, last_ts); a step-1 event always
    restarts level 1; `strict_dedup` STOPS the scan on an event whose
    condition already holds in the state (reporting the deepest level
    so far -- documented simplification of ClickHouse's quirk of
    returning the previous event's condition number); `strict_order`
    stops it when, after a chain has started, an event arrives that
    matches no condition (step 0) or a condition whose predecessor
    level is unreached -- the first_event guard on BOTH branches
    matches the current upstream algorithm (the step-0 branch
    `if (strict_order && event_idx == -1) { if (first_event) break;
    else continue; }` and the unreached-predecessor branch
    `strict_order && first_event && !events_timestamp[event_idx - 1]`
    both ignore pre-chain events, so a B,A,B,C stream reaches level 3
    in both engines); `strict_increase` extends a chain only when
    the timestamp strictly exceeds the previous level's last event.
    Sequential per user by nature (each decision depends on the
    running state); bounded by the per-user-events contract."""
    state: list[tuple[float, float] | None] = [None] * n
    first_event = False
    for t, s in zip(ts, step):
        if s == 0:                       # matches no condition
            if order and first_event:
                break
            continue
        i = int(s) - 1
        if i == 0:
            state[0] = (t, t)
            first_event = True
        elif dedup and state[i] is not None:
            break
        elif order and first_event and state[i - 1] is None:
            break
        elif state[i - 1] is not None:
            start, last = state[i - 1]
            ok = t - start <= window_s
            if increase:
                ok = ok and last < t
            if ok:
                state[i] = (start, t)
                if i + 1 == n:
                    return n
    for k in range(n, 0, -1):
        if state[k - 1] is not None:
            return k
    return 0


def window_funnel(events: DataFrame, user_col: str, ts_col: str,
                  conds: Sequence[Column], window_s: float,
                  tiebreak_col: str = "event_id",
                  modes: Sequence[str] = ()) -> DataFrame:
    """(user, level): deepest funnel step reached within the window.
    Users with no step-1 event report level 0 only if they matched
    some later step (users matching nothing are absent -- join back
    against the user dimension for a dense funnel report).

    `modes` takes any subset of ClickHouse windowFunnel's modifiers
    {'strict_dedup', 'strict_order', 'strict_increase'}; with modes
    the scan runs the stateful reference algorithm (strict_order also
    keeps non-matching events in the stream as chain breakers), while
    the default path stays the vectorized prefix-max."""
    n = len(conds)
    bad = set(modes) - set(_FUNNEL_MODES)
    if bad:
        raise ValueError(f"unknown windowFunnel modes: {sorted(bad)}")
    dedup, order, increase = (m in modes for m in _FUNNEL_MODES)
    # output carries the INPUT's user type (sequence_next_node's
    # recipe) -- hard-coding `user long` fails string/UUID user columns
    user_type = dict(events.dtypes)[user_col]
    stepped = _with_step(events, user_col, ts_col, conds, tiebreak_col,
                         keep_others=order, pin=False)

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        users = pdf["user"].to_numpy()
        ts = pdf["ts_s"].to_numpy(dtype=np.float64)
        st = pdf["step"].to_numpy(dtype=np.int64)
        b = _user_bounds(users)
        out_u: list = []
        out_l: list = []
        for s, e in zip(b[:-1], b[1:]):
            tsl, stl = ts[s:e], st[s:e]
            # strict_order keeps step-0 events in the stream as chain
            # breakers, which would otherwise surface users ALL of
            # whose events match nothing as (user, 0) rows -- the
            # documented contract (users matching nothing are absent)
            # holds in every mode
            if order and not (stl > 0).any():
                continue
            if modes:
                level = _funnel_level_modes(tsl, stl, n, window_s,
                                            dedup, order, increase)
            else:
                level = _funnel_level(tsl, stl, n, window_s)
            out_u.append(users[s])
            out_l.append(level)
        return pd.DataFrame({"user": pd.Series(out_u, dtype=object),
                             "level": pd.Series(out_l, dtype="int32")})

    return _apply_user_bucketed(stepped, scan_bucket,
                                f"user {user_type}, level int")


def sequence_count(events: DataFrame, user_col: str, ts_col: str,
                   conds: Sequence[Column],
                   tiebreak_col: str = "event_id") -> DataFrame:
    """(user, n_matches): non-overlapping cond1 -> ... -> condN chains
    per user, in time order (restart-on-match automaton)."""
    n = len(conds)
    user_type = dict(events.dtypes)[user_col]
    stepped = _with_step(events, user_col, ts_col, conds, tiebreak_col,
                         pin=False)

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        users = pdf["user"].to_numpy()
        steps = pdf["step"].to_numpy(dtype=np.int64)
        b = _user_bounds(users)
        out_u: list = []
        out_n: list = []
        for s, e in zip(b[:-1], b[1:]):
            state = 0
            count = 0
            for step in steps[s:e]:
                if step == state + 1:
                    state += 1
                    if state == n:
                        count += 1
                        state = 0
            out_u.append(users[s])
            out_n.append(count)
        return pd.DataFrame({"user": pd.Series(out_u, dtype=object),
                             "n_matches": pd.Series(out_n,
                                                    dtype="int64")})

    return _apply_user_bucketed(stepped, scan_bucket,
                                f"user {user_type}, n_matches long")


# sequenceMatch pattern tokens: (?N) condition, (?t op secs) time
# constraint, .* any-gap separator
_PAT_TOKEN = re.compile(
    r"\(\?(\d+)\)|\(\?t\s*(<=|>=|==|<|>)\s*(\d+(?:\.\d+)?)\)|\.\*")

_T_OPS = {
    "<": lambda d, s: d < s, "<=": lambda d, s: d <= s,
    ">": lambda d, s: d > s, ">=": lambda d, s: d >= s,
    "==": lambda d, s: d == s,
}


def parse_sequence_pattern(pattern: str) -> list[dict]:
    """Parse the ClickHouse sequenceMatch pattern grammar into items:
    [{cond: int (1-based), adjacent: bool, tcons: [(op, secs), ...]}].
    `adjacent` means NO separator stood between this condition and the
    previous one -- per the public semantics the two events must then
    be consecutive in the condition-matching subsequence; `.*` or any
    `(?t op n)` separator lifts adjacency (an arbitrary number of
    events may lie between), with the time constraints applied between
    the two matched events."""
    items: list[dict] = []
    adjacent = True
    tcons: list[tuple[str, float]] = []
    pos = 0
    for m in _PAT_TOKEN.finditer(pattern):
        if m.start() != pos:
            raise ValueError(f"bad pattern at {pos}: {pattern!r}")
        pos = m.end()
        if m.group(1) is not None:
            items.append({"cond": int(m.group(1)), "adjacent": adjacent,
                          "tcons": tcons})
            adjacent, tcons = True, []
        elif m.group(2) is not None:
            adjacent = False
            tcons = tcons + [(m.group(2), float(m.group(3)))]
        else:                                   # .*
            adjacent = False
    if pos != len(pattern):
        raise ValueError(f"bad pattern at {pos}: {pattern!r}")
    if not items:
        raise ValueError("pattern has no (?N) conditions")
    if items[0]["tcons"]:
        raise ValueError("time constraint before the first condition")
    return items


def _match_sequence(ts: list[float], masks: list[int],
                    items: list[dict]) -> bool:
    """DP subsequence match over the condition-matching events of one
    user (events matching NO condition were dropped upstream -- they
    are invisible to the pattern, per the public semantics).
    ends[j] = all event indices where item j can end; O(items x
    events^2) worst case, bounded by per-user event counts."""
    n = len(ts)
    ends: list[int] = [i for i in range(n)
                       if masks[i] >> (items[0]["cond"] - 1) & 1]
    for item in items[1:]:
        bit = item["cond"] - 1
        nxt: list[int] = []
        if item["adjacent"]:
            prev = set(ends)
            nxt = [i for i in range(1, n)
                   if masks[i] >> bit & 1 and i - 1 in prev]
        else:
            for i in range(n):
                if not masks[i] >> bit & 1:
                    continue
                for p in ends:
                    if p >= i:
                        break
                    if all(_T_OPS[op](ts[i] - ts[p], s)
                           for op, s in item["tcons"]):
                        nxt.append(i)
                        break
        if not nxt:
            return False
        ends = nxt
    return True


def _earliest_match_end(ts: list[float], masks: list[int],
                        items: list[dict], start: int) -> int | None:
    """Index where the EARLIEST match of `items` beginning at or after
    event `start` ends, or None. Same set-DP as _match_sequence, but
    tracking ends lets the caller scan non-overlapping matches:
    min(ends) is the earliest possible end because the DP keeps every
    feasible end per item."""
    n = len(ts)
    ends = [i for i in range(start, n)
            if masks[i] >> (items[0]["cond"] - 1) & 1]
    for item in items[1:]:
        bit = item["cond"] - 1
        nxt: list[int] = []
        if item["adjacent"]:
            prev = set(ends)
            nxt = [i for i in range(start + 1, n)
                   if masks[i] >> bit & 1 and i - 1 in prev]
        else:
            for i in range(start, n):
                if not masks[i] >> bit & 1:
                    continue
                for p in ends:
                    if p >= i:
                        break
                    if all(_T_OPS[op](ts[i] - ts[p], s)
                           for op, s in item["tcons"]):
                        nxt.append(i)
                        break
        if not nxt:
            return None
        ends = nxt
    return min(ends)


def sequence_count_pattern(events: DataFrame, user_col: str,
                           ts_col: str, pattern: str,
                           conds: Sequence[Column],
                           tiebreak_col: str = "event_id") -> DataFrame:
    """(user, n_matches): the sink DB's sequenceCount(pattern)(...)
    parametric aggregate -- the NUMBER of non-overlapping matches of
    the full pattern grammar per user, scanned greedily left to right
    (each counted match consumes through its earliest possible end,
    maximizing the count -- the public semantics). The chain-only
    sequence_count above stays as the fast special case of
    '(?1)(?2)...' with restart-on-match."""
    items = parse_sequence_pattern(pattern)
    n_conds = len(conds)
    if n_conds > 62:
        raise ValueError("condition bitmask is a long: at most 62 "
                         "conditions supported")
    for it in items:
        if not 1 <= it["cond"] <= n_conds:
            raise ValueError(f"pattern references cond {it['cond']} "
                             f"but only {n_conds} supplied")
    user_type = dict(events.dtypes)[user_col]
    mask = F.lit(0)
    for i, c in enumerate(conds):
        mask = mask + F.when(c, F.lit(1 << i)).otherwise(0)
    stepped = (events.select(
                   F.col(user_col).alias("user"),
                   F.col(ts_col).cast("timestamp").cast("double")
                    .alias("ts_s"),
                   F.col(tiebreak_col).alias("tb"),
                   mask.alias("mask"))
               .filter(F.col("mask") != 0))

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        users = pdf["user"].to_numpy()
        tsall = pdf["ts_s"].to_numpy(dtype=np.float64)
        maskall = pdf["mask"].to_numpy(dtype=np.int64)
        b = _user_bounds(users)
        out_u: list = []
        out_n: list = []
        for s, e in zip(b[:-1], b[1:]):
            ts = list(tsall[s:e])
            masks = [int(m) for m in maskall[s:e]]
            count, pos = 0, 0
            while pos < len(ts):
                end = _earliest_match_end(ts, masks, items, pos)
                if end is None:
                    break
                count += 1
                pos = end + 1
            out_u.append(users[s])
            out_n.append(count)
        return pd.DataFrame({"user": pd.Series(out_u, dtype=object),
                             "n_matches": pd.Series(out_n,
                                                    dtype="int64")})

    return _apply_user_bucketed(stepped, scan_bucket,
                                f"user {user_type}, n_matches long")


def sequence_match(events: DataFrame, user_col: str, ts_col: str,
                   pattern: str, conds: Sequence[Column],
                   tiebreak_col: str = "event_id") -> DataFrame:
    """(user, matched): the sink DB's sequenceMatch(pattern)(ts,
    cond1..condN) parametric aggregate. Unlike the funnel's
    first-match-wins step column, each event carries a BITMASK of every
    condition it matches (pattern items may reuse conditions), computed
    as one flat JVM sum-of-whens; events matching no condition are
    dropped before the shuffle -- exactly the events the public
    semantics ignores. One applyInPandas scan per user (sequential per
    user, parallel across users -- the funnel contract). Users with no
    condition-matching events are absent from the result (join against
    the user dimension for a dense report)."""
    items = parse_sequence_pattern(pattern)
    n_conds = len(conds)
    if n_conds > 62:
        raise ValueError("condition bitmask is a long: at most 62 "
                         "conditions supported (the public aggregate "
                         "caps at 32)")
    for it in items:
        if not 1 <= it["cond"] <= n_conds:
            raise ValueError(f"pattern references cond {it['cond']} "
                             f"but only {n_conds} supplied")
    user_type = dict(events.dtypes)[user_col]
    mask = F.lit(0)
    for i, c in enumerate(conds):
        mask = mask + F.when(c, F.lit(1 << i)).otherwise(0)
    stepped = (events.select(
                   F.col(user_col).alias("user"),
                   F.col(ts_col).cast("timestamp").cast("double")
                    .alias("ts_s"),
                   F.col(tiebreak_col).alias("tb"),
                   mask.alias("mask"))
               .filter(F.col("mask") != 0))

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        users = pdf["user"].to_numpy()
        tsall = pdf["ts_s"].to_numpy(dtype=np.float64)
        maskall = pdf["mask"].to_numpy(dtype=np.int64)
        b = _user_bounds(users)
        out_u: list = []
        out_m: list = []
        for s, e in zip(b[:-1], b[1:]):
            out_u.append(users[s])
            out_m.append(_match_sequence(
                list(tsall[s:e]), [int(m) for m in maskall[s:e]],
                items))
        return pd.DataFrame({"user": pd.Series(out_u, dtype=object),
                             "matched": pd.Series(out_m,
                                                  dtype="bool")})

    return _apply_user_bucketed(stepped, scan_bucket,
                                f"user {user_type}, matched boolean")


def sequence_and_funnel(events: DataFrame, user_col: str, ts_col: str,
                        pattern: str, conds: Sequence[Column],
                        window_s: float,
                        tiebreak_col: str = "event_id") -> DataFrame:
    """(user, matched, level): sequenceMatch(pattern) AND
    windowFunnel(window_s) over the SAME conditions in ONE events scan
    + ONE per-user shuffle + ONE applyInPandas pass -- the fused form
    for dashboards that report both (cdc_op_counters). Runs the same
    cores the standalone operators run (_match_sequence for the
    pattern DP, _funnel_level for the chain scan), so results are
    row-identical to sequence_match x window_funnel (test-asserted).
    The funnel's first-match-wins step is the mask's lowest set bit --
    the same first-condition-wins rule _with_step applies."""
    items = parse_sequence_pattern(pattern)
    n_conds = len(conds)
    if n_conds > 62:
        raise ValueError("condition bitmask is a long: at most 62 "
                         "conditions supported")
    for it in items:
        if not 1 <= it["cond"] <= n_conds:
            raise ValueError(f"pattern references cond {it['cond']} "
                             f"but only {n_conds} supplied")
    user_type = dict(events.dtypes)[user_col]
    mask = F.lit(0)
    for i, c in enumerate(conds):
        mask = mask + F.when(c, F.lit(1 << i)).otherwise(0)
    stepped = (events.select(
                   F.col(user_col).alias("user"),
                   F.col(ts_col).cast("timestamp").cast("double")
                    .alias("ts_s"),
                   F.col(tiebreak_col).alias("tb"),
                   mask.alias("mask"))
               .filter(F.col("mask") != 0))

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        users = pdf["user"].to_numpy()
        tsall = pdf["ts_s"].to_numpy(dtype=np.float64)
        maskall = pdf["mask"].to_numpy(dtype=np.int64)
        # lowest set bit -> funnel step, vectorized over the WHOLE
        # bucket (per-user slicing below sees the same values)
        stepall = _lowest_bit_steps(maskall, n_conds)
        b = _user_bounds(users)
        out_u: list = []
        out_m: list = []
        out_l: list = []
        for s, e in zip(b[:-1], b[1:]):
            ts, masks = tsall[s:e], maskall[s:e]
            out_u.append(users[s])
            out_m.append(_match_sequence(
                list(ts), [int(m) for m in masks], items))
            out_l.append(_funnel_level(ts, stepall[s:e], n_conds,
                                       window_s))
        return pd.DataFrame({"user": pd.Series(out_u, dtype=object),
                             "matched": pd.Series(out_m, dtype="bool"),
                             "level": pd.Series(out_l, dtype="int32")})

    return _apply_user_bucketed(
        stepped, scan_bucket,
        f"user {user_type}, matched boolean, level int")


def sequence_funnel_next_node(events: DataFrame, user_col: str,
                              ts_col: str, pattern: str,
                              conds: Sequence[Column], window_s: float,
                              value_col: str,
                              nn_conds: Sequence[Column],
                              tiebreak_col: str = "event_id") -> DataFrame:
    """(user, sf_any, matched, level, nn_matched, next_value):
    sequence_and_funnel(pattern, conds, window_s) AND
    sequence_next_node(forward, first_match)(value_col, nn_conds) in
    ONE events scan + ONE per-user shuffle + ONE Python pass (round
    15, guide §4: the two scans consumed the same events table through
    two separate applyInPandas chains in cdc_op_counters; the
    per-batch Arrow/pandas machinery -- not the per-user math --
    dominated both).

    Composition contract (test-asserted row identity):
    - `.filter("sf_any").select("user", "matched", "level")` equals
      sequence_and_funnel(events, user, ts, pattern, conds, window_s):
      sf_any marks users with >= 1 event matching `conds` (exactly the
      rows the standalone operator's pre-shuffle filter keeps), and
      matched/level run the same cores (_match_sequence /
      _funnel_level) over the same (ts, tiebreak)-ordered subset -- a
      mask-filtered slice of the bucket's sorted frame is sorted the
      same way the standalone operator's filtered shuffle was.
    - `.filter("nn_matched").select("user", "next_value")` equals
      sequence_next_node(events, user, ts, value_col, nn_conds,
      'forward', 'first_match'): the full (unfiltered) event stream of
      each user rides the same bucket frame, so stream positions and
      the adjacent-value lookup are identical.

    The fused stream ships every event once (sequence_next_node's
    requirement -- non-matching events occupy stream positions);
    the standalone pair shipped every event PLUS the conds-matching
    subset. One scan, fewer shuffled bytes, half the Python passes."""
    items = parse_sequence_pattern(pattern)
    n_conds = len(conds)
    n_nn = len(nn_conds)
    if n_conds > 62 or n_nn > 62:
        raise ValueError("condition bitmask is a long: at most 62 "
                         "conditions supported")
    for it in items:
        if not 1 <= it["cond"] <= n_conds:
            raise ValueError(f"pattern references cond {it['cond']} "
                             f"but only {n_conds} supplied")
    user_type = dict(events.dtypes)[user_col]
    sfm = F.lit(0)
    for i, c in enumerate(conds):
        sfm = sfm + F.when(c, F.lit(1 << i)).otherwise(0)
    nnm = F.lit(0)
    for i, c in enumerate(nn_conds):
        nnm = nnm + F.when(c, F.lit(1 << i)).otherwise(0)
    stepped = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_s"),
        F.col(tiebreak_col).alias("tb"),
        F.col(value_col).cast("string").alias("val"),
        sfm.alias("sfm"), nnm.alias("nnm"))

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        users = pdf["user"].to_numpy()
        tsall = pdf["ts_s"].to_numpy(dtype=np.float64)
        sfall = pdf["sfm"].to_numpy(dtype=np.int64)
        nnall = pdf["nnm"].to_numpy(dtype=np.int64)
        valall = pdf["val"].to_numpy(dtype=object)
        # lowest set bit -> funnel step (sequence_and_funnel's rule),
        # vectorized over the whole bucket
        stepall = _lowest_bit_steps(sfall, n_conds)
        b = _user_bounds(users)
        out_u: list = []
        out_a: list = []
        out_m: list = []
        out_l: list = []
        out_nm: list = []
        out_v: list = []
        for s, e in zip(b[:-1], b[1:]):
            sf = sfall[s:e]
            keep = sf != 0
            sf_any = bool(keep.any())
            if sf_any:
                ts_m = tsall[s:e][keep]
                matched = _match_sequence(
                    list(ts_m), [int(m) for m in sf[keep]], items)
                level = _funnel_level(ts_m, stepall[s:e][keep],
                                      n_conds, window_s)
            else:
                matched, level = False, 0
            # sequence_next_node forward/first_match over the FULL
            # slice (the shared _chain_starts adjacency core)
            masks, vals = nnall[s:e], valall[s:e]
            ln = e - s
            nn_matched = False
            nxt_val = None
            idxs = _chain_starts(masks, n_nn)
            if idxs.size:
                nn_matched = True
                nxt = int(idxs[0]) + n_nn
                if nxt < ln:
                    nxt_val = vals[nxt]
            if sf_any or nn_matched:
                out_u.append(users[s])
                out_a.append(sf_any)
                out_m.append(matched)
                out_l.append(level)
                out_nm.append(nn_matched)
                out_v.append(nxt_val)
        return pd.DataFrame({
            "user": pd.Series(out_u, dtype=object),
            "sf_any": pd.Series(out_a, dtype="bool"),
            "matched": pd.Series(out_m, dtype="bool"),
            "level": pd.Series(out_l, dtype="int32"),
            "nn_matched": pd.Series(out_nm, dtype="bool"),
            "next_value": pd.Series(out_v, dtype=object)})

    return _apply_user_bucketed(
        stepped, scan_bucket,
        f"user {user_type}, sf_any boolean, matched boolean, "
        f"level int, nn_matched boolean, next_value string")


def retention(events: DataFrame, user_col: str,
              conds: Sequence[Column]) -> DataFrame:
    """(user, r1..rN): the sink DB's retention() aggregate -- r1 is
    whether cond1 ever held for the user, and each r_i (i > 1) is
    whether cond1 AND cond_i both ever held (the classic
    signed-up-on-day-0 x came-back-on-day-i matrix, one row per user).

    Unlike the funnel this needs NO ordering or state: it is N boolean
    MAX aggregates in ONE keyed groupBy -- pure JVM map-side-combined
    aggregation, no Python anywhere."""
    aggs = [F.max(conds[0].cast("int")).alias("c1")] + [
        F.max(c.cast("int")).alias(f"c{i + 2}")
        for i, c in enumerate(conds[1:])]
    out = events.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    cols = [(F.col("c1") == 1).alias("r1")] + [
        ((F.col("c1") == 1) & (F.col(f"c{i}") == 1)).alias(f"r{i}")
        for i in range(2, len(conds) + 1)]
    return out.select("user", *cols)


def merge_maps(df: DataFrame, key_col: str, map_col: str,
               how: str = "sum", out_col: str = "summed") -> DataFrame:
    """The sink DB's sumMap / maxMap / minMap aggregates: per key,
    merge map<k, num> values per map-key with the chosen reducer --
    sumMap: (a->1, b->2) + (a->3) = (a->4, b->2). One explode to
    (key, mk, mv) grain, ONE keyed aggregation (map-side combined),
    and the result map is rebuilt from entries sorted by map-key
    inside the aggregate, so the output is partitioning-independent.
    Pure JVM throughout."""
    reducers = {"sum": F.sum, "max": F.max, "min": F.min}
    if how not in reducers:
        raise ValueError(f"how must be one of {sorted(reducers)}")
    exploded = df.select(F.col(key_col).alias("key"),
                         F.explode(F.col(map_col)).alias("mk", "mv"))
    summed = (exploded.groupBy("key", "mk")
              .agg(reducers[how]("mv").alias("mv")))
    return (summed.groupBy("key")
            .agg(F.map_from_entries(F.sort_array(F.collect_list(
                F.struct("mk", "mv")))).alias(out_col))
            .withColumnRenamed("key", key_col))


def sum_maps(df: DataFrame, key_col: str, map_col: str,
             out_col: str = "summed") -> DataFrame:
    """sumMap -- see merge_maps."""
    return merge_maps(df, key_col, map_col, "sum", out_col)


def sequence_next_node(events: DataFrame, user_col: str, ts_col: str,
                       value_col: str, conds: Sequence[Column],
                       direction: str = "forward",
                       base: str = "first_match",
                       tiebreak_col: str = "event_id") -> DataFrame:
    """(user, next_value): the sink DB's sequenceNextNode(direction,
    base)(ts, value, cond1..condN) -- the value of the event ADJACENT
    to a matched chain of consecutive events, per user. The chain is
    stream-adjacent (every event counts as a position, matching or
    not), unlike windowFunnel's any-gap chains.

    direction 'forward' walks the (ts, tiebreak)-sorted stream and
    returns the event just AFTER the chain; 'backward' walks the
    REVERSED stream -- conds are matched in the listed order along
    that reversed walk -- and returns the event chronologically just
    BEFORE the chain. base: 'head' anchors the chain at the walk's
    first event ('tail' is its alias for the backward walk),
    'first_match' / 'last_match' at the first / last occurrence along
    the walk. next_value is NULL when the anchor matches but the walk
    ends at the chain (no adjacent event); users with no match are
    absent.

    Same execution shape as sequence_match: per-event condition
    bitmask built JVM-side, one applyInPandas scan per user (numpy
    shift-and-AND finds every chain start -- no Python per-event
    loop), parallel across users. Unlike the other scans, events
    matching NO condition are kept: they occupy stream positions and
    can be the returned neighbor."""
    if direction not in ("forward", "backward"):
        raise ValueError(f"direction must be forward/backward: "
                         f"{direction!r}")
    if base not in ("head", "tail", "first_match", "last_match"):
        raise ValueError(f"base must be head/tail/first_match/"
                         f"last_match: {base!r}")
    n = len(conds)
    if n > 62:
        raise ValueError("condition bitmask is a long: at most 62 "
                         "conditions supported")
    # the output schema carries the INPUT's user type (same recipe as
    # lttb_downsample's key column) -- a hard-coded `user long` would
    # fail any caller with a string/UUID user column at runtime
    user_type = dict(events.dtypes)[user_col]

    mask = F.lit(0)
    for i, c in enumerate(conds):
        mask = mask + F.when(c, F.lit(1 << i)).otherwise(0)
    stepped = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_s"),
        F.col(tiebreak_col).alias("tb"),
        F.col(value_col).cast("string").alias("val"),
        mask.alias("mask"))

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        users = pdf["user"].to_numpy()
        maskall = pdf["mask"].to_numpy(dtype=np.int64)
        valall = pdf["val"].to_numpy(dtype=object)
        b = _user_bounds(users)
        out_u: list = []
        out_v: list = []
        for s, e in zip(b[:-1], b[1:]):
            masks, vals = maskall[s:e], valall[s:e]
            if direction == "backward":
                masks, vals = masks[::-1], vals[::-1]
            ln = len(masks)
            # chain starts via the shared shift-and-AND adjacency core
            idxs = _chain_starts(masks, n)
            if base in ("head", "tail"):
                idxs = idxs[:1] if idxs.size and idxs[0] == 0 \
                    else np.array([], dtype=np.int64)
            if not idxs.size:
                continue
            anchor = int(idxs[0]) if base != "last_match" \
                else int(idxs[-1])
            nxt = anchor + n
            out_u.append(users[s])
            out_v.append(vals[nxt] if nxt < ln else None)
        return pd.DataFrame({"user": pd.Series(out_u, dtype=object),
                             "next_value": pd.Series(out_v,
                                                     dtype=object)})

    return _apply_user_bucketed(stepped, scan_bucket,
                                f"user {user_type}, next_value string")
