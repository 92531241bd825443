"""windowFunnel / sequenceCount parity (operators/funnel.py): exact
agreement with a brute-force reference over randomized event streams,
hand-computed fixtures for the window-edge cases, determinism under
repartitioning."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators.funnel import (
    _FUNNEL_MODES, sequence_count, window_funnel)

SCHEMA = "event_id long, user_id long, ts timestamp, event_type string"


def _events(spark, rows):
    df = spark.createDataFrame(
        [(i, u, f"2026-01-01 00:00:{s:02d}", t)
         for i, (u, s, t) in enumerate(rows)],
        "event_id long, user_id long, ts_str string, event_type string")
    return df.select("event_id", "user_id",
                     F.col("ts_str").cast("timestamp").alias("ts"),
                     "event_type")


def _conds(steps):
    return [F.col("event_type") == s for s in steps]


def _brute_funnel(events, steps, window_s):
    """Max k over ALL increasing chains matching steps[0..k-1] in time
    order with last.ts - first.ts <= window (exponential, fixtures are
    tiny)."""
    best = 0
    ev = sorted(events, key=lambda e: (e[1], e[0]))  # (ts, event_id)
    for k in range(1, len(steps) + 1):
        for chain in itertools.combinations(ev, k):
            if [c[2] for c in chain] != steps[:k]:
                continue
            ts = [c[1] for c in chain]
            if ts == sorted(ts) and ts[-1] - ts[0] <= window_s \
                    and all(ts[i] < ts[i + 1] or
                            (ts[i] == ts[i + 1]
                             and chain[i][0] < chain[i + 1][0])
                            for i in range(k - 1)):
                best = max(best, k)
    return best


def test_window_funnel_prefers_late_chain_start(spark):
    """A(t0) A(t50) B(t55): with window 20 the viable chain starts at
    t50, not t0 -- tracking only the earliest start would miss it."""
    ev = _events(spark, [(1, 0, "A"), (1, 50, "A"), (1, 55, "B")])
    [r] = window_funnel(ev, "user_id", "ts", _conds(["A", "B"]),
                        window_s=20).collect()
    assert r["level"] == 2


def test_window_funnel_window_excludes_late_step(spark):
    ev = _events(spark, [(1, 0, "A"), (1, 30, "B"), (1, 59, "C")])
    conds = _conds(["A", "B", "C"])
    # whole chain must fit the window measured from the chain start
    [r] = window_funnel(ev, "user_id", "ts", conds, window_s=59).collect()
    assert r["level"] == 3
    [r] = window_funnel(ev, "user_id", "ts", conds, window_s=40).collect()
    assert r["level"] == 2


def test_window_funnel_matches_bruteforce_randomized(spark):
    rng = random.Random(7)
    steps = ["A", "B", "C"]
    rows = []
    per_user = {}
    for u in range(1, 9):
        seq = [(u, rng.randrange(0, 60),
                rng.choice(["A", "B", "C", "X"])) for _ in range(9)]
        rows += seq
    ev = _events(spark, rows)
    # brute force wants (event_id, ts_seconds, type) per user; event_id
    # is the row index (matching _events)
    for u in range(1, 9):
        per_user[u] = sorted(
            ((i, s, t) for i, (uu, s, t) in enumerate(rows) if uu == u),
            key=lambda t: (t[1], t[0]))
    for window_s in (10, 25, 60):
        got = {r["user"]: r["level"]
               for r in window_funnel(ev, "user_id", "ts",
                                      _conds(steps), window_s).collect()}
        for u, evs in per_user.items():
            expect = _brute_funnel(evs, steps, window_s)
            assert got.get(u, 0) == expect, (u, window_s, evs)


def test_window_funnel_deterministic_under_partitioning(spark):
    rng = random.Random(3)
    rows = [(u, rng.randrange(0, 60), rng.choice("ABCX"))
            for u in range(1, 20) for _ in range(8)]
    ev = _events(spark, rows)
    conds = _conds(["A", "B", "C"])
    a = sorted(map(tuple, window_funnel(
        ev, "user_id", "ts", conds, 30).collect()))
    b = sorted(map(tuple, window_funnel(
        ev.repartition(7), "user_id", "ts", conds, 30).collect()))
    assert a == b


def test_sequence_count_non_overlapping(spark):
    # A B A B A -> two complete A->B chains, the final A stays open
    ev = _events(spark, [(1, 1, "A"), (1, 2, "B"), (1, 3, "A"),
                         (1, 4, "B"), (1, 5, "A"),
                         (2, 1, "B"), (2, 2, "B"),     # no A first
                         (3, 1, "A"), (3, 2, "X"), (3, 3, "B")])
    got = {r["user"]: r["n_matches"]
           for r in sequence_count(ev, "user_id", "ts",
                                   _conds(["A", "B"])).collect()}
    assert got == {1: 2, 2: 0, 3: 1}


def test_sequence_count_three_steps_restarts(spark):
    # A B C A B C -> 2; interleaved junk ignored; missing middle -> no
    ev = _events(spark, [(1, s, t) for s, t in enumerate(
        ["A", "B", "C", "X", "A", "B", "C"])]
        + [(2, s, t) for s, t in enumerate(["A", "C", "A", "C"])])
    got = {r["user"]: r["n_matches"]
           for r in sequence_count(ev, "user_id", "ts",
                                   _conds(["A", "B", "C"])).collect()}
    assert got == {1: 2, 2: 0}


def test_funnel_on_fixture_events(spark, sf_dir):
    """Smoke over the real events table: click -> view -> purchase
    within an hour; levels are valid and the step-classifier kept the
    filters JVM-side (no crash on the 60k-row fixture)."""
    from mysql_syncer_clickhouse_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    conds = [F.col("event_type") == t
             for t in ("click", "view", "purchase")]
    out = window_funnel(ev, "user_id", "ts", conds, window_s=3600)
    rows = out.collect()
    assert rows and all(0 <= r["level"] <= 3 for r in rows)


def test_retention_gates_on_first_condition(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import retention
    ev = _events(spark, [(1, 1, "A"), (1, 2, "C"),
                         (2, 1, "B"), (2, 2, "C"),   # no gate event
                         (3, 1, "A")])
    got = {r["user"]: (r["r1"], r["r2"], r["r3"])
           for r in retention(ev, "user_id",
                              _conds(["A", "B", "C"])).collect()}
    assert got[1] == (True, False, True)
    assert got[2] == (False, False, False)   # r_i gated on r1
    assert got[3] == (True, False, False)


def test_retention_is_pure_jvm_aggregation(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import retention
    ev = _events(spark, [(1, 1, "A"), (2, 2, "B")])
    plan = (retention(ev, "user_id", _conds(["A", "B"]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "FlatMapGroups" not in plan
    assert "HashAggregate" in plan


def test_sequence_count_matches_automaton_randomized(spark):
    """Randomized cross-check of the non-overlapping chain counter
    against an independent pure-Python automaton."""
    rng = random.Random(17)
    steps = ["A", "B", "C"]
    rows = [(u, rng.randrange(0, 60), rng.choice("ABCXX"))
            for u in range(1, 15) for _ in range(10)]
    ev = _events(spark, rows)
    got = {r["user"]: r["n_matches"]
           for r in sequence_count(ev, "user_id", "ts",
                                   _conds(steps)).collect()}
    for u in range(1, 15):
        seq = sorted(((i, s, t) for i, (uu, s, t) in enumerate(rows)
                      if uu == u), key=lambda x: (x[1], x[0]))
        state = count = 0
        for _, _, t in seq:
            if t in steps and steps.index(t) == state:
                state += 1
                if state == len(steps):
                    count += 1
                    state = 0
        assert got.get(u, 0) == count, u


def test_sum_maps_merges_per_key(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import sum_maps
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (1, {"a": 3}), (2, {"z": 5}), (1, {})],
        "k long, m map<string, long>")
    got = {r["k"]: r["summed"]
           for r in sum_maps(df, "k", "m").collect()}
    assert got == {1: {"a": 4, "b": 2}, 2: {"z": 5}}
    re = {r["k"]: r["summed"]
          for r in sum_maps(df.repartition(5), "k", "m").collect()}
    assert re == got
    plan = (sum_maps(df, "k", "m")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan


# --- sequenceMatch (pattern grammar) ------------------------------------

def _brute_seq_match(events, pattern, steps):
    """Exponential reference: try every increasing subsequence of the
    condition-matching events against the parsed pattern."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        _T_OPS, parse_sequence_pattern)
    items = parse_sequence_pattern(pattern)
    ev = sorted(events, key=lambda e: (e[1], e[0]))  # (id, ts, type)
    vis = [(ts, [t == s for s in steps]) for _, ts, t in ev
           if any(t == s for s in steps)]

    def rec(item_idx, prev_pos):
        if item_idx == len(items):
            return True
        it = items[item_idx]
        lo = 0 if prev_pos is None else prev_pos + 1
        for i in range(lo, len(vis)):
            if not vis[i][1][it["cond"] - 1]:
                continue
            if it["adjacent"] and prev_pos is not None \
                    and i != prev_pos + 1:
                continue
            if prev_pos is not None and not all(
                    _T_OPS[op](vis[i][0] - vis[prev_pos][0], s)
                    for op, s in it["tcons"]):
                continue
            if rec(item_idx + 1, i):
                return True
        return False

    return rec(0, None)


def test_sequence_match_clickhouse_doc_examples(spark):
    """The public doc's canonical triple: numbers 1,3,2 as events."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_match)
    ev = _events(spark, [(1, 0, "n1"), (1, 1, "n3"), (1, 2, "n2")])
    # (?1)(?2) with conds {n1, n2}: the n3 event matches no condition,
    # is invisible, so n1/n2 are adjacent -> match
    [r] = sequence_match(ev, "user_id", "ts", "(?1)(?2)",
                         _conds(["n1", "n2"])).collect()
    assert r["matched"] is True
    # adding cond3 = n3 makes the n3 event visible between them:
    # strict adjacency now fails ...
    [r] = sequence_match(ev, "user_id", "ts", "(?1)(?2)",
                         _conds(["n1", "n2", "n3"])).collect()
    assert r["matched"] is False
    # ... but (?1).*(?2) matches again
    [r] = sequence_match(ev, "user_id", "ts", "(?1).*(?2)",
                         _conds(["n1", "n2", "n3"])).collect()
    assert r["matched"] is True


def test_sequence_match_time_constraints(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_match)
    ev = _events(spark, [(1, 0, "A"), (1, 10, "B"),
                         (2, 0, "A"), (2, 40, "B")])
    out = {r["user"]: r["matched"]
           for r in sequence_match(ev, "user_id", "ts", "(?1)(?t>30)(?2)",
                                   _conds(["A", "B"])).collect()}
    assert out == {1: False, 2: True}
    out = {r["user"]: r["matched"]
           for r in sequence_match(ev, "user_id", "ts",
                                   "(?1)(?t>5)(?t<30)(?2)",
                                   _conds(["A", "B"])).collect()}
    assert out == {1: True, 2: False}


def test_sequence_match_reused_condition(spark):
    """(?1).*(?1): pattern items may reuse one condition -- needs two
    distinct matching events."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_match)
    ev = _events(spark, [(1, 0, "A"), (1, 5, "A"), (2, 0, "A")])
    out = {r["user"]: r["matched"]
           for r in sequence_match(ev, "user_id", "ts", "(?1).*(?1)",
                                   _conds(["A"])).collect()}
    assert out == {1: True, 2: False}


def test_sequence_match_bad_patterns_raise(spark):
    import pytest as _pytest
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        parse_sequence_pattern)
    for bad in ["", ".*", "(?0", "(?1)x(?2)", "(?t>5)(?1)"]:
        with _pytest.raises(ValueError):
            parse_sequence_pattern(bad)


def test_sequence_match_matches_bruteforce_randomized(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_match)
    rng = random.Random(7)
    steps = ["A", "B", "C"]
    patterns = ["(?1)(?2)", "(?1).*(?2)(?3)", "(?1)(?t<5)(?2).*(?3)",
                "(?1).*(?1).*(?2)", "(?3).*(?1)"]
    rows, per_user = [], {}
    for u in range(12):
        evs = [(i, rng.randrange(0, 20),
                rng.choice(["A", "B", "C", "X", "Y"]))
               for i in range(rng.randrange(1, 9))]
        per_user[u] = evs
        rows += [(u, s, t) for _, s, t in evs]
    ev_df = _events(spark, rows)
    for pat in patterns:
        got = {r["user"]: r["matched"]
               for r in sequence_match(ev_df, "user_id", "ts", pat,
                                       _conds(steps)).collect()}
        for u, evs in per_user.items():
            # the df assigns fresh event_ids in row order; rebuild the
            # per-user view the same way _events saw it
            ordered = [(i, s, t) for i, (u2, s, t) in enumerate(rows)
                       if u2 == u]
            expect = _brute_seq_match(ordered, pat, steps)
            vis = any(t in steps for _, _, t in ordered)
            if not vis:
                assert u not in got
            else:
                assert got[u] == expect, (pat, u, ordered)


def test_sequence_match_deterministic_under_partitioning(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_match)
    rng = random.Random(11)
    rows = [(u, rng.randrange(0, 30), rng.choice(["A", "B", "C"]))
            for u in range(10) for _ in range(6)]
    ev = _events(spark, rows)
    pat, conds = "(?1).*(?t<20)(?2)(?3)", _conds(["A", "B", "C"])
    a = sorted(map(tuple, sequence_match(
        ev.repartition(1), "user_id", "ts", pat, conds).collect()))
    b = sorted(map(tuple, sequence_match(
        ev.repartition(17), "user_id", "ts", pat, conds).collect()))
    assert a == b


def test_merge_maps_max_min(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import merge_maps
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 5}), (1, {"a": 3}), (2, {"c": 2})],
        "k long, m map<string,long>")
    mx = {r["k"]: dict(r["summed"])
          for r in merge_maps(df, "k", "m", "max").collect()}
    mn = {r["k"]: dict(r["summed"])
          for r in merge_maps(df, "k", "m", "min").collect()}
    assert mx == {1: {"a": 3, "b": 5}, 2: {"c": 2}}
    assert mn == {1: {"a": 1, "b": 5}, 2: {"c": 2}}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        merge_maps(df, "k", "m", "avg")


def test_sequence_count_pattern_nonoverlapping_greedy(spark):
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_count_pattern)
    # A B A B -> two non-overlapping (?1).*(?2) matches
    ev = _events(spark, [(1, 0, "A"), (1, 1, "B"),
                         (1, 2, "A"), (1, 3, "B")])
    [r] = sequence_count_pattern(ev, "user_id", "ts", "(?1).*(?2)",
                                 _conds(["A", "B"])).collect()
    assert r["n_matches"] == 2
    # strict adjacency: A X B has the visible X between -> 0; A B -> 1
    ev2 = _events(spark, [(1, 0, "A"), (1, 1, "X"), (1, 2, "B"),
                          (2, 0, "A"), (2, 1, "B")])
    got = {r["user"]: r["n_matches"]
           for r in sequence_count_pattern(
               ev2, "user_id", "ts", "(?1)(?2)",
               _conds(["A", "B", "X"])).collect()}
    assert got == {1: 0, 2: 1}
    # time constraint: only the close pair counts
    ev3 = _events(spark, [(1, 0, "A"), (1, 2, "B"),
                          (1, 10, "A"), (1, 50, "B")])
    [r] = sequence_count_pattern(ev3, "user_id", "ts",
                                 "(?1)(?t<5)(?2)",
                                 _conds(["A", "B"])).collect()
    assert r["n_matches"] == 1


def test_sequence_count_pattern_agrees_with_chain_automaton(spark):
    """For '.*'-separated chains over disjoint conditions the greedy
    earliest-end scan must equal the restart-on-match automaton of the
    plain sequence_count."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_count, sequence_count_pattern)
    rng = random.Random(13)
    rows = [(u, rng.randrange(0, 40), rng.choice(["A", "B", "C", "X"]))
            for u in range(15) for _ in range(12)]
    ev = _events(spark, rows)
    conds = _conds(["A", "B", "C"])
    plain = {r["user"]: r["n_matches"] for r in sequence_count(
        ev, "user_id", "ts", conds).collect()}
    patt = {r["user"]: r["n_matches"] for r in sequence_count_pattern(
        ev, "user_id", "ts", "(?1).*(?2).*(?3)", conds).collect()}
    for u in patt:
        assert patt[u] == plain.get(u, 0), u


def test_sequence_and_funnel_matches_standalone_ops(spark, sf_dir):
    """The fused one-scan operator must agree row-for-row with
    sequence_match and window_funnel run separately, on the real
    fixture events (cdc_op_counters' exact workload)."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_and_funnel)
    from mysql_syncer_clickhouse_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    conds = [F.col("event_type") == "click",
             F.col("event_type") == "purchase"]
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_match)
    fused = {r["user"]: (r["matched"], r["level"])
             for r in sequence_and_funnel(
                 ev, "user_id", "ts", "(?1).*(?2)", conds,
                 window_s=1800).collect()}
    sm = {r["user"]: r["matched"]
          for r in sequence_match(ev, "user_id", "ts", "(?1).*(?2)",
                                  conds).collect()}
    wf = {r["user"]: r["level"]
          for r in window_funnel(ev, "user_id", "ts", conds,
                                 window_s=1800).collect()}
    assert set(fused) == set(sm) == set(wf)
    for u, (m, lv) in fused.items():
        assert m == sm[u] and lv == wf[u], u


def test_sequence_funnel_next_node_matches_standalone_ops(spark, sf_dir):
    """The three-way fused operator (round 15: one events scan + one
    shuffle + one Python pass for cdc_op_counters' sequenceMatch +
    windowFunnel + sequenceNextNode rows) must agree row-for-row with
    sequence_and_funnel and sequence_next_node run separately, on the
    real fixture events -- including which users appear at all on each
    side (sf_any / nn_matched reproduce the standalone presence
    rules)."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_and_funnel, sequence_funnel_next_node,
        sequence_next_node)
    from mysql_syncer_clickhouse_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    conds = [F.col("event_type") == "click",
             F.col("event_type") == "purchase"]
    nn_conds = [F.col("event_type") == "click",
                F.col("event_type") == "view"]
    fused = sequence_funnel_next_node(
        ev, "user_id", "ts", "(?1).*(?2)", conds, 1800,
        "event_type", nn_conds).collect()
    sf_side = {r["user"]: (r["matched"], r["level"])
               for r in fused if r["sf_any"]}
    nn_side = {r["user"]: r["next_value"]
               for r in fused if r["nn_matched"]}
    saf = {r["user"]: (r["matched"], r["level"])
           for r in sequence_and_funnel(ev, "user_id", "ts",
                                        "(?1).*(?2)", conds,
                                        window_s=1800).collect()}
    snn = {r["user"]: r["next_value"]
           for r in sequence_next_node(ev, "user_id", "ts",
                                       "event_type",
                                       nn_conds).collect()}
    assert sf_side == saf
    assert nn_side == snn


def test_sequence_funnel_next_node_empty_input(spark):
    """Zero matching events -> zero rows (both standalone operators'
    presence rule), and the schema still binds."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_funnel_next_node)
    ev = _events(spark, [(1, 0, "view"), (1, 5, "view")])
    out = sequence_funnel_next_node(
        ev, "user_id", "ts", "(?1).*(?2)",
        _conds(["click", "purchase"]), 1800, "event_type",
        _conds(["click", "purchase"])).collect()
    assert out == []


def test_window_funnel_strict_order_doc_example(spark):
    """The ClickHouse docs example: A->B->D->C stops A->B->C at D
    under strict_order (level 2); the base mode sees through D
    (level 3). A foreign event BEFORE the chain starts is ignored."""
    ev = _events(spark, [(1, 1, "A"), (1, 2, "B"), (1, 3, "D"),
                         (1, 4, "C"),
                         (2, 0, "X"), (2, 1, "A"), (2, 2, "B"),
                         (2, 3, "C")])
    conds = _conds(["A", "B", "C"])
    base = {r["user"]: r["level"]
            for r in window_funnel(ev, "user_id", "ts", conds,
                                   60).collect()}
    strict = {r["user"]: r["level"]
              for r in window_funnel(ev, "user_id", "ts", conds, 60,
                                     modes=["strict_order"]).collect()}
    assert base == {1: 3, 2: 3}
    assert strict == {1: 2, 2: 3}


def test_window_funnel_strict_dedup_stops_on_repeat(spark):
    """A second event matching an already-held condition interrupts
    the scan: A B B C reports level 2 under strict_dedup, 3 base.
    Repeated A events are chain RESTARTS, never dedup breaks."""
    ev = _events(spark, [(1, 1, "A"), (1, 2, "B"), (1, 3, "B"),
                         (1, 4, "C"),
                         (2, 1, "A"), (2, 2, "A"), (2, 3, "B"),
                         (2, 4, "C")])
    conds = _conds(["A", "B", "C"])
    strict = {r["user"]: r["level"]
              for r in window_funnel(ev, "user_id", "ts", conds, 60,
                                     modes=["strict_dedup"]).collect()}
    assert strict == {1: 2, 2: 3}


def test_window_funnel_strict_increase_rejects_equal_ts(spark):
    """Same-timestamp steps extend a chain in base mode (tiebreak
    order) but not under strict_increase."""
    ev = _events(spark, [(1, 1, "A"), (1, 1, "B"), (1, 2, "C")])
    conds = _conds(["A", "B", "C"])
    base = window_funnel(ev, "user_id", "ts", conds, 60).collect()
    strict = window_funnel(ev, "user_id", "ts", conds, 60,
                           modes=["strict_increase"]).collect()
    assert base[0]["level"] == 3
    assert strict[0]["level"] == 1


def test_window_funnel_modes_never_exceed_base(spark):
    """Every strict mode only removes chains, so on randomized streams
    the moded level is <= the base level, and with no foreign events,
    no repeats, and strictly increasing timestamps all modes agree
    with base exactly."""
    rng = random.Random(11)
    rows = []
    for u in range(1, 9):
        rows += [(u, rng.randrange(0, 60), rng.choice("ABCX"))
                 for _ in range(9)]
    ev = _events(spark, rows)
    conds = _conds(["A", "B", "C"])
    base = {r["user"]: r["level"]
            for r in window_funnel(ev, "user_id", "ts", conds,
                                   30).collect()}
    for mode in ("strict_dedup", "strict_order", "strict_increase"):
        got = {r["user"]: r["level"]
               for r in window_funnel(ev, "user_id", "ts", conds, 30,
                                      modes=[mode]).collect()}
        for u, lvl in got.items():
            assert lvl <= base.get(u, 0), (mode, u)

    clean = _events(spark, [(1, 1, "A"), (1, 2, "B"), (1, 3, "C"),
                            (2, 5, "A"), (2, 6, "B")])
    want = {r["user"]: r["level"]
            for r in window_funnel(clean, "user_id", "ts", conds,
                                   30).collect()}
    got = {r["user"]: r["level"]
           for r in window_funnel(
               clean, "user_id", "ts", conds, 30,
               modes=list(_FUNNEL_MODES)).collect()}
    assert got == want == {1: 3, 2: 2}


def test_window_funnel_unknown_mode_raises(spark):
    ev = _events(spark, [(1, 1, "A")])
    import pytest
    with pytest.raises(ValueError):
        window_funnel(ev, "user_id", "ts", _conds(["A"]), 60,
                      modes=["strictly_wrong"])


def _snn(spark, rows, conds, **kw):
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_next_node)
    ev = _events(spark, rows)
    return {r["user"]: r["next_value"]
            for r in sequence_next_node(
                ev, "user_id", "ts", "event_type",
                _conds(conds), **kw).collect()}


def test_sequence_next_node_forward_bases(spark):
    """sequenceNextNode forward: the value just after the first
    stream-ADJACENT chain (gap events break adjacency, unlike
    windowFunnel), per base."""
    rows = [(1, 0, "A"), (1, 1, "B"), (1, 2, "C"),      # A B C ...
            (1, 3, "A"), (1, 4, "B"), (1, 5, "D"),      # ... A B D
            (2, 0, "A"), (2, 1, "X"), (2, 2, "B"),      # A X B: no adj
            (3, 0, "X"), (3, 1, "A"), (3, 2, "B")]      # chain at end
    got = _snn(spark, rows, ["A", "B"])                 # first_match
    assert got == {1: "C", 3: None}                     # 2 absent
    got = _snn(spark, rows, ["A", "B"], base="last_match")
    assert got == {1: "D", 3: None}
    got = _snn(spark, rows, ["A", "B"], base="head")
    assert got == {1: "C"}                              # 3's A not at head


def test_sequence_next_node_backward(spark):
    """backward walks the reversed stream: conds in the listed order
    along that walk, returning the event chronologically BEFORE the
    chain ('what did the user do just before Basket->Home?')."""
    rows = [(1, 0, "S"), (1, 1, "Basket"), (1, 2, "Home"),
            (2, 0, "Basket"), (2, 1, "Home")]
    # reversed walk: Home, Basket, ... -> next = S
    got = _snn(spark, rows, ["Home", "Basket"],
               direction="backward", base="tail")
    assert got == {1: "S", 2: None}


def test_sequence_next_node_deterministic_and_validated(spark):
    import pytest

    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_next_node)
    rows = [(1, 0, "A"), (1, 0, "B"), (1, 1, "C")]   # ts tie: event_id
    got = _snn(spark, rows, ["A", "B"])
    assert got == {1: "C"}
    ev = _events(spark, rows)
    with pytest.raises(ValueError):
        sequence_next_node(ev, "user_id", "ts", "event_type",
                           _conds(["A"]), direction="sideways")
    with pytest.raises(ValueError):
        sequence_next_node(ev, "user_id", "ts", "event_type",
                           _conds(["A"]), base="mid_match")


def test_window_funnel_strict_order_drops_all_foreign_users(spark):
    """strict_order keeps step-0 events as chain breakers, but a user
    ALL of whose events match nothing must stay absent (the documented
    contract for every mode), not surface as (user, 0)."""
    ev = _events(spark, [(1, 1, "A"), (1, 2, "B"),
                         (2, 1, "X"), (2, 2, "Y")])
    conds = _conds(["A", "B", "C"])
    strict = {r["user"]: r["level"]
              for r in window_funnel(ev, "user_id", "ts", conds, 60,
                                     modes=["strict_order"]).collect()}
    assert strict == {1: 2}


def test_window_funnel_strict_order_ignores_prechain_events(spark):
    """Pre-chain events never break under strict_order (upstream's
    first_event guard on BOTH branches): B,A,B,C reaches level 3 --
    the pre-chain B (predecessor unreached) is ignored, matching the
    current AggregateFunctionWindowFunnel algorithm."""
    ev = _events(spark, [(1, 1, "B"), (1, 2, "A"), (1, 3, "B"),
                         (1, 4, "C")])
    conds = _conds(["A", "B", "C"])
    strict = {r["user"]: r["level"]
              for r in window_funnel(ev, "user_id", "ts", conds, 60,
                                     modes=["strict_order"]).collect()}
    assert strict == {1: 3}


def test_sequence_next_node_string_user_column(spark):
    """The applyInPandas output schema derives the user type from the
    input -- a string user column works end-to-end (was hard-coded
    `user long`)."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_next_node)
    df = spark.createDataFrame(
        [(1, "alice", "2026-01-01 00:00:01", "A"),
         (2, "alice", "2026-01-01 00:00:02", "B"),
         (3, "alice", "2026-01-01 00:00:03", "C"),
         (4, "bob", "2026-01-01 00:00:01", "X")],
        "event_id long, user_id string, ts_str string, event_type string"
    ).select("event_id", "user_id",
             F.col("ts_str").cast("timestamp").alias("ts"), "event_type")
    out = sequence_next_node(df, "user_id", "ts", "event_type",
                             _conds(["A", "B"]))
    assert dict(out.dtypes)["user"] == "string"
    assert {r["user"]: r["next_value"] for r in out.collect()} \
        == {"alice": "C"}


def test_all_funnel_scanners_accept_string_user_column(spark):
    """ADVICE r7: sequence_next_node derived the user type but the
    sibling scanners still hard-coded `user long` -- every
    applyInPandas funnel operator must carry the input's user type."""
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_and_funnel, sequence_count, sequence_count_pattern,
        sequence_match, window_funnel)
    df = spark.createDataFrame(
        [(1, "alice", "2026-01-01 00:00:01", "A"),
         (2, "alice", "2026-01-01 00:00:02", "B"),
         (3, "alice", "2026-01-01 00:00:03", "A"),
         (4, "alice", "2026-01-01 00:00:04", "B"),
         (5, "bob", "2026-01-01 00:00:01", "A")],
        "event_id long, user_id string, ts_str string, event_type string"
    ).select("event_id", "user_id",
             F.col("ts_str").cast("timestamp").alias("ts"), "event_type")
    conds = _conds(["A", "B"])

    wf = window_funnel(df, "user_id", "ts", conds, 60)
    assert dict(wf.dtypes)["user"] == "string"
    assert {r["user"]: r["level"] for r in wf.collect()} == \
        {"alice": 2, "bob": 1}
    wf_m = window_funnel(df, "user_id", "ts", conds, 60,
                         modes=["strict_dedup"])
    assert dict(wf_m.dtypes)["user"] == "string"

    sc = sequence_count(df, "user_id", "ts", conds)
    assert dict(sc.dtypes)["user"] == "string"
    assert {r["user"]: r["n_matches"] for r in sc.collect()} == \
        {"alice": 2, "bob": 0}

    scp = sequence_count_pattern(df, "user_id", "ts", "(?1)(?2)", conds)
    assert dict(scp.dtypes)["user"] == "string"
    assert {r["user"]: r["n_matches"] for r in scp.collect()} == \
        {"alice": 2, "bob": 0}

    sm = sequence_match(df, "user_id", "ts", "(?1).*(?2)", conds)
    assert dict(sm.dtypes)["user"] == "string"
    assert {r["user"]: r["matched"] for r in sm.collect()} == \
        {"alice": True, "bob": False}

    saf = sequence_and_funnel(df, "user_id", "ts", "(?1)(?2)", conds, 60)
    assert dict(saf.dtypes)["user"] == "string"
    assert {r["user"]: (r["matched"], r["level"])
            for r in saf.collect()} == \
        {"alice": (True, 2), "bob": (False, 1)}


def test_bucketed_scan_many_users_one_group(spark, monkeypatch):
    """The round-15 bucketed scans group users by hash bucket and
    slice them back out inside the pandas frame; force EVERY user into
    ONE bucket group so the in-bucket run-boundary slicing is the path
    under test (with the default parallelism x 32 buckets, small
    fixtures rarely collide), and assert results are identical to the
    default bucketing."""
    import mysql_syncer_clickhouse_spark.operators.funnel as fu
    from mysql_syncer_clickhouse_spark.operators.funnel import (
        sequence_and_funnel, sequence_next_node)

    rng = random.Random(7)
    rows = [(u, rng.randrange(60), rng.choice("ABC"))
            for u in range(12) for _ in range(rng.randrange(1, 9))]
    ev = _events(spark, rows)
    conds = _conds(["A", "B"])

    def snapshot():
        wf = {(r["user"], r["level"])
              for r in window_funnel(ev, "user_id", "ts", conds,
                                     window_s=30).collect()}
        sc = {(r["user"], r["n_matches"])
              for r in sequence_count(ev, "user_id", "ts",
                                      conds).collect()}
        saf = {(r["user"], r["matched"], r["level"])
               for r in sequence_and_funnel(ev, "user_id", "ts",
                                            "(?1).*(?2)", conds,
                                            30).collect()}
        nn = {(r["user"], r["next_value"])
              for r in sequence_next_node(ev, "user_id", "ts",
                                          "event_type",
                                          conds).collect()}
        return wf, sc, saf, nn

    default = snapshot()
    monkeypatch.setattr(fu, "_BUCKETS_PER_CORE", 0)   # -> 1 bucket
    assert snapshot() == default
