"""Upsert-by-dedup semantics -- the reference's core correctness
scenarios (river/river_test.go:216-399) re-encoded as changelog
fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators.upsert import (
    apply_snapshot_and_changelog, fan_in, fill_partial_updates, latest_state)

SCHEMA = "seq long, op string, id long, title string, content string"


@pytest.fixture()
def make_cl(spark):
    def _make(rows):
        return spark.createDataFrame(rows, SCHEMA)
    return _make


def _state(df):
    return {r["id"]: (r["title"], r["content"])
            for r in df.collect()}


def test_insert_update_delete_chain(make_cl):
    cl = make_cl([
        (1, "insert", 1, "first", "c1"),
        (2, "update", 1, "first-edited", "c1"),
        (3, "insert", 2, "second", "c2"),
        (4, "delete", 2, None, None),
    ])
    st = _state(latest_state(cl, ["id"]))
    assert st == {1: ("first-edited", "c1")}


def test_multiple_updates_latest_wins(make_cl):
    cl = make_cl([
        (1, "insert", 1, "v1", "x"),
        (2, "update", 1, "v2", "x"),
        (3, "update", 1, "v3", "x"),
    ])
    st = _state(latest_state(cl, ["id"]))
    assert st == {1: ("v3", "x")}


def test_delete_then_reinsert(make_cl):
    # ordering test: reference reorders mutations before inserts within
    # a batch (clickhouse/client.go:93-126); seq-ordered dedup is
    # order-correct by construction (SURVEY §2.4)
    cl = make_cl([
        (1, "insert", 1, "old", "x"),
        (2, "delete", 1, None, None),
        (3, "insert", 1, "new", "y"),
    ])
    st = _state(latest_state(cl, ["id"]))
    assert st == {1: ("new", "y")}


def test_pk_value_change_moves_row(make_cl):
    # id 3 -> 30 must move the row (river/river_test.go:318-320):
    # binlog-wise it is delete(3) + insert(30)
    cl = make_cl([
        (1, "insert", 3, "three", "c"),
        (2, "delete", 3, None, None),
        (3, "insert", 30, "three", "c"),
    ])
    st = _state(latest_state(cl, ["id"]))
    assert st == {30: ("three", "c")}


def test_partial_update_merge(make_cl):
    # update carries only changed columns (river/sync.go:367-370)
    cl = make_cl([
        (1, "insert", 1, "t1", "c1"),
        (2, "update", 1, "t2", None),       # only title changed
        (3, "update", 1, None, "c2"),       # only content changed
    ])
    st = _state(fill_partial_updates(cl, ["id"], ["title", "content"]))
    assert st == {1: ("t2", "c2")}


def test_partial_update_does_not_leak_across_delete(make_cl):
    cl = make_cl([
        (1, "insert", 1, "t1", "c1"),
        (2, "delete", 1, None, None),
        (3, "insert", 1, "t2", None),       # fresh incarnation, no c1
        (4, "update", 1, None, "c9"),
    ])
    st = _state(fill_partial_updates(cl, ["id"], ["title", "content"]))
    assert st == {1: ("t2", "c9")}


def test_snapshot_plus_changelog(spark, make_cl):
    snap = spark.createDataFrame(
        [(1, "snap1", "s"), (2, "snap2", "s")],
        "id long, title string, content string")
    cl = make_cl([
        (0, "update", 1, "changed", "s"),
        (1, "delete", 2, None, None),
        (2, "insert", 3, "new", "n"),
    ])
    st = _state(apply_snapshot_and_changelog(snap, cl, ["id"]))
    assert st == {1: ("changed", "s"), 3: ("new", "n")}


def test_composite_pk(spark):
    cl = spark.createDataFrame(
        [(1, "insert", 1, "a", "x"), (2, "insert", 1, "b", "y"),
         (3, "update", 1, "a", "x2")],
        SCHEMA)
    # composite key (id, title): both rows live, each latest wins
    st = {(r["id"], r["title"]): r["content"]
          for r in latest_state(cl, ["id", "title"]).collect()}
    assert st == {(1, "a"): "x2", (1, "b"): "y"}


def test_fan_in_schema_drift(spark):
    a = spark.createDataFrame([(1, "x", "p")], "id long, t string, extra string")
    b = spark.createDataFrame([(2, "y")], "id long, t string")
    got = {r["id"]: (r["t"], r["extra"]) for r in fan_in([a, b]).collect()}
    assert got == {1: ("x", "p"), 2: ("y", None)}


def test_pk_value_change_moves_row(make_cl):
    """The reference's PK-change scenario (river/river_test.go:318-320,
    355-360): UPDATE ... SET id = 30 WHERE id = 3 must MOVE the row --
    old key gone, new key present. In the changelog model a PK-changing
    update is emitted as delete(old_pk) + insert(new_pk), which is
    exactly what the binlog row images give a producer (before image
    keyed 3, after image keyed 30)."""
    cl = make_cl([
        (1, "insert", 3, "third", "c3"),
        (2, "insert", 4, "fourth", "c4"),
        # UPDATE id: 3 -> 30 becomes two events sharing one source op
        (3, "delete", 3, None, None),
        (4, "insert", 30, "third", "c3"),
    ])
    st = _state(latest_state(cl, ["id"]))
    assert 3 not in st
    assert st[30] == ("third", "c3")
    assert st[4] == ("fourth", "c4")


def test_delete_then_reinsert_same_pk(make_cl):
    """Tombstone must not shadow a LATER re-insert of the same PK (the
    ordering bug the reference has inside one batch, documented at
    SURVEY §2.4: mutations run before inserts regardless of event
    order -- clickhouse/client.go:93-126). Our seq-ordered dedup is
    order-correct by construction."""
    cl = make_cl([
        (1, "insert", 7, "v1", "c"),
        (2, "delete", 7, None, None),
        (3, "insert", 7, "v2", "c"),
    ])
    st = _state(latest_state(cl, ["id"]))
    assert st == {7: ("v2", "c")}


def test_latest_state_matches_dict_replay_randomized(spark):
    """Property: for ANY changelog (random ops over a small pk space,
    unique seq), latest_state equals a sequential dict replay --
    inserts/updates set the row, deletes drop it, later seq wins.
    Random composite keys + several shuffle layouts."""
    import random

    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state

    rng = random.Random(23)
    for trial in range(5):
        n = rng.randrange(20, 120)
        rows = []
        for seq in range(1, n + 1):
            pk = (rng.randrange(0, 8), rng.choice("xyz"))
            op = rng.choice(["insert", "update", "update", "delete"])
            rows.append((seq, op, pk[0], pk[1],
                         f"v{seq}" if op != "delete" else None))
        df = spark.createDataFrame(
            rows, "seq long, op string, k1 long, k2 string, val string")

        state = {}
        for seq, op, k1, k2, val in rows:        # replay in seq order
            if op == "delete":
                state.pop((k1, k2), None)
            else:
                state[(k1, k2)] = (seq, val)
        expect = {k: v for k, v in state.items()}

        got = {(r["k1"], r["k2"]): (r["seq"], r["val"])
               for r in latest_state(
                   df.repartition(rng.randrange(1, 7)),
                   ["k1", "k2"]).collect()}
        assert got == expect, f"trial {trial}"
