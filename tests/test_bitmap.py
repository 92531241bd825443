"""Bitmap aggregates (operators/bitmap.py): exact set semantics vs
Python set algebra on randomized data, negative-value injectivity,
sparse-state bound, merge idempotence, determinism."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators.bitmap import (
    bitmap_agg, bitmap_and, bitmap_andnot, bitmap_cardinality,
    bitmap_contains, bitmap_or, bitmap_xor)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def _sets(rows):
    out: dict[str, set] = {}
    for g, v in rows:
        out.setdefault(g, set()).add(v)
    return out


def _card(bm, groups=("g",)):
    return {r["g"]: r["cardinality"]
            for r in bitmap_cardinality(bm, list(groups)).collect()}


def test_cardinality_matches_count_distinct_randomized(spark):
    rng = random.Random(3)
    rows = [(f"g{rng.randrange(4)}",
             rng.randrange(-500, 500)) for _ in range(3000)]
    bm = bitmap_agg(_df(spark, rows), ["g"], "v")
    expect = {g: len(s) for g, s in _sets(rows).items()}
    assert _card(bm) == expect


def test_set_algebra_matches_python_sets(spark):
    rng = random.Random(7)
    ra = [("x", rng.randrange(0, 300)) for _ in range(500)]
    rb = [("x", rng.randrange(100, 400)) for _ in range(500)]
    sa, sb = _sets(ra)["x"], _sets(rb)["x"]
    a = bitmap_agg(_df(spark, ra), ["g"], "v")
    b = bitmap_agg(_df(spark, rb), ["g"], "v")
    assert _card(bitmap_and(a, b, ["g"]))["x"] == len(sa & sb)
    assert _card(bitmap_or(a, b, ["g"]))["x"] == len(sa | sb)
    assert _card(bitmap_xor(a, b, ["g"]))["x"] == len(sa ^ sb)
    assert _card(bitmap_andnot(a, b, ["g"]))["x"] == len(sa - sb)
    assert _card(bitmap_andnot(b, a, ["g"]))["x"] == len(sb - sa)


def test_negative_values_roundtrip_injectively(spark):
    vals = [-64, -33, -32, -31, -1, 0, 1, 31, 32, 63]
    rows = [("n", v) for v in vals]
    bm = bitmap_agg(_df(spark, rows), ["g"], "v")
    assert _card(bm)["n"] == len(vals)


def test_state_bounded_and_nulls_skipped(spark):
    rows = [("s", v) for v in range(0, 3200)]
    df = _df(spark, rows).union(
        spark.createDataFrame([("s", None)], "g string, v long"))
    bm = bitmap_agg(df, ["g"], "v")
    assert bm.count() == 100          # 3200 contiguous values / 32
    assert _card(bm)["s"] == 3200


def test_merge_idempotent_replay(spark):
    """OR-merging the same epoch twice cannot double-count -- the
    continuous-agg replay contract."""
    rows = [("e", v) for v in range(50)]
    bm = bitmap_agg(_df(spark, rows), ["g"], "v")
    merged = bitmap_or(bm, bm, ["g"])
    assert _card(merged)["e"] == 50
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, bm.collect()))


def test_contains(spark):
    rows = [("c", 7), ("c", 100), ("d", 8)]
    bm = bitmap_agg(_df(spark, rows), ["g"], "v")
    got = {r["g"]: r["contains"]
           for r in bitmap_contains(bm, 7, ["g"]).collect()}
    assert got.get("c") is True
    assert got.get("d") is not True   # absent row or False


def test_deterministic_across_partitionings(spark):
    rng = random.Random(11)
    rows = [(f"g{rng.randrange(3)}", rng.randrange(0, 1000))
            for _ in range(2000)]
    a = bitmap_agg(_df(spark, rows).repartition(1), ["g"], "v")
    b = bitmap_agg(_df(spark, rows).repartition(17), ["g"], "v")
    assert sorted(map(tuple, a.collect())) \
        == sorted(map(tuple, b.collect()))


def test_pure_jvm_plan(spark):
    rows = [("p", v) for v in range(100)]
    plan = (bitmap_cardinality(bitmap_agg(_df(spark, rows), ["g"], "v"),
                               ["g"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
