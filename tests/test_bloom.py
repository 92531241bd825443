"""Distributed Bloom filter (operators/bloom.py): no false negatives,
bounded false positives, bounded state, map-only probe plan,
determinism across partitionings, and DuckDB arithmetic parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators.bloom import (
    BLOOM_BITS, BLOOM_K, bloom_build, bloom_might_contain, bloom_screen_new,
    bloom_sql)


@pytest.fixture(scope="module")
def seen_items(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("url-"), F.col("id")).alias("item"))


@pytest.fixture(scope="module")
def bloom(spark, seen_items):
    return bloom_build(seen_items, "item").cache()


def test_no_false_negatives(spark, seen_items, bloom):
    flagged = bloom_might_contain(seen_items, "item", bloom)
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_false_positive_rate_bounded(spark, bloom):
    fresh = spark.range(100000, 104000).select(
        F.concat(F.lit("url-"), F.col("id")).alias("item"))
    flagged = bloom_might_contain(fresh, "item", bloom)
    fp = flagged.filter(F.col("might_contain")).count()
    # m=65536, k=4, n=2000 -> theoretical FP ~ 2e-4; assert a loose 1%
    assert fp / 4000 < 0.01


def test_state_bounded_by_m(bloom):
    assert bloom.count() <= BLOOM_BITS // 32


def test_null_items(spark, bloom):
    probe = spark.createDataFrame([("url-1",), (None,)], "item string")
    rows = {r["item"]: r["might_contain"]
            for r in bloom_might_contain(probe, "item", bloom).collect()}
    assert rows["url-1"] is True
    assert rows[None] is False


def test_screen_new_drops_all_seen(spark, seen_items):
    # overlap: 1000..2999 -- seen half must vanish, most of the new
    # half survives (minus FPs)
    corpus = spark.range(1000, 3000).select(
        F.concat(F.lit("url-"), F.col("id")).alias("item"))
    kept = bloom_screen_new(corpus, seen_items, "item")
    kept_ids = {r["item"] for r in kept.collect()}
    assert not any(f"url-{i}" in kept_ids for i in range(1000, 2000))
    assert len(kept_ids) > 900


def test_deterministic_across_partitionings(spark, seen_items, bloom):
    rebuilt = bloom_build(seen_items.repartition(13), "item")
    a = sorted((r["word"], r["bits"]) for r in bloom.collect())
    b = sorted((r["word"], r["bits"]) for r in rebuilt.collect())
    assert a == b


def test_probe_plan_is_map_only(spark, seen_items, bloom):
    """The probe side stays map-only: the densified filter arrives as
    ONE broadcast row (round 15: was k separate broadcast hash joins,
    each re-materializing the build aggregate), and the k bit tests are
    pure codegen -- no shuffle exchange anywhere on the probe side."""
    probe = spark.range(0, 100).select(
        F.concat(F.lit("u"), F.col("id")).alias("item"))
    plan = bloom_might_contain(probe, "item", bloom.localCheckpoint())\
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffleExchange" not in plan.replace(
        "BroadcastExchange", "")


def test_duckdb_parity(spark, seen_items, bloom):
    """The oracle CTE reproduces the filter bit-for-bit."""
    con = duckdb.connect()
    con.execute("CREATE TABLE items AS SELECT 'url-' || i AS item "
                "FROM range(0, 2000) t(i)")
    oracle = con.execute(
        "SELECT word, bits FROM (" + bloom_sql("items", "item")
        + ") ORDER BY word").fetchall()
    ours = sorted((r["word"], r["bits"]) for r in bloom.collect())
    assert ours == [tuple(r) for r in oracle]
