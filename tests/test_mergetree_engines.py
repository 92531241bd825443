"""Collapsing / VersionedCollapsing / Summing MergeTree read-time
analogs + the widened auto-DDL engine surface."""

from __future__ import annotations

import pytest

from mysql_syncer_clickhouse_spark.functions.typemap import (
    clickhouse_create_table_ddl)
from mysql_syncer_clickhouse_spark.operators.upsert import (
    collapsing_final_state, summing_final_state)


def test_collapsing_final_state(spark):
    rows = [
        # pk 1: insert, cancel, re-insert with new value -> survives
        (1, 1, 10, "a1"), (2, -1, 10, "a1"), (3, 1, 10, "a2"),
        # pk 2: insert then cancel -> gone
        (4, 1, 20, "b1"), (5, -1, 20, "b1"),
        # pk 3: plain insert -> survives
        (6, 1, 30, "c1"),
    ]
    df = spark.createDataFrame(
        rows, "seq long, sign int, pk long, val string")
    out = {r["pk"]: r["val"] for r in collapsing_final_state(
        df, ["pk"], version_col="seq").collect()}
    assert out == {10: "a2", 30: "c1"}
    # deterministic under repartitioning
    out2 = {r["pk"]: r["val"] for r in collapsing_final_state(
        df.repartition(7), ["pk"], version_col="seq").collect()}
    assert out2 == out
    with pytest.raises(ValueError, match="version/seq"):
        collapsing_final_state(df, ["pk"])


def test_summing_final_state(spark):
    rows = [(10, 5, 1.5, "x"), (10, -5, 2.5, "x"),
            (20, 3, 0.0, "y"), (20, 4, 1.0, "y"),
            (30, 0, 0.0, "z")]
    df = spark.createDataFrame(
        rows, "pk long, hits long, amt double, tag string")
    out = {r["pk"]: (r["hits"], r["amt"], r["tag"])
           for r in summing_final_state(
               df, ["pk"], ["hits", "amt"]).collect()}
    # pk 10: hits sum to 0 but amt is 4.0 -> kept
    assert out[10] == (0, 4.0, "x")
    assert out[20] == (7, 1.0, "y")
    assert 30 not in out                    # all sums zero -> dropped
    kept = summing_final_state(df, ["pk"], ["hits", "amt"],
                               drop_zero=False).collect()
    assert {r["pk"] for r in kept} == {10, 20, 30}


def test_create_ddl_engine_variants():
    cols = [("id", "bigint", False), ("sign", "tinyint", False),
            ("ver", "bigint", False), ("v1", "int", True),
            ("v2", "int", True)]
    base = clickhouse_create_table_ddl("db", "t", cols, ("id",))
    assert "ENGINE = ReplacingMergeTree ORDER BY (`id`)" in base
    c = clickhouse_create_table_ddl(
        "db", "t", cols, ("id",), engine="CollapsingMergeTree",
        engine_args=("sign",))
    assert "ENGINE = CollapsingMergeTree(`sign`) ORDER BY" in c
    vc = clickhouse_create_table_ddl(
        "db", "t", cols, ("id",),
        engine="VersionedCollapsingMergeTree",
        engine_args=("sign", "ver"))
    assert "VersionedCollapsingMergeTree(`sign`, `ver`)" in vc
    s = clickhouse_create_table_ddl(
        "db", "t", cols, ("id",), engine="SummingMergeTree",
        engine_args=("v1", "v2"))
    assert "SummingMergeTree((`v1`, `v2`))" in s
    with pytest.raises(ValueError, match="unsupported engine"):
        clickhouse_create_table_ddl("db", "t", cols, ("id",),
                                    engine="GraphiteMergeTree")
    with pytest.raises(ValueError, match="not in table"):
        clickhouse_create_table_ddl("db", "t", cols, ("id",),
                                    engine="CollapsingMergeTree",
                                    engine_args=("nope",))
