"""dictGet strict-mode: duplicate dictionary keys refuse loudly
(a left join would silently multiply fact rows; ClickHouse rejects
duplicates at dictionary load). Base semantics + plan shape are in
test_transforms.py::test_dict_get_broadcast_lookup."""

from __future__ import annotations

import pytest

from mysql_syncer_clickhouse_spark.functions.transforms import dict_get


def test_dict_get_strict_duplicate_key_raises(spark):
    facts = spark.createDataFrame([(1, 10)], "id int, k int")
    dim = spark.createDataFrame(
        [(10, "a"), (10, "b")], "k int, v string")
    out = dict_get(facts, dim, "k", ["v"], strict=True)
    with pytest.raises(Exception, match="duplicate dictionary key"):
        out.collect()
    # default (strict=False) keeps plain left-join semantics
    assert len(dict_get(facts, dim, "k", ["v"]).collect()) == 2


def test_dict_get_strict_unique_dim_passes(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 99)], "id int, k int")
    dim = spark.createDataFrame([(10, "a")], "k int, v string")
    rows = {r["id"]: r["v"] for r in
            dict_get(facts, dim, "k", ["v"],
                     default={"v": "UNK"}, strict=True).collect()}
    assert rows == {1: "a", 2: "UNK"}
    plan = (dict_get(facts, dim, "k", ["v"], strict=True)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
