"""dictGet analog: broadcast lookup semantics + plan shape."""

from __future__ import annotations

import pytest

from mysql_syncer_clickhouse_spark.operators.dictionary import (
    with_dict_attrs)


def test_dict_get_semantics_and_plan(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "id int, nation_id int")
    dim = spark.createDataFrame(
        [(10, "FRANCE", "EU"), (20, "JAPAN", "AS")],
        "n_id int, n_name string, region string")
    out = with_dict_attrs(
        facts, dim, on=("nation_id", "n_id"),
        attrs={"n_name": "nation_name", "region": "region_code"},
        defaults={"nation_name": "UNKNOWN"})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["nation_name"] == "FRANCE"
    assert rows[2]["region_code"] == "AS"
    assert rows[3]["nation_name"] == "UNKNOWN"     # default applies
    assert rows[3]["region_code"] is None          # no default -> NULL
    assert len(rows) == 3                          # no row multiplication

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan             # never a shuffle join


def test_dict_get_duplicate_key_raises(spark):
    facts = spark.createDataFrame([(1, 10)], "id int, k int")
    dim = spark.createDataFrame(
        [(10, "a"), (10, "b")], "k int, v string")
    out = with_dict_attrs(facts, dim, on=("k", "k"),
                          attrs={"v": "val"})
    with pytest.raises(Exception, match="duplicate dictionary key"):
        out.collect()
    # strict=False: known-unique dims skip the check (first wins here)
    ok = with_dict_attrs(facts, dim.limit(1), on=("k", "k"),
                         attrs={"v": "val"}, strict=False)
    assert ok.collect()[0]["val"] == "a"


def test_dict_get_rejects_defaults_for_unknown_attrs(spark):
    facts = spark.createDataFrame([(1, 10)], "id int, k int")
    dim = spark.createDataFrame([(10, "a")], "k int, v string")
    with pytest.raises(ValueError, match="unknown attrs"):
        with_dict_attrs(facts, dim, on=("k", "k"),
                        attrs={"v": "val"}, defaults={"nope": 1})
