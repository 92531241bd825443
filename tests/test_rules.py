"""Rule model: routing, column filter, field rename + transforms
(reference river/rule.go, river/sync.go:317-332, etc/river.toml)."""

from __future__ import annotations

import datetime

from mysql_syncer_clickhouse_spark.plans.rules import Rule, RuleSet, load_rules_toml


def _rule(**kw):
    base = dict(source_schema="test", source_table="items",
                sink_schema="olap", sink_table="items_sink")
    base.update(kw)
    return Rule(**base)


def test_routing_key_and_sink():
    r = _rule()
    assert r.key == "test:items"
    assert r.sink == "olap.items_sink"


def test_column_filter_and_rename(spark):
    r = _rule(column_filter=("id", "title"),
              field_mapping={"title": "es_title"})
    df = spark.createDataFrame(
        [(1, "t", "dropme")], "id long, title string, secret string")
    out = r.apply_projection(df)
    assert out.columns == ["id", "es_title"]
    assert out.collect()[0]["es_title"] == "t"


def test_field_transform_suffixes(spark):
    # 'mylist,list' and 'mydate,date' (river/river_test.go:101)
    r = _rule(field_mapping={"mylist": "es_mylist,list",
                             "mydate": "es_mydate,date"})
    df = spark.createDataFrame([("a,b,c", 86400)],
                               "mylist string, mydate long")
    row = r.apply_projection(df).collect()[0]
    assert row["es_mylist"] == ["a", "b", "c"]
    assert row["es_mydate"] == datetime.datetime(1970, 1, 2)


def test_bare_transform_suffix_keeps_name(spark):
    # mapping 'mydate' -> ',date' (transform without rename)
    r = _rule(field_mapping={"mydate": ",date"})
    df = spark.createDataFrame([(0,)], "mydate long")
    row = r.apply_projection(df).collect()[0]
    assert row["mydate"] == datetime.datetime(1970, 1, 1)


def test_wildcard_match():
    # pattern test_river_[0-9]{4} (river/river_test.go:94)
    rs = RuleSet([_rule(source_table=r"test_river_[0-9]{4}")])
    assert rs.match("test", "test_river_0001") is not None
    assert rs.match("test", "test_river_12") is None
    assert rs.match("other", "test_river_0001") is None


def test_load_rules_toml(tmp_path):
    p = tmp_path / "river.toml"
    p.write_text('''
[[rule]]
schema = "test"
table = "items"
sink_schema = "olap"
sink_table = "items_ck"
id = ["id", "title"]
filter = ["id", "title", "mydate"]
  [rule.field]
  title = "es_title"
  mydate = "es_mydate,date"
''')
    rs = load_rules_toml(str(p))
    r = rs.rules[0]
    assert r.pk == ("id", "title")
    assert r.column_filter == ("id", "title", "mydate")
    assert r.field_mapping["title"] == "es_title"
    assert r.sink == "olap.items_ck"
