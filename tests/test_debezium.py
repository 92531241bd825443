"""Debezium-envelope source tests: envelope parsing (op mapping, row
images, binlog-position ordering, schema-ful wrapping, bad lines) and
the e2e drain through StreamingSyncPipeline -- the closest sandbox
analog of the reference's live binlog tail (river/sync.go:72-102)."""

from __future__ import annotations

import json
import os

import pytest

from mysql_syncer_clickhouse_spark.plans.rules import Rule
from mysql_syncer_clickhouse_spark.sources.debezium import (
    parse_debezium, read_debezium_batch, read_debezium_stream)
from mysql_syncer_clickhouse_spark.streaming.pipeline import (
    StreamingSyncPipeline)

ROW_DDL = "id long, title string, mydate long"


def _env(op, row, pos, file="mysql-bin.000001", before=None,
         db="app", table="items", wrap=False):
    payload = {
        "before": before,
        "after": None if op == "d" else row,
        "source": {"db": db, "table": table, "file": file, "pos": pos,
                   "ts_ms": 1700000000000 + pos},
        "op": op, "ts_ms": 1700000000500 + pos,
    }
    if op == "d":
        payload["before"] = row
    return json.dumps({"schema": {"type": "struct"}, "payload": payload}
                      if wrap else payload)


LINES_P1 = [
    _env("c", {"id": 1, "title": "first", "mydate": 86400}, 10),
    _env("c", {"id": 2, "title": "second", "mydate": 86400}, 20),
    _env("u", {"id": 1, "title": "first-edited", "mydate": 86400}, 30),
]
LINES_P2 = [
    _env("d", {"id": 2, "title": None, "mydate": None}, 40),
    # later binlog FILE, smaller pos: seq must still order after p1
    _env("c", {"id": 3, "title": "third", "mydate": 172800}, 5,
         file="mysql-bin.000002"),
    _env("u", {"id": 3, "title": "third-edited", "mydate": 172800}, 9,
         file="mysql-bin.000002", wrap=True),
]


def _write_lines(path, name, lines):
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "dbz"
    os.makedirs(src)
    return str(src), str(tmp_path / "sink"), str(tmp_path / "ckpt")


def test_parse_ops_images_and_order(spark, dirs):
    src, _, _ = dirs
    _write_lines(src, "p1.jsonl", LINES_P1)
    _write_lines(src, "p2.jsonl", LINES_P2)
    out = read_debezium_batch(spark, src, ROW_DDL).orderBy("seq")
    rows = out.collect()
    assert [r["op"] for r in rows] == [
        "insert", "insert", "update", "delete", "insert", "update"]
    # delete carries the BEFORE image
    assert rows[3]["id"] == 2
    # binlog file index dominates pos in the total order
    assert [r["seq"] for r in rows] == sorted(r["seq"] for r in rows)
    assert rows[4]["seq"] > rows[3]["seq"]
    # schema-ful envelope unwraps identically
    assert rows[5]["title"] == "third-edited"
    # source timestamp propagates (ms precision)
    assert rows[0]["ts"].year == 2023


def test_multirow_statement_unique_seq(spark, dirs):
    """A multi-row statement emits several envelopes sharing one
    source.pos; source.row must disambiguate so seq stays UNIQUE
    (upsert's max_by(struct, seq) needs that for determinism)."""
    src, _, _ = dirs
    lines = []
    for i in range(3):
        p = json.loads(_env("c", {"id": 10 + i, "title": f"t{i}",
                                  "mydate": 1}, 100))
        p["source"]["row"] = i
        lines.append(json.dumps(p))
    _write_lines(src, "p.jsonl", lines)
    rows = read_debezium_batch(spark, src, ROW_DDL).orderBy("seq").collect()
    assert len({r["seq"] for r in rows}) == 3
    assert [r["id"] for r in rows] == [10, 11, 12]


def test_parameterized_and_nested_types_in_row_ddl(spark, dirs):
    """decimal(10,2)/array<string> in the row DDL must parse -- the
    field-name extraction is a real DDL parse, not a comma split."""
    src, _, _ = dirs
    ddl = "id long, price decimal(10,2), tags array<string>"
    payload = json.dumps({
        "before": None,
        "after": {"id": 1, "title": None, "price": 3.14, "tags": ["a", "b"]},
        "source": {"db": "app", "table": "items",
                   "file": "mysql-bin.000001", "pos": 7, "ts_ms": 1},
        "op": "c", "ts_ms": 2})
    _write_lines(src, "p.jsonl", [payload])
    rows = read_debezium_batch(spark, src, ddl).collect()
    assert rows[0]["price"] is not None and str(rows[0]["price"]) == "3.14"
    assert list(rows[0]["tags"]) == ["a", "b"]


def test_parse_drops_garbage_lines(spark, dirs):
    src, _, _ = dirs
    _write_lines(src, "p.jsonl",
                 LINES_P1 + ["not json at all", '{"op": "x"}', "{}"])
    out = read_debezium_batch(spark, src, ROW_DDL)
    assert out.count() == len(LINES_P1)


def test_routing_columns(spark, dirs):
    src, _, _ = dirs
    _write_lines(src, "p.jsonl", [
        _env("c", {"id": 1, "title": "a", "mydate": 1}, 1, table="items"),
        _env("c", {"id": 2, "title": "b", "mydate": 2}, 2, table="other"),
    ])
    out = parse_debezium(spark.read.text(src), ROW_DDL, with_routing=True)
    got = {(r["src_db"], r["src_table"]) for r in out.collect()}
    assert got == {("app", "items"), ("app", "other")}


def test_pk_change_moves_row_through_debezium_feed(spark, dirs):
    """A PK-changing UPDATE arrives from Debezium pre-split --
    DELETE(old key), a Kafka tombstone (null payload), CREATE(new key)
    -- and must MOVE the row through the normal apply path
    (river/river_test.go:318-320 analog). The tombstone line must be
    ignored, not crash the parse."""
    src, sink, ckpt = dirs
    lines = [
        _env("c", {"id": 3, "title": "third", "mydate": 1}, 10),
        _env("c", {"id": 4, "title": "fourth", "mydate": 1}, 11),
        # UPDATE id 3 -> 30, as the connector actually publishes it:
        _env("d", {"id": 3, "title": None, "mydate": None}, 20),
        "null",                                  # tombstone for key 3
        _env("c", {"id": 30, "title": "third", "mydate": 1}, 21),
    ]
    _write_lines(src, "p.jsonl", lines)
    rule = Rule(source_schema="app", source_table="items",
                sink_schema="olap", sink_table="items_sink", pk=("id",))
    pipe = StreamingSyncPipeline(rule, ["id"], sink, ckpt)
    q = pipe.start_stream(read_debezium_stream(spark, src, ROW_DDL))
    q.awaitTermination()
    state = {r["id"]: r["title"]
             for r in pipe.current_state(spark).collect()}
    assert state == {4: "fourth", 30: "third"}   # 3 is gone, 30 present


def test_kafka_reader_requires_connector(spark):
    """read_debezium_kafka builds the documented Kafka reader; without
    the spark-sql-kafka package (this sandbox) the source lookup fails
    by name -- proving the code path reaches the real connector."""
    from mysql_syncer_clickhouse_spark.sources.debezium import (
        read_debezium_kafka)
    with pytest.raises(Exception, match="(?i)kafka"):
        read_debezium_kafka(spark, "localhost:9092", "dbz.app.items",
                            ROW_DDL)


def test_stream_e2e_through_pipeline(spark, dirs):
    """Drain Debezium JSON-lines through the SAME apply path as the
    parquet changelog (kill/resume between files included): final
    state must reflect inserts/updates/deletes in binlog order."""
    src, sink, ckpt = dirs
    rule = Rule(source_schema="app", source_table="items",
                sink_schema="olap", sink_table="items_sink",
                pk=("id",), field_mapping={"title": "es_title"})
    _write_lines(src, "p1.jsonl", LINES_P1)
    pipe = StreamingSyncPipeline(rule, ["id"], sink, ckpt)
    q = pipe.start_stream(read_debezium_stream(spark, src, ROW_DDL))
    q.awaitTermination()
    state = {r["id"]: r["es_title"]
             for r in pipe.current_state(spark).collect()}
    assert state == {1: "first-edited", 2: "second"}

    _write_lines(src, "p2.jsonl", LINES_P2)   # resume on same checkpoint
    pipe2 = StreamingSyncPipeline(rule, ["id"], sink, ckpt)
    q2 = pipe2.start_stream(read_debezium_stream(spark, src, ROW_DDL))
    q2.awaitTermination()
    state = {r["id"]: r["es_title"]
             for r in pipe2.current_state(spark).collect()}
    assert state == {1: "first-edited", 3: "third-edited"}
    # each envelope applied exactly once
    sink_df = spark.read.parquet(sink)
    assert sink_df.count() == 6
    assert sink_df.select("seq").distinct().count() == 6


def test_with_before_pairs_update_images(spark):
    """with_before=True: updates carry the paired old row image as
    before_<col>; inserts and deletes carry NULLs (a delete's before
    IS its row image, not a pair)."""
    lines = [
        _env("c", {"id": 1, "title": "new", "mydate": 1}, 10),
        _env("u", {"id": 1, "title": "edited", "mydate": 2}, 20,
             before={"id": 1, "title": "new", "mydate": 1}),
        _env("d", {"id": 1, "title": None, "mydate": None}, 30),
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = {r["op"]: r for r in
           parse_debezium(df, ROW_DDL, with_before=True).collect()}
    assert out["update"]["before_title"] == "new"
    assert out["update"]["before_mydate"] == 1
    assert out["update"]["title"] == "edited"
    assert out["insert"]["before_title"] is None
    assert out["delete"]["before_title"] is None
    # default stays image-only: no before_* columns
    cols = parse_debezium(df, ROW_DDL).columns
    assert not [c for c in cols if c.startswith("before_")]


def test_parse_debezium_schema_change_feeds_ddl_chain(spark):
    """The schema-change topic parses to (seq, ts, db, table, query)
    and the query text drives the SAME parse -> map -> ClickHouse
    chain as the binlog path; housekeeping messages (no ddl) drop."""
    import json

    from mysql_syncer_clickhouse_spark.plans.rules import Rule
    from mysql_syncer_clickhouse_spark.sources import ddl as ddlmod
    from mysql_syncer_clickhouse_spark.sources.debezium import (
        parse_debezium_schema_change)

    msgs = [
        {"databaseName": "shop",
         "ddl": "ALTER TABLE items ADD COLUMN price decimal(10,2) "
                "NOT NULL AFTER title",
         "source": {"file": "mysql-bin.000007", "pos": 900,
                    "ts_ms": 1700000000000, "table": "items"}},
        {"databaseName": "shop", "ddl": "",
         "source": {"file": "mysql-bin.000007", "pos": 950,
                    "ts_ms": 1700000001000, "table": "items"}},
        {"databaseName": "shop",
         "ddl": "DROP TABLE shop.old_stuff",
         "source": {"file": "mysql-bin.000008", "pos": 4,
                    "ts_ms": 1700000002000, "table": "old_stuff"}},
    ]
    lines = spark.createDataFrame(
        [(json.dumps(m),) for m in msgs], "value string")
    rows = (parse_debezium_schema_change(lines)
            .orderBy("seq").collect())
    assert [r["query"].split()[0] for r in rows] == ["ALTER", "DROP"]
    assert rows[0]["seq"] < rows[1]["seq"]     # binlog total order
    assert rows[0]["db"] == "shop" and rows[0]["table"] == "items"
    assert rows[0]["ts"].year == 2023

    rule = Rule(source_schema="shop", source_table="items",
                sink_schema="olap", sink_table="items_sink",
                pk=("id",), field_mapping={"title": "es_title"})
    acts = ddlmod.parse_mysql_ddl(rows[0]["query"],
                                  default_schema=rows[0]["db"])
    mapped = ddlmod.map_action(acts[0], rule)
    assert ddlmod.clickhouse_ddl(
        mapped, database="olap", table="items_sink") == [
        "ALTER TABLE `olap`.`items_sink` ADD COLUMN IF NOT EXISTS "
        "`price` Decimal(10,2) AFTER `es_title`"]


def test_parse_plans_contain_exactly_one_from_json(spark):
    """Plan-shape regression guard (r15 ADVICE): the single-parse
    guarantee of parse_debezium / parse_debezium_schema_change rests on
    the staged-project + spark_partition_id barrier, which in turn
    relies on Catalyst behavior (CollapseProject's non-cheap-alias rule
    and PushDownPredicates' determinism check). A Spark upgrade could
    quietly restore the 8x-per-row parse with no functional failure --
    assert the optimized plan carries exactly ONE JsonToStructs."""
    import json

    from mysql_syncer_clickhouse_spark.sources.debezium import (
        parse_debezium, parse_debezium_schema_change)

    rows_df = parse_debezium(
        spark.createDataFrame([(l,) for l in LINES_P1], "value string"),
        ROW_DDL)
    ddl_df = parse_debezium_schema_change(spark.createDataFrame(
        [(json.dumps({"databaseName": "shop", "ddl": "DROP TABLE t",
                      "source": {"file": "mysql-bin.000007", "pos": 9,
                                 "ts_ms": 1700000000000,
                                 "table": "t"}}),)], "value string"))
    for df in (rows_df, ddl_df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("from_json(") == 1, plan
