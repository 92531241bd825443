"""/stat observability endpoint (river/status.go:49-68 analog) and
ClickHouse auto-CREATE DDL emission (reference README.md:141-266)."""

from __future__ import annotations

import json
import urllib.request

from mysql_syncer_clickhouse_spark.functions.typemap import (
    clickhouse_create_table_ddl, mysql_to_clickhouse_type)
from mysql_syncer_clickhouse_spark.streaming.pipeline import SyncMetrics
from mysql_syncer_clickhouse_spark.streaming.status import StatusServer


def test_stat_endpoint_serves_counters():
    m = SyncMetrics()
    m.record_counts({"insert": 5, "update": 2, "delete": 0})
    m.record_counts({"insert": 1})
    srv = StatusServer(m, port=0, extra={"position": "mysql-bin.000002:9"})
    srv.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/stat", timeout=5) as r:
            assert r.status == 200
            body = json.loads(r.read())
        assert body["counts"] == {"insert": 6, "update": 2}
        assert body["position"] == "mysql-bin.000002:9"
        # unknown path -> 404
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/nope", timeout=5)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_clickhouse_type_mapping():
    cases = {
        "int unsigned": "UInt32",
        "bigint": "Int64",
        "bigint unsigned": "UInt64",
        "tinyint": "Int8",
        "year": "Int16",
        "bit(1)": "Int64",
        "float": "Float32",
        "double": "Float64",
        "date": "Date",
        "datetime": "DateTime",
        "datetime(3)": "DateTime64(3)",
        "timestamp(6)": "DateTime64(6)",
        "decimal(12,4)": "Decimal(12,4)",
        # reference README.md:233-258: its driver binds at most
        # Decimal64, so M>18 falls back to String
        "decimal(20,4)": "String",
        # bare decimal is MySQL's decimal(10,0)
        "decimal": "Decimal(10,0)",
        "varchar(255)": "String",
        "json": "String",
        "enum('a','b')": "String",
    }
    for mysql, ch in cases.items():
        assert mysql_to_clickhouse_type(mysql) == ch, mysql
    assert mysql_to_clickhouse_type("int", nullable=True) == "Nullable(Int32)"


def test_create_table_ddl_orders_by_pk_and_wraps_nullable():
    ddl = clickhouse_create_table_ddl(
        "olap", "items_sink",
        columns=[("id", "bigint", True),         # PK: forced non-Nullable
                 ("title", "varchar(64)", True),
                 ("qty", "int unsigned", False)],
        pk=("id",))
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS `olap`.`items_sink` "
        "(`id` Int64, `title` Nullable(String), `qty` UInt32) "
        "ENGINE = ReplacingMergeTree ORDER BY (`id`)")


def test_create_table_ddl_empty_pk_spells_tuple():
    """ClickHouse rejects `ORDER BY ()`; the empty sort key is spelled
    `ORDER BY tuple()`."""
    ddl = clickhouse_create_table_ddl(
        "olap", "log", columns=[("msg", "text", True)], pk=())
    assert ddl.endswith("ENGINE = ReplacingMergeTree ORDER BY tuple()")
