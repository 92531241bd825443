"""Unit tests for the scalar transform library -- scenarios re-encoded
from the reference's integration suite (river/river_test.go:216-399)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.functions import transforms as X


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_enum_decode(spark):
    labels = ("e1", "e2", "e3")
    df = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (4,), (None,)], "idx int")
    got = [r["l"] for r in
           df.select(X.enum_decode("idx", labels).alias("l"))
             .orderBy(F.col("idx").asc_nulls_last()).collect()]
    # invalid enum -> '' (river/river_test.go:326,351)
    assert got == ["", "e1", "e2", "e3", "", ""]


def test_set_decode(spark):
    labels = ("a", "b", "c")
    df = spark.createDataFrame([(0,), (1,), (3,), (5,), (7,)], "m long")
    got = [r["s"] for r in
           df.select(X.set_decode("m", labels).alias("s"))
             .orderBy("m").collect()]
    assert got == ["", "a", "a,b", "a,c", "a,b,c"]


def test_bit_decode(spark):
    assert _one(spark, X.bit_decode(F.lit("\x01"))) == 1
    assert _one(spark, X.bit_decode(F.lit("\x00"))) == 0
    assert _one(spark, X.bit_decode(F.lit("junk"))) == 0
    assert _one(spark, X.bit_decode(F.lit(5))) == 5   # binlog int path


def test_date_parse_zero_and_invalid(spark):
    # zero date -> NULL (river/river_test.go:374-377)
    assert _one(spark, X.date_parse(F.lit("0000-00-00"))) is None
    assert _one(spark, X.date_parse(F.lit("garbage"))) is None
    assert _one(spark, X.date_parse(F.lit("2024-02-29"))) == \
        datetime.date(2024, 2, 29)


def test_datetime_parse_zero(spark):
    assert _one(spark, X.datetime_parse(F.lit("0000-00-00 00:00:00"))) is None
    got = _one(spark, X.datetime_parse(F.lit("2024-01-02 03:04:05")))
    assert got == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_csv_to_list(spark):
    assert _one(spark, X.csv_to_list(F.lit("a,b,c"))) == ["a", "b", "c"]


def test_unix_to_ts(spark):
    got = _one(spark, X.unix_to_ts(F.lit(86400)))
    assert got == datetime.datetime(1970, 1, 2, 0, 0)


def test_json_get(spark):
    assert _one(spark, X.json_get(F.lit('{"k": 87}'), "$.k")) == "87"


def test_uint64_normalize_no_truncation(spark):
    # uint64 > MaxInt64 survives (the reference's Atoi truncates it,
    # clickhouse/client.go:234-237 -- bug not replicated)
    big = "18446744073709551615"
    got = _one(spark, X.uint64_normalize(F.lit(big)))
    assert str(got) == big


def test_uint32_range_survives(spark):
    # ip = 3748168280 (river/river_test.go:333-334)
    assert _one(spark, X.int_normalize(F.lit(3748168280))) == 3748168280


def test_dict_get_broadcast_lookup(spark):
    """dictGet analog: broadcast dictionary join with per-attribute
    defaults for missing keys; the plan carries no shuffle on the fact
    side (broadcast hash join)."""
    from mysql_syncer_clickhouse_spark.functions.transforms import dict_get
    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "id long, nation_id long")
    dim = spark.createDataFrame(
        [(10, "DE", "EU"), (20, "US", "NA")],
        "nid long, code string, region string")
    out = dict_get(fact, dim, "nation_id", ["code", "region"],
                   default={"code": "??"}, dict_key="nid")
    got = {r["id"]: (r["code"], r["region"]) for r in out.collect()}
    assert got == {1: ("DE", "EU"), 2: ("US", "NA"), 3: ("??", None)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_uniq_up_to(spark):
    from mysql_syncer_clickhouse_spark.functions.transforms import (
        uniq_up_to)
    df = spark.createDataFrame(
        [("a", i % 3) for i in range(30)] + [("b", i) for i in range(30)],
        "g string, v long")
    got = {r["g"]: r["u"] for r in
           df.groupBy("g").agg(uniq_up_to("v", 5).alias("u")).collect()}
    assert got == {"a": 3, "b": 6}   # exact under cap, N+1 over it
