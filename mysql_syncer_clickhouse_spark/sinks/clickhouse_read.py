"""Distributed ClickHouse read-back over the public HTTP interface.

The write half (sinks/clickhouse.py) posts JSONEachRow from the
executors; this is the symmetric read: N Spark tasks each SELECT one
hash-slice of the table (`WHERE <split_expr> = i FORMAT JSONEachRow`)
so the fetch parallelizes across the cluster and nothing funnels
through the driver.  Primary consumer is the sync-consistency checker
(operators/syncverify.py) reading the sink back for Spark-mode
verification and for row-level drill-down of mismatched buckets; it
is also a general escape hatch for "get my synced table back into a
DataFrame".

Scale shape: ClickHouse evaluates the split predicate data-resident
(each task's query is a full-table scan server-side UNLESS the split
expression matches the table's ORDER BY prefix -- for the checker's
drill-down we instead push a bucket IN-list predicate, which is one
scan total). For bulk read-back of a large table, prefer more
partitions with `LIMIT/OFFSET`-free hash slicing (this module) over a
single-stream dump: the server parallelizes each slice internally and
the client side scales with executors.

JSON type notes (public HTTP semantics): 64-bit integers arrive
quoted by default (output_format_json_quote_64bit_integers=1) -- the
coercers accept both; DateTime renders in SERVER timezone, so
timestamp columns compare correctly only when source and checker
agree on zone (the pushdown digest mode avoids this entirely by
hashing epoch numbers); Nullable NULL arrives as JSON null.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _get(url: str, query: str, user: str | None,
         password: str | None, timeout: int) -> bytes:
    q = urllib.parse.urlencode({"query": query})
    req = urllib.request.Request(f"{url}/?{q}", method="POST")
    if user:
        req.add_header("X-ClickHouse-User", user)
    if password:
        req.add_header("X-ClickHouse-Key", password)
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def _coercer(dt: T.DataType):
    """JSON value -> Spark-compatible Python value for one field.
    Arrays and maps recurse (JSONEachRow round-trips them as JSON
    lists/objects).  Binary columns arrive as HEX: JSON cannot carry
    arbitrary bytes, so the read-back SELECT renders them `hex(col)`
    (the same injective engine-neutral encoding the digest canonical
    uses) and the coercer decodes -- which is what lets --deep drill
    into binary columns over HTTP, not just native (VERDICT r14
    #3)."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType,
                       T.ByteType)):
        return lambda v: None if v is None else int(v)
    if isinstance(dt, T.DecimalType):
        return lambda v: None if v is None else Decimal(str(v))
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return lambda v: None if v is None else float(v)
    if isinstance(dt, T.BooleanType):
        return lambda v: None if v is None else bool(v)
    if isinstance(dt, T.DateType):
        return lambda v: None if v is None else date.fromisoformat(v)
    if isinstance(dt, T.TimestampType):
        return (lambda v: None if v is None
                else datetime.fromisoformat(v))
    if isinstance(dt, T.StringType):
        return lambda v: None if v is None else str(v)
    if isinstance(dt, T.ArrayType):
        elem = _coercer(dt.elementType)
        return (lambda v: None if v is None
                else [elem(x) for x in v])
    if isinstance(dt, T.MapType):
        key = _coercer(dt.keyType)
        val = _coercer(dt.valueType)
        return (lambda v: None if v is None
                else {key(k): val(x) for k, x in v.items()})
    if isinstance(dt, T.BinaryType):
        return (lambda v: None if v is None
                else bytearray(bytes.fromhex(v)))
    raise ValueError(
        f"read_clickhouse_http: unsupported read-back type {dt}")


def hash_split_sql(pk_cols: list[str], n: int) -> str:
    """A split expression distributing rows across `n` fetch tasks by
    primary-key hash -- stable under concurrent inserts to OTHER keys,
    unlike OFFSET pagination."""
    parts = ", ".join(f"toString(`{c}`)" for c in pk_cols)
    inner = parts if len(pk_cols) == 1 else f"concat({parts})"
    return f"cityHash64({inner}) % {n}"


def read_clickhouse_http(spark: SparkSession, url: str, database: str,
                         table: str, schema: T.StructType,
                         split_expr: str, n_splits: int = 32, *,
                         user: str | None = None,
                         password: str | None = None,
                         where: str | None = None,
                         final: bool = False,
                         split_values: list[int] | None = None,
                         timeout: int = 120) -> DataFrame:
    """Read `database`.`table` back as a DataFrame with `schema`.

    One Spark task per split value in [0, n_splits); each posts
    `SELECT <cols> FROM t [FINAL] WHERE <split_expr> = i [AND where]
    FORMAT JSONEachRow` and parses its own slice -- executor-side,
    driver never sees a row.  `split_values` restricts the fetch to
    specific split ids (the checker's drill-down reads ONLY the
    mismatched buckets)."""
    import pandas as pd

    cols = ", ".join(
        f"hex(`{f.name}`) AS `{f.name}`"
        if isinstance(f.dataType, T.BinaryType) else f"`{f.name}`"
        for f in schema.fields)
    fin = " FINAL" if final else ""
    extra = f" AND ({where})" if where else ""
    names = [f.name for f in schema.fields]
    coercers = {f.name: _coercer(f.dataType) for f in schema.fields}

    def fetch(batches):
        for pdf in batches:
            for i in pdf["id"]:
                sql = (f"SELECT {cols} FROM `{database}`.`{table}`"
                       f"{fin} WHERE ({split_expr}) = {int(i)}{extra} "
                       "FORMAT JSONEachRow")
                body = _get(url, sql, user, password, timeout)
                rows = [json.loads(line)
                        for line in body.decode().splitlines()
                        if line.strip()]
                data = {
                    n: [coercers[n](r.get(n)) for r in rows]
                    for n in names}
                yield pd.DataFrame(data, columns=names, dtype=object)

    if split_values is not None:
        vals = [int(v) for v in split_values]
        ids = spark.createDataFrame(
            [(v,) for v in vals], "id long").repartition(
                max(1, len(vals)))
    else:
        ids = spark.range(n_splits).repartition(n_splits).toDF("id")
    return ids.mapInPandas(fetch, schema=schema)


# ------------------------------------------------- native read-back


def _native_coercer(dt: T.DataType):
    """Decoded native value -> Spark-compatible Python value. The
    native decoders already return typed values (int/float/Decimal/
    date/datetime); the work here is the byte-transparent String:
    utf-8 text for StringType, raw bytes for BinaryType (the HTTP
    twin gets the same bytes via hex(col) + decode)."""
    if isinstance(dt, T.StringType):
        return (lambda v: None if v is None else
                (v.decode("utf-8", errors="replace")
                 if isinstance(v, (bytes, bytearray)) else str(v)))
    if isinstance(dt, T.BinaryType):
        return (lambda v: None if v is None else
                (bytearray(v) if isinstance(v, (bytes, bytearray))
                 else bytearray(str(v), "utf-8")))
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType,
                       T.ByteType)):
        return lambda v: None if v is None else int(v)
    if isinstance(dt, T.DecimalType):
        return (lambda v: None if v is None else
                (v if isinstance(v, Decimal) else Decimal(str(v))))
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return lambda v: None if v is None else float(v)
    if isinstance(dt, T.BooleanType):
        return lambda v: None if v is None else bool(v)
    if isinstance(dt, (T.DateType, T.TimestampType,
                       T.TimestampNTZType)):
        return lambda v: v
    if isinstance(dt, T.ArrayType):
        elem = _native_coercer(dt.elementType)
        return (lambda v: None if v is None
                else [elem(x) for x in v])
    if isinstance(dt, T.MapType):
        key = _native_coercer(dt.keyType)
        val = _native_coercer(dt.valueType)
        return (lambda v: None if v is None
                else {key(k): val(x) for k, x in v.items()})
    raise ValueError(
        f"read_clickhouse_native: unsupported read-back type {dt}")


def read_clickhouse_native(spark: SparkSession, host: str, port: int,
                           database: str, table: str,
                           schema: T.StructType,
                           split_expr: str, n_splits: int = 32, *,
                           user: str = "default", password: str = "",
                           where: str | None = None,
                           final: bool = False,
                           split_values: list[int] | None = None,
                           secure: bool = False,
                           ca_file: str | None = None,
                           tls_insecure: bool = False,
                           compression: "bool | str" = True
                           ) -> DataFrame:
    """`read_clickhouse_http`'s twin over the NATIVE protocol: one
    Spark task per split value, each opening its own NativeConnection
    and decoding its slice's Data blocks executor-side -- the driver
    never sees a row, and binary columns round-trip (native String is
    byte-transparent, unlike JSONEachRow)."""
    import pandas as pd

    cols = ", ".join(f"`{f.name}`" for f in schema.fields)
    fin = " FINAL" if final else ""
    extra = f" AND ({where})" if where else ""
    names = [f.name for f in schema.fields]
    coercers = {f.name: _native_coercer(f.dataType)
                for f in schema.fields}

    def fetch(batches):
        from .clickhouse_native import (NativeConnection,
                                        build_tls_context)
        ctx = (build_tls_context(ca_file, tls_insecure)
               if (secure or ca_file) else None)
        conn = NativeConnection(
            host, port, database=database, user=user,
            password=password, compression=compression,
            ssl_context=ctx)
        try:
            for pdf in batches:
                for i in pdf["id"]:
                    sql = (f"SELECT {cols} FROM "
                           f"`{database}`.`{table}`{fin} "
                           f"WHERE ({split_expr}) = {int(i)}{extra}")
                    _, rows = conn.select_rows(sql)
                    data = {
                        n: [coercers[n](r[j]) for r in rows]
                        for j, n in enumerate(names)}
                    yield pd.DataFrame(data, columns=names,
                                       dtype=object)
        finally:
            conn.close()

    if split_values is not None:
        vals = [int(v) for v in split_values]
        ids = spark.createDataFrame(
            [(v,) for v in vals], "id long").repartition(
                max(1, len(vals)))
    else:
        ids = spark.range(n_splits).repartition(n_splits).toDF("id")
    return ids.mapInPandas(fetch, schema=schema)
