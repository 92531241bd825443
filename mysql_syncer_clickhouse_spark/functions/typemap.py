"""MySQL column type -> Spark DataType mapper.

Re-expresses the reference's MySQL -> ClickHouse DDL mapping
(TransferToCkTypeByColumnType, documented at reference README.md:165-266)
onto Spark types (SURVEY.md §1.2):

  u/int8|16|24|32|64 -> widened signed Spark ints (UInt64 -> Decimal(20,0))
  year -> short, bool -> byte, float/double -> float/double
  bit -> long, date -> date
  timestamp(n)/datetime(n) -> timestamp (us precision covers n<=6)
  decimal(M,D) -> Decimal(M,D); the reference's M>18 -> String fallback
  (a driver limitation) is opt-in via mirror_decimal_fallback
  enum/set -> string, json -> string (parse-on-demand), default -> string
  Nullable(T) -> StructField nullability
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_INT = {
    "tinyint": (T.ByteType(), T.ShortType()),
    "smallint": (T.ShortType(), T.IntegerType()),
    "mediumint": (T.IntegerType(), T.IntegerType()),
    "int": (T.IntegerType(), T.LongType()),
    "integer": (T.IntegerType(), T.LongType()),
    "bigint": (T.LongType(), T.DecimalType(20, 0)),
}


def mysql_to_spark_type(mysql_type: str, *,
                        mirror_decimal_fallback: bool = False) -> T.DataType:
    t = mysql_type.strip().lower()
    unsigned = "unsigned" in t
    base = re.split(r"[\s(]", t, 1)[0]

    if base in _INT:
        signed, widened = _INT[base]
        return widened if unsigned else signed
    if base == "year":
        return T.ShortType()
    if base in ("bool", "boolean"):
        return T.ByteType()
    if base == "float":
        return T.FloatType()
    if base in ("double", "real"):
        return T.DoubleType()
    if base == "bit":
        return T.LongType()
    if base == "date":
        return T.DateType()
    if base in ("datetime", "timestamp"):
        return T.TimestampType()
    if base == "time":
        return T.StringType()
    if base in ("decimal", "numeric"):
        m = re.match(r"(?:decimal|numeric)\s*\((\d+)\s*(?:,\s*(\d+))?\)", t)
        prec = int(m.group(1)) if m else 10
        scale = int(m.group(2)) if m and m.group(2) else 0
        if prec > 18 and mirror_decimal_fallback:
            # reference README.md:233-258: the CH driver can't bind
            # Decimal with M>18, so the reference falls back to String
            return T.StringType()
        if prec > 38:
            return T.StringType()
        return T.DecimalType(prec, scale)
    # enum/set decode to strings (transforms.enum_decode/set_decode);
    # char/varchar/*text/json and anything unknown -> string
    # (reference default fallback, README.md:166)
    return T.StringType()


def mysql_column_to_field(name: str, mysql_type: str, nullable: bool = True,
                          **kw) -> T.StructField:
    return T.StructField(name, mysql_to_spark_type(mysql_type, **kw), nullable)
