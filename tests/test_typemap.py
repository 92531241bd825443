"""MySQL -> Spark type mapping (reference README.md:165-266 rules)."""

from pyspark.sql import types as T

from mysql_syncer_clickhouse_spark.functions.typemap import mysql_to_spark_type


def test_int_widths():
    assert mysql_to_spark_type("tinyint(1)") == T.ByteType()
    assert mysql_to_spark_type("tinyint unsigned") == T.ShortType()
    assert mysql_to_spark_type("smallint") == T.ShortType()
    assert mysql_to_spark_type("int(11)") == T.IntegerType()
    assert mysql_to_spark_type("int(10) unsigned") == T.LongType()
    assert mysql_to_spark_type("bigint") == T.LongType()
    # UInt64 -> Decimal(20,0), not a truncating long (SURVEY §1.2 #5)
    assert mysql_to_spark_type("bigint unsigned") == T.DecimalType(20, 0)


def test_temporal():
    assert mysql_to_spark_type("date") == T.DateType()
    assert mysql_to_spark_type("datetime(3)") == T.TimestampType()
    assert mysql_to_spark_type("timestamp(6)") == T.TimestampType()
    assert mysql_to_spark_type("year") == T.ShortType()


def test_decimal_policies():
    assert mysql_to_spark_type("decimal(10,2)") == T.DecimalType(10, 2)
    # Spark handles M<=38 natively...
    assert mysql_to_spark_type("decimal(20,5)") == T.DecimalType(20, 5)
    # ...but mirror mode reproduces the reference's M>18 -> String
    # fallback (README.md:233-258)
    assert mysql_to_spark_type(
        "decimal(20,5)", mirror_decimal_fallback=True) == T.StringType()
    assert mysql_to_spark_type("decimal(40,5)") == T.StringType()


def test_misc():
    assert mysql_to_spark_type("bit(1)") == T.LongType()
    assert mysql_to_spark_type("float") == T.FloatType()
    assert mysql_to_spark_type("double") == T.DoubleType()
    assert mysql_to_spark_type("enum('a','b')") == T.StringType()
    assert mysql_to_spark_type("set('a','b')") == T.StringType()
    assert mysql_to_spark_type("json") == T.StringType()
    assert mysql_to_spark_type("varchar(255)") == T.StringType()
    assert mysql_to_spark_type("sometype") == T.StringType()


def test_typed_array_pseudo_types_round_trip_authority():
    """VERDICT r11 ask #1: 'list(inner)' generalizes the ',list'
    pseudo-type -- every mapped element type round-trips
    Spark array -> mysql pseudo-type -> ClickHouse Array(T), and the
    CH image is NEVER Nullable-wrapped."""
    from mysql_syncer_clickhouse_spark.functions.typemap import (
        mysql_to_clickhouse_type, spark_type_to_mysql)

    cases = [
        (T.ArrayType(T.StringType()), "list", "Array(String)"),
        (T.ArrayType(T.ByteType()), "list(tinyint)", "Array(Int8)"),
        (T.ArrayType(T.ShortType()), "list(smallint)", "Array(Int16)"),
        (T.ArrayType(T.IntegerType()), "list(int)", "Array(Int32)"),
        (T.ArrayType(T.LongType()), "list(bigint)", "Array(Int64)"),
        (T.ArrayType(T.FloatType()), "list(float)", "Array(Float32)"),
        (T.ArrayType(T.DoubleType()), "list(double)", "Array(Float64)"),
        (T.ArrayType(T.DateType()), "list(date)", "Array(Date)"),
        (T.ArrayType(T.ArrayType(T.LongType())), "list(list(bigint))",
         "Array(Array(Int64))"),
    ]
    for spark_t, mysql_t, ch_t in cases:
        assert spark_type_to_mysql(spark_t) == mysql_t
        assert mysql_to_clickhouse_type(mysql_t, True) == ch_t, mysql_t
        assert mysql_to_spark_type(mysql_t) == spark_t


def test_unmapped_array_element_refuses_loudly():
    """An array element type the authority can't map must RAISE with
    the column name -- the old String catch-all encoded arrays through
    bytes(list), silent wire corruption (VERDICT r11 ask #1)."""
    import pytest

    from mysql_syncer_clickhouse_spark.functions.typemap import (
        columns_from_spark_schema, spark_type_to_mysql)
    with pytest.raises(ValueError, match="array element"):
        spark_type_to_mysql(T.ArrayType(T.TimestampType()))
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("weird", T.ArrayType(T.BooleanType()), True)])
    with pytest.raises(ValueError, match="'weird'"):
        columns_from_spark_schema(schema)


def test_map_pseudo_type_round_trip_authority():
    """Round 12: Spark map columns (the sumMap family's output shape)
    round-trip Spark map -> 'map(k,v)' pseudo-type -> ClickHouse
    Map(K, V); the CH image is never Nullable-wrapped, value
    nullability carries as Nullable(V), and composite values stay
    unwrapped (CH forbids Nullable(Array/Map))."""
    from mysql_syncer_clickhouse_spark.functions.typemap import (
        mysql_to_clickhouse_type, spark_type_to_mysql)

    cases = [
        (T.MapType(T.StringType(), T.LongType(), False),
         "map(text,bigint)", "Map(String, Int64)"),
        (T.MapType(T.StringType(), T.LongType(), True),
         "map(text,nullable(bigint))", "Map(String, Nullable(Int64))"),
        (T.MapType(T.LongType(), T.StringType(), False),
         "map(bigint,text)", "Map(Int64, String)"),
        (T.MapType(T.StringType(), T.DoubleType(), True),
         "map(text,nullable(double))", "Map(String, Nullable(Float64))"),
    ]
    for spark_t, mysql_t, ch_t in cases:
        assert spark_type_to_mysql(spark_t) == mysql_t
        assert mysql_to_clickhouse_type(mysql_t, True) == ch_t, mysql_t
        assert mysql_to_spark_type(mysql_t) == spark_t
    # composite values: never Nullable-wrapped even when Spark says
    # valueContainsNull (CH forbids Nullable(Array/Map); a missing
    # nested value is []/{}) -- so this direction drops the
    # valueContainsNull flag BY DESIGN and is checked one-way
    assert spark_type_to_mysql(
        T.MapType(T.StringType(), T.ArrayType(T.LongType()), True)) \
        == "map(text,list(bigint))"
    assert mysql_to_clickhouse_type("map(text,list(bigint))", True) \
        == "Map(String, Array(Int64))"
    assert spark_type_to_mysql(
        T.MapType(T.StringType(),
                  T.MapType(T.StringType(), T.LongType(), False), True)) \
        == "map(text,map(text,bigint))"
    assert mysql_to_clickhouse_type("map(text,map(text,bigint))") \
        == "Map(String, Map(String, Int64))"
    # arrays of maps recurse too
    assert spark_type_to_mysql(
        T.ArrayType(T.MapType(T.StringType(), T.LongType(), False))) \
        == "list(map(text,bigint))"
    assert mysql_to_clickhouse_type("list(map(text,bigint))") \
        == "Array(Map(String, Int64))"


def test_map_key_types_clickhouse_cannot_hold_refuse():
    """ClickHouse Map keys must be string/int/date types: a float or
    decimal key refuses at schema time (naming the column), not on
    the first wire block."""
    import pytest

    from mysql_syncer_clickhouse_spark.functions.typemap import (
        columns_from_spark_schema, mysql_to_clickhouse_type,
        spark_type_to_mysql)
    with pytest.raises(ValueError, match="map key"):
        spark_type_to_mysql(T.MapType(T.DoubleType(), T.LongType()))
    with pytest.raises(ValueError, match="Map key"):
        mysql_to_clickhouse_type("map(double,bigint)")
    with pytest.raises(ValueError, match="Map key"):
        mysql_to_clickhouse_type("map(decimal(9,2),bigint)")
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("badmap",
                      T.MapType(T.FloatType(), T.LongType()), True)])
    with pytest.raises(ValueError, match="'badmap'"):
        columns_from_spark_schema(schema)


def test_tuple_pseudo_type_round_trip_authority():
    """Round 12: Spark struct columns round-trip struct ->
    'tuple(name type,...)' pseudo-type -> named ClickHouse Tuple;
    never Nullable-wrapped, per-field nullability as Nullable(inner),
    nesting recurses."""
    from mysql_syncer_clickhouse_spark.functions.typemap import (
        mysql_to_clickhouse_type, spark_type_to_mysql)

    st = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("n", T.LongType(), True),
        T.StructField("xs", T.ArrayType(T.LongType()), True)])
    mt = "tuple(k text,n nullable(bigint),xs list(bigint))"
    assert spark_type_to_mysql(st) == mt
    assert mysql_to_clickhouse_type(mt, True) == \
        "Tuple(k String, n Nullable(Int64), xs Array(Int64))"
    # return path: scalar nullability round-trips; the COMPOSITE
    # field comes back non-nullable BY DESIGN (CH forbids
    # Nullable(Array); missing -> []), same one-way rule as map
    assert mysql_to_spark_type(mt) == T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("n", T.LongType(), True),
        T.StructField("xs", T.ArrayType(T.LongType()), False)])
    # nesting: array<struct>, struct-in-struct
    assert spark_type_to_mysql(T.ArrayType(T.StructType([
        T.StructField("a", T.IntegerType(), False)]))) \
        == "list(tuple(a int))"
    assert mysql_to_clickhouse_type("list(tuple(a int))") \
        == "Array(Tuple(a Int32))"
    assert mysql_to_clickhouse_type(
        "tuple(inner tuple(x bigint),y text)") \
        == "Tuple(inner Tuple(x Int64), y String)"


def test_tuple_bad_field_names_refuse():
    import pytest

    from mysql_syncer_clickhouse_spark.functions.typemap import (
        mysql_to_clickhouse_type, spark_type_to_mysql)
    with pytest.raises(ValueError, match="identifier"):
        spark_type_to_mysql(T.StructType([
            T.StructField("has space", T.LongType(), False)]))
    with pytest.raises(ValueError, match="identifier"):
        mysql_to_clickhouse_type("tuple(bigint)")


def test_uuid_type_maps_to_clickhouse_uuid():
    """MariaDB 10.7+ native uuid column -> ClickHouse UUID (Nullable
    allowed -- UUID is a scalar); Spark side is the canonical 36-char
    string."""
    from mysql_syncer_clickhouse_spark.functions.typemap import (
        mysql_to_clickhouse_type)
    assert mysql_to_clickhouse_type("uuid") == "UUID"
    assert mysql_to_clickhouse_type("uuid", True) == "Nullable(UUID)"
    assert mysql_to_spark_type("uuid") == T.StringType()
