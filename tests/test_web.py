"""ClickHouse URL / IPv4 analogs vs hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.functions import web as W


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_url_functions(spark):
    u = "https://news.clickhouse.com.tr:8123/docs/ru/?q=1&user=bob#top"
    assert _one(spark, W.domain(F.lit(u))) == "news.clickhouse.com.tr"
    assert _one(spark, W.url_path(F.lit(u))) == "/docs/ru/"
    assert _one(spark, W.query_string(F.lit(u))) == "q=1&user=bob"
    assert _one(spark, W.extract_url_parameter(F.lit(u), "user")) == "bob"
    assert _one(spark, W.extract_url_parameter(F.lit(u), "nope")) is None
    assert _one(spark, W.cut_query_string(F.lit(u))) == \
        "https://news.clickhouse.com.tr:8123/docs/ru/"
    assert _one(spark, W.top_level_domain(F.lit(u))) == "tr"
    assert _one(spark, W.first_significant_subdomain(F.lit(u))) == "clickhouse"
    assert _one(spark, W.first_significant_subdomain(
        F.lit("https://www.example.com/x"))) == "example"
    assert _one(spark, W.first_significant_subdomain(
        F.lit("http://blog.example.co.uk/"))) == "example"


def test_ipv4_functions(spark):
    assert _one(spark, W.ipv4_string_to_num(F.lit("1.2.3.4"))) == \
        (1 << 24) + (2 << 16) + (3 << 8) + 4
    assert _one(spark, W.ipv4_string_to_num(F.lit("255.255.255.255"))) == \
        (1 << 32) - 1
    assert _one(spark, W.ipv4_string_to_num(F.lit("256.1.1.1"))) is None
    assert _one(spark, W.ipv4_string_to_num(F.lit("a.b.c.d"))) is None
    assert _one(spark, W.ipv4_num_to_string(
        (10 << 24) + (0 << 16) + (1 << 8) + 77)) == "10.0.1.77"
    # round-trip
    n = (192 << 24) + (168 << 16) + (5 << 8) + 9
    assert _one(spark, W.ipv4_string_to_num(
        W.ipv4_num_to_string(n))) == n

    cases = [("192.168.5.9", "192.168.0.0/16", True),
             ("192.169.5.9", "192.168.0.0/16", False),
             ("10.1.2.3", "0.0.0.0/0", True),
             ("10.1.2.3", "10.1.2.3/32", True),
             ("10.1.2.4", "10.1.2.3/32", False),
             ("bad", "10.0.0.0/8", None)]
    for ip, cidr, want in cases:
        got = _one(spark, W.is_ip_address_in_range(F.lit(ip), F.lit(cidr)))
        assert got == want, (ip, cidr, got, want)


def test_web_functions_pure_catalyst(spark):
    df = spark.createDataFrame([("http://a.com/x?y=1", "1.2.3.4")],
                               "u string, ip string")
    plan = (df.select(W.first_significant_subdomain(F.col("u")),
                      W.is_ip_address_in_range(
                          F.col("ip"), F.lit("1.2.0.0/16")))
              ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "Arrow" not in plan


# ------------------------------------------------------------- fuzz

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(0, (1 << 32) - 1), min_size=1,
                max_size=50))
def test_ipv4_roundtrip_fuzz(spark, nums):
    df = spark.createDataFrame([(n,) for n in nums], "n long")
    got = [r["m"] for r in df.select(
        W.ipv4_string_to_num(W.ipv4_num_to_string(F.col("n")))
        .alias("m")).collect()]
    assert got == nums


def test_column_name_convention_and_dotless_hosts(spark):
    """str args are COLUMN NAMES (the repo-wide _c convention) and a
    dotless host is its own significant label -- negative element_at
    would THROW under ANSI mode here."""
    df = spark.createDataFrame(
        [("http://localhost/x", "1.2.3.4")], "u string, ip string")
    r = df.select(
        W.domain("u").alias("d"),
        W.first_significant_subdomain("u").alias("f"),
        W.top_level_domain("u").alias("t"),
        W.ipv4_string_to_num("ip").alias("n")).collect()[0]
    assert r["d"] == "localhost" and r["f"] == "localhost"
    assert r["t"] == "localhost"
    assert r["n"] == (1 << 24) + (2 << 16) + (3 << 8) + 4
