"""ClickHouse URL / IPv4 analogs vs hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.functions import web as W


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_url_functions(spark):
    u = "https://news.clickhouse.com.tr:8123/docs/ru/?q=1&user=bob#top"
    assert _one(spark, W.domain(u)) == "news.clickhouse.com.tr"
    assert _one(spark, W.url_path(u)) == "/docs/ru/"
    assert _one(spark, W.query_string(u)) == "q=1&user=bob"
    assert _one(spark, W.extract_url_parameter(u, "user")) == "bob"
    assert _one(spark, W.extract_url_parameter(u, "nope")) is None
    assert _one(spark, W.cut_query_string(u)) == \
        "https://news.clickhouse.com.tr:8123/docs/ru/"
    assert _one(spark, W.top_level_domain(u)) == "tr"
    assert _one(spark, W.first_significant_subdomain(u)) == "clickhouse"
    assert _one(spark, W.first_significant_subdomain(
        "https://www.example.com/x")) == "example"
    assert _one(spark, W.first_significant_subdomain(
        "http://blog.example.co.uk/")) == "example"


def test_ipv4_functions(spark):
    assert _one(spark, W.ipv4_string_to_num("1.2.3.4")) == \
        (1 << 24) + (2 << 16) + (3 << 8) + 4
    assert _one(spark, W.ipv4_string_to_num("255.255.255.255")) == \
        (1 << 32) - 1
    assert _one(spark, W.ipv4_string_to_num("256.1.1.1")) is None
    assert _one(spark, W.ipv4_string_to_num("a.b.c.d")) is None
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
        got = _one(spark, W.is_ip_address_in_range(ip, cidr))
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
