"""ClickHouse URL / IPv4 function analogs, pure Catalyst.

ClickHouse's bread-and-butter web-analytics functions (URL family,
IPv4 conversions) re-expressed over Spark's builtins -- parse_url,
regexp, and integer arithmetic; no UDFs anywhere, every function
stays inside whole-stage codegen. Naming follows the ClickHouse
function it mirrors (documented per function).

Semantics notes where ClickHouse is quirky:
- `domain` returns the hostname (no port), empty-string inputs give
  NULL (Spark's parse_url contract) rather than ''.
- `first_significant_subdomain` implements ClickHouse's documented
  heuristic: the label before the top-level domain, except when that
  label is one of {com, net, org, co, edu, gov} -- a second-level
  public suffix as in 'example.com.tr' -- in which case one more
  label up. (ClickHouse ships a compiled public-suffix list; this is
  its documented default behavior for the common cases.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SECOND_LEVEL = ("com", "net", "org", "co", "edu", "gov")


def _col(v) -> Column:
    """Repo convention (functions/transforms.py): a str is a COLUMN
    NAME; wrap literals in F.lit() explicitly."""
    if isinstance(v, Column):
        return v
    return F.col(v) if isinstance(v, str) else F.lit(v)


# ------------------------------------------------------------- URL

def domain(url) -> Column:
    """ClickHouse domain(): hostname without port."""
    return F.parse_url(_col(url), F.lit("HOST"))


def url_path(url) -> Column:
    """ClickHouse path(): the path without query string."""
    return F.parse_url(_col(url), F.lit("PATH"))


def query_string(url) -> Column:
    """ClickHouse queryString(): everything after '?' (without it)."""
    return F.parse_url(_col(url), F.lit("QUERY"))


def extract_url_parameter(url, name) -> Column:
    """ClickHouse extractURLParameter(url, name). `name` is a literal
    parameter name (pass a Column to look it up per row)."""
    name = name if isinstance(name, Column) else F.lit(name)
    return F.parse_url(_col(url), F.lit("QUERY"), name)


def cut_query_string(url) -> Column:
    """ClickHouse cutQueryString(): URL without '?query' and
    '#fragment'."""
    return F.regexp_replace(_col(url), r"[?#].*$", "")


def top_level_domain(url) -> Column:
    """ClickHouse topLevelDomain(): the last dot-label of the host."""
    host = domain(url)
    return F.element_at(F.split(host, r"\."), -1)


def first_significant_subdomain(url) -> Column:
    """ClickHouse firstSignificantSubdomain():
    news.clickhouse.com.tr -> clickhouse; www.example.com -> example;
    a dotless host is its own significant label. F.get (0-based,
    out-of-bounds -> NULL) instead of negative element_at, which
    THROWS under ANSI mode on short arrays."""
    labels = F.split(domain(url), r"\.")
    n = F.size(labels)
    second = F.get(labels, n - 2)
    third = F.get(labels, n - 3)
    return F.when(
        (n >= F.lit(3)) & second.isin(*_SECOND_LEVEL), third
    ).otherwise(F.coalesce(second, F.get(labels, n - 1)))


# ------------------------------------------------------------ IPv4

def ipv4_string_to_num(ip) -> Column:
    """ClickHouse IPv4StringToNum(): dotted quad -> UInt32 (as long;
    malformed inputs -> NULL, the try-variant's behavior)."""
    ip = _col(ip)
    parts = F.split(ip, r"\.")
    ok = (F.size(parts) == 4) & ip.rlike(
        r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")

    def octet(i):
        return F.element_at(parts, i).cast("long")

    valid = ok
    for i in range(1, 5):
        valid = valid & (octet(i) <= 255)
    num = (octet(1) * F.lit(1 << 24) + octet(2) * F.lit(1 << 16)
           + octet(3) * F.lit(1 << 8) + octet(4))
    return F.when(valid, num)


def ipv4_num_to_string(num) -> Column:
    """ClickHouse IPv4NumToString(): UInt32 -> dotted quad. Inputs
    outside [0, 2^32) are masked to 32 bits (the UInt32 reinterpret a
    ClickHouse cast would apply)."""
    num = F.pmod(_col(num).cast("long"), F.lit(1 << 32))
    return F.concat_ws(
        ".",
        (F.shiftrightunsigned(num, 24) % 256).cast("string"),
        (F.shiftrightunsigned(num, 16) % 256).cast("string"),
        (F.shiftrightunsigned(num, 8) % 256).cast("string"),
        (num % 256).cast("string"))


def is_ip_address_in_range(ip, cidr) -> Column:
    """ClickHouse isIPAddressInRange(ip, 'a.b.c.d/p') for IPv4:
    prefix compare after shifting both sides by (32 - p). /0 matches
    everything; malformed ip or cidr -> NULL."""
    cidr = _col(cidr)
    base = ipv4_string_to_num(F.element_at(F.split(cidr, "/"), 1))
    plen = F.element_at(F.split(cidr, "/"), 2).cast("int")
    num = ipv4_string_to_num(ip)
    # shiftrightunsigned takes only a literal shift; a dynamic prefix
    # length uses exact power-of-two division instead (2^k is exact
    # in double through 2^32, and the floor of v/2^k IS v >> k for
    # non-negative v)
    scale = F.pow(F.lit(2.0), (F.lit(32) - plen).cast("double"))
    ok_p = (plen >= 0) & (plen <= 32)
    return F.when(
        ok_p & base.isNotNull() & num.isNotNull(),
        F.when(plen == 0, F.lit(True)).otherwise(
            F.floor(num.cast("double") / scale)
            == F.floor(base.cast("double") / scale)))
