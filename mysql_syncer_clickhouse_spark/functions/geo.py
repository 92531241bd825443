"""Geo functions over synced GEOMETRY columns.

The binlog decoder and the type map pass MySQL GEOMETRY through as
raw bytes: a 4-byte little-endian SRID prefix + standard WKB (what
go-mysql surfaces too, and what the reference lands in ClickHouse as
String). ClickHouse users then query coordinates with its geo
functions (greatCircleDistance & co.); this module provides the same
building blocks Spark-side:

- `wkb_point(col)` decodes the MySQL internal geometry form into a
  (srid, lon, lat) struct. Byte reinterpretation (IEEE-754 doubles at
  arbitrary offsets) has no Catalyst builtin, so this is a vectorized
  pandas_udf -- numpy frombuffer over Arrow batches, never per-row
  Python.
- `great_circle_distance(lon1, lat1, lon2, lat2)` is the haversine
  great-circle distance in meters, pure Catalyst column arithmetic
  (stays inside whole-stage codegen; no UDF). Earth radius 6371.0 km
  (IUGG mean radius); ClickHouse's greatCircleDistance uses its own
  ellipsoid-corrected approximation, which agrees to ~0.1% -- exact
  numeric parity is not a stable target across its versions.

Scale shape: wkb_point is a map-side Arrow batch op (no shuffle); the
distance is plain column math. Both compose with any plan.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                               StructType)

_POINT_STRUCT = StructType([
    StructField("srid", IntegerType()),
    StructField("lon", DoubleType()),
    StructField("lat", DoubleType()),
])

_EARTH_RADIUS_M = 6371000.0


def _col(v) -> Column:
    """Repo convention: a str is a COLUMN NAME (wrap literals in
    F.lit); numbers become literals."""
    if isinstance(v, Column):
        return v
    return F.col(v) if isinstance(v, str) else F.lit(v)


def wkb_point(col) -> Column:
    """MySQL internal geometry bytes -> struct(srid, lon, lat).

    Layout: srid u32 LE, then WKB: byte_order u8 (1 = LE, 0 = BE),
    wkb_type u32, x f64, y f64. Non-POINT types and malformed buffers
    decode to NULL fields (a filterable outcome, not a task failure --
    a synced table can legitimately hold mixed geometry types)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_POINT_STRUCT)
    def decode(vals: pd.Series) -> pd.DataFrame:
        import numpy as np

        srids = np.full(len(vals), np.nan)
        lons = np.full(len(vals), np.nan)
        lats = np.full(len(vals), np.nan)
        for i, b in enumerate(vals):
            if b is None or len(b) < 25:
                continue
            srid = int.from_bytes(b[0:4], "little")
            order = "<" if b[4] == 1 else ">"
            wkb_type = int.from_bytes(b[5:9],
                                      "little" if b[4] == 1 else "big")
            if wkb_type != 1:        # POINT only
                continue
            xy = np.frombuffer(b[9:25], dtype=order + "f8")
            srids[i], lons[i], lats[i] = srid, xy[0], xy[1]
        out = pd.DataFrame({"srid": srids, "lon": lons, "lat": lats})
        out["srid"] = out["srid"].astype("Int32")
        return out

    return decode(col)


def point_in_polygon(lon, lat, poly) -> Column:
    """ClickHouse pointInPolygon analog, pure Catalyst higher-order
    functions (no UDF, stays in codegen): `poly` is an
    array<struct<lon double, lat double>> of vertices (closing edge
    implied). Classic ray casting -- count edges whose latitude span
    crosses the point's latitude and whose crossing longitude lies to
    the right; odd count = inside. Horizontal edges are excluded by
    the span test, so the crossing division never sees a zero
    denominator on a counted edge (and double division yields +/-inf,
    not an ANSI error, regardless)."""
    lon, lat = _col(lon), _col(lat)
    rotated = F.concat(F.slice(poly, 2, F.size(poly) - 1),
                       F.slice(poly, 1, 1))

    def crossing(p1, p2):
        spans = ((p1.getField("lat") > lat)
                 != (p2.getField("lat") > lat))
        x = (p1.getField("lon")
             + (lat - p1.getField("lat"))
             * (p2.getField("lon") - p1.getField("lon"))
             / (p2.getField("lat") - p1.getField("lat")))
        return F.when(spans & (lon < x), F.lit(1)).otherwise(F.lit(0))

    n = F.aggregate(F.zip_with(poly, rotated, crossing), F.lit(0),
                    lambda acc, c: acc + c)
    return n % 2 == F.lit(1)


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon, lat, precision: int = 12) -> Column:
    """ClickHouse geohashEncode analog, pure Catalyst (the bit
    interleave is statically unrolled into column arithmetic -- 5 *
    precision bit terms summed into one long, then base32 chars
    sliced from a literal alphabet; no UDF). precision 1..12 (12 =
    60 bits, the format's full resolution)."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be 1..12")
    lon, lat = _col(lon), _col(lat)
    total = 5 * precision
    bits_lon = (total + 1) // 2     # interleave starts with lon
    bits_lat = total // 2

    def cell(v, lo, span, nbits):
        c = F.floor((v - F.lit(lo)) / F.lit(span)
                    * F.lit(float(1 << nbits))).cast("long")
        return F.least(F.lit((1 << nbits) - 1),
                       F.greatest(F.lit(0), c))

    ilon = cell(lon, -180.0, 360.0, bits_lon)
    ilat = cell(lat, -90.0, 180.0, bits_lat)
    h = F.lit(0).cast("long")
    for k in range(total):
        src, nbits, j = ((ilon, bits_lon, k // 2) if k % 2 == 0
                         else (ilat, bits_lat, k // 2))
        bit = F.shiftrightunsigned(src, nbits - 1 - j) % 2
        h = h + bit * F.lit(1 << (total - 1 - k))
    alphabet = F.array(*[F.lit(ch) for ch in _GEOHASH32])
    chars = [F.element_at(alphabet,
                          (F.shiftrightunsigned(
                              h, 5 * (precision - 1 - c)) % 32 + 1
                           ).cast("int"))
             for c in range(precision)]
    return F.concat(*chars)


def geohash_decode(h, precision: int = 12) -> Column:
    """ClickHouse geohashDecode analog: geohash string -> struct(lon,
    lat) at the CELL CENTER, pure Catalyst (per-char alphabet lookup
    via array_position, bit de-interleave statically unrolled).
    `precision` is the maximum length decoded; shorter strings decode
    at their own length since missing low bits contribute nothing
    beyond their cell's span (standard geohash semantics: we decode
    the longest available prefix up to `precision`)."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be 1..12")
    h = _col(h)
    total_c = F.least(F.lit(precision), F.length(h))
    alphabet = F.array(*[F.lit(ch) for ch in _GEOHASH32])
    total = 5 * precision
    blm = (total + 1) // 2          # max lon bits at this precision
    bltm = total // 2
    # FLAT weighted sums, never accumulation chains (ilon = ilon*2+bit
    # duplicates the whole prior tree per step -- exponential analysis
    # cost); a missing char's bits are 0, handled by the half-cell
    # shift below, so short strings decode at their own length
    ilon = F.lit(0).cast("long")
    ilat = F.lit(0).cast("long")
    for c in range(precision):
        have = F.lit(c) < total_c
        pos = F.array_position(alphabet, F.substring(h, c + 1, 1))
        # invalid geohash chars (a/i/l/o and anything non-base32)
        # give array_position 0; they contribute zero bits instead of
        # the garbage (pos-1 = -1) bit pattern
        val = F.when(have & (pos > 0),
                     (pos - 1).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        for b in range(5):
            k = 5 * c + b
            bit = F.shiftrightunsigned(val, 4 - b) % 2
            if k % 2 == 0:
                ilon = ilon + bit * F.lit(1 << (blm - 1 - k // 2))
            else:
                ilat = ilat + bit * F.lit(1 << (bltm - 1 - k // 2))
    # present bit counts are pure arithmetic on the string length
    tb = F.lit(5) * total_c
    nlon = F.floor((tb + 1) / 2).cast("double")
    nlat = F.floor(tb / 2).cast("double")
    half_lon = F.pow(F.lit(2.0), F.lit(float(blm)) - nlon) * 0.5
    half_lat = F.pow(F.lit(2.0), F.lit(float(bltm)) - nlat) * 0.5
    lon = (F.lit(-180.0) + F.lit(360.0)
           * (ilon.cast("double") + half_lon) / F.lit(float(1 << blm)))
    lat = (F.lit(-90.0) + F.lit(180.0)
           * (ilat.cast("double") + half_lat)
           / F.lit(float(1 << bltm)))
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def great_circle_distance(lon1, lat1, lon2, lat2) -> Column:
    """Haversine distance in meters, pure Catalyst (codegen-friendly):
    2R * asin(sqrt(sin^2(dlat/2) + cos(lat1) cos(lat2) sin^2(dlon/2)))."""
    rad = math.pi / 180.0
    la1, la2 = F.lit(rad) * lat1, F.lit(rad) * lat2
    dlat = (la2 - la1) / 2.0
    dlon = F.lit(rad) * (lon2 - lon1) / 2.0
    h = (F.sin(dlat) * F.sin(dlat)
         + F.cos(la1) * F.cos(la2) * F.sin(dlon) * F.sin(dlon))
    # clamp for float drift at antipodes before asin
    h = F.least(F.lit(1.0), F.greatest(F.lit(0.0), h))
    return F.lit(2.0 * _EARTH_RADIUS_M) * F.asin(F.sqrt(h))
