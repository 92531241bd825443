"""Geo building blocks: WKB point decode (MySQL internal geometry
form, SRID + WKB) and haversine distance, tested against bytes built
independently and a from-scratch reference distance."""

from __future__ import annotations

import math
import struct

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.functions.geo import (
    great_circle_distance, wkb_point)


def _mysql_point(lon: float, lat: float, srid: int = 4326,
                 big_endian: bool = False) -> bytes:
    if big_endian:
        return (struct.pack("<I", srid) + b"\x00"
                + struct.pack(">I", 1) + struct.pack(">dd", lon, lat))
    return (struct.pack("<I", srid) + b"\x01"
            + struct.pack("<I", 1) + struct.pack("<dd", lon, lat))


def _ref_haversine(lon1, lat1, lon2, lat2) -> float:
    rad = math.pi / 180.0
    p1, p2 = lat1 * rad, lat2 * rad
    dphi, dlmb = (lat2 - lat1) * rad / 2, (lon2 - lon1) * rad / 2
    h = (math.sin(dphi) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dlmb) ** 2)
    return 2 * 6371000.0 * math.asin(math.sqrt(h))


def test_wkb_point_decode_and_distance(spark):
    paris = (2.3522, 48.8566)
    london = (-0.1276, 51.5072)
    rows = [(1, _mysql_point(*paris)),
            (2, _mysql_point(*london, big_endian=True)),
            (3, None),
            (4, b"\x00\x01"),                       # malformed
            (5, struct.pack("<I", 0) + b"\x01"
                + struct.pack("<I", 2) + bytes(16))]  # LINESTRING
    df = spark.createDataFrame(rows, "id int, g binary")
    out = {r["id"]: r for r in
           df.select("id", wkb_point("g").alias("p")).collect()}
    assert out[1]["p"]["srid"] == 4326
    assert abs(out[1]["p"]["lon"] - paris[0]) < 1e-12
    assert abs(out[2]["p"]["lat"] - london[1]) < 1e-12
    assert out[3]["p"]["lon"] is None
    assert out[4]["p"]["lon"] is None
    assert out[5]["p"]["lon"] is None               # non-POINT -> NULL

    d = (df.filter("id = 1")
           .select(great_circle_distance(
               F.lit(paris[0]), F.lit(paris[1]),
               F.lit(london[0]), F.lit(london[1])).alias("d"))
           .collect()[0]["d"])
    ref = _ref_haversine(*paris, *london)
    assert abs(d - ref) < 1e-6
    assert 340_000 < d < 348_000                    # ~343.5 km

    # antipodal clamp: never NaN
    d2 = (spark.range(1)
          .select(great_circle_distance(
              F.lit(0.0), F.lit(0.0), F.lit(180.0), F.lit(0.0))
              .alias("d")).collect()[0]["d"])
    assert abs(d2 - math.pi * 6371000.0) < 1.0


def test_point_in_polygon(spark):
    from mysql_syncer_clickhouse_spark.functions.geo import (
        point_in_polygon)

    square = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    # concave "C" shape: notch cut from the right side
    concave = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0),
               (4.0, 6.0), (10.0, 6.0), (10.0, 10.0), (0.0, 10.0)]
    cases = [
        ("sq-in", 5.0, 5.0, square, True),
        ("sq-out", 15.0, 5.0, square, False),
        ("sq-out-neg", -1.0, 5.0, square, False),
        ("cc-in-left", 2.0, 5.0, concave, True),
        ("cc-notch", 7.0, 5.0, concave, False),   # inside the cut
        ("cc-in-low", 7.0, 2.0, concave, True),
    ]
    rows = [(n, x, y, [{"lon": a, "lat": b} for a, b in p])
            for n, x, y, p, _ in cases]
    df = spark.createDataFrame(
        rows, "name string, x double, y double, "
              "poly array<struct<lon double, lat double>>")
    got = {r["name"]: r["inside"] for r in df.select(
        "name", point_in_polygon(F.col("x"), F.col("y"),
                                 F.col("poly")).alias("inside"))
        .collect()}
    assert got == {n: want for n, _, _, _, want in cases}
    # pure Catalyst: no Python UDF / Arrow eval nodes in the plan
    plan = (df.select(point_in_polygon(F.col("x"), F.col("y"),
                                       F.col("poly")))
              ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "Arrow" not in plan


def _ref_geohash(lon: float, lat: float, precision: int) -> str:
    """From-scratch reference: classic bisection encoder."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo = [-180.0, -90.0]
    hi = [180.0, 90.0]
    bits, out, axis = 0, "", 0       # axis 0 = lon first
    acc = 0
    while len(out) < precision:
        mid = (lo[axis] + hi[axis]) / 2
        v = lon if axis == 0 else lat
        if v >= mid:
            acc = acc * 2 + 1
            lo[axis] = mid
        else:
            acc = acc * 2
            hi[axis] = mid
        axis ^= 1
        bits += 1
        if bits == 5:
            out += alphabet[acc]
            acc, bits = 0, 0
    return out


def test_geohash_encode(spark):
    import random

    from mysql_syncer_clickhouse_spark.functions.geo import (
        geohash_encode)

    rng = random.Random(7)
    pts = [(-5.60302734375, 42.60498046875, 5),   # wiki: ezs42
           (0.0, 0.0, 12), (179.9999, 89.9999, 12),
           (-180.0, -90.0, 12)]
    pts += [(rng.uniform(-180, 180), rng.uniform(-90, 90),
             rng.choice([1, 5, 7, 12])) for _ in range(40)]
    for prec in sorted({p for _, _, p in pts}):
        sub = [(lon, lat) for lon, lat, p in pts if p == prec]
        df = spark.createDataFrame(sub, "lon double, lat double")
        got = [r["h"] for r in df.select(
            geohash_encode(F.col("lon"), F.col("lat"), prec)
            .alias("h")).collect()]
        want = [_ref_geohash(lon, lat, prec) for lon, lat in sub]
        assert got == want, (prec, got, want)
    assert _ref_geohash(-5.60302734375, 42.60498046875, 5) == "ezs42"
    # pure Catalyst: no Python/Arrow nodes
    df = spark.createDataFrame([(1.0, 2.0)], "lon double, lat double")
    plan = (df.select(geohash_encode(F.col("lon"), F.col("lat"), 12))
              ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "Arrow" not in plan


def test_geohash_decode_roundtrip(spark):
    import random

    from mysql_syncer_clickhouse_spark.functions.geo import (
        geohash_decode, geohash_encode)

    rng = random.Random(11)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90))
           for _ in range(25)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    # encode at 12, then decode from a MATERIALIZED hash column:
    # composing two statically-unrolled expressions in one plan makes
    # CollapseProject inline the 60-term encode into each of decode's
    # 60 bit terms -- O(n^2) analysis. A materialization boundary
    # keeps both trees small (what a real pipeline has anyway).
    enc = df.select(
        "lon", "lat",
        geohash_encode(F.col("lon"), F.col("lat"), 12).alias("h")
    ).collect()
    df2 = spark.createDataFrame(
        [(r["lon"], r["lat"], r["h"]) for r in enc],
        "lon double, lat double, h string")
    out = df2.select("lon", "lat",
                     geohash_decode(F.col("h")).alias("d")).collect()
    for r in out:
        assert abs(r["d"]["lon"] - r["lon"]) <= 360.0 / 2 ** 30
        assert abs(r["d"]["lat"] - r["lat"]) <= 180.0 / 2 ** 30
    # shorter strings decode at their own length (prefix semantics)
    one = spark.createDataFrame([("ezs42",)], "h string").select(
        geohash_decode(F.col("h")).alias("d")).collect()[0]["d"]
    assert abs(one["lon"] - (-5.60302734375)) < 0.022
    assert abs(one["lat"] - 42.60498046875) < 0.022
    plan = (spark.createDataFrame([("ezs42",)], "h string")
            .select(geohash_decode(F.col("h")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "Arrow" not in plan


def test_geohash_decode_invalid_chars_contribute_zero_bits(spark):
    from mysql_syncer_clickhouse_spark.functions.geo import (
        geohash_decode)

    # 'a' is not geohash base32; it must decode like '0' bits, not a
    # garbage (-1) bit pattern
    got = spark.createDataFrame([("a",), ("0",)], "h string").select(
        "h", geohash_decode(F.col("h")).alias("d")).collect()
    vals = {r["h"]: (r["d"]["lon"], r["d"]["lat"]) for r in got}
    assert vals["a"] == vals["0"]
    assert abs(vals["0"][0] - (-157.5)) < 1e-9   # cell 0 center


# --------------------------------------------------------- pip fuzz

from hypothesis import given, settings, strategies as st  # noqa: E402


def _ref_point_in_polygon(x, y, poly):
    """From-scratch ray casting reference."""
    inside = False
    n = len(poly)
    for i in range(n):
        (x1, y1), (x2, y2) = poly[i], poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xc = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xc:
                inside = not inside
    return inside


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_point_in_polygon_fuzz(spark, data):
    from mysql_syncer_clickhouse_spark.functions.geo import (
        point_in_polygon)

    # random simple star-shaped polygon: sorted angles around origin
    import math as m
    k = data.draw(st.integers(3, 9))
    angs = sorted(data.draw(st.lists(
        st.floats(0, 2 * m.pi - 0.01), min_size=k, max_size=k,
        unique=True)))
    radii = [data.draw(st.floats(1.0, 10.0)) for _ in range(k)]
    poly = [(r * m.cos(a), r * m.sin(a)) for a, r in zip(angs, radii)]
    pts = [(data.draw(st.floats(-12, 12)), data.draw(st.floats(-12, 12)))
           for _ in range(8)]
    rows = [(x, y, [{"lon": a, "lat": b} for a, b in poly])
            for x, y in pts]
    df = spark.createDataFrame(
        rows, "x double, y double, "
              "poly array<struct<lon double, lat double>>")
    got = [r["i"] for r in df.select(point_in_polygon(
        F.col("x"), F.col("y"), F.col("poly")).alias("i")).collect()]
    want = [_ref_point_in_polygon(x, y, poly) for x, y in pts]
    assert got == want
