"""Property-based checks of the scalar transform library against
plain-Python models (hypothesis generates the inputs; one Spark job
evaluates the whole batch). The reference's behavior being modeled:
ENUM decode river/sync.go:244-256, SET decode :257-269, date parse
:303-311, csv list :431-438, unix->ts :439-448.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.functions import transforms as X
from mysql_syncer_clickhouse_spark.operators.multimodal import (
    make_bmp_header, make_png_header, parse_image_header)

LABELS = ("red", "green", "blue")


def _eval(spark, values, make_col, in_type="long"):
    """Evaluate `make_col` over one column of literals in a single job."""
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["out"] for r in
            df.select(make_col(F.col("v")).alias("out")).collect()]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-5, 10), min_size=1, max_size=50))
def test_enum_decode_model(spark, idxs):
    got = _eval(spark, idxs, lambda c: X.enum_decode(c, LABELS))
    want = [LABELS[i - 1] if 1 <= i <= len(LABELS) else "" for i in idxs]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 2 ** 6), min_size=1, max_size=50))
def test_set_decode_model(spark, masks):
    got = _eval(spark, masks, lambda c: X.set_decode(c, LABELS))
    want = [",".join(l for b, l in enumerate(LABELS) if m >> b & 1)
            for m in masks]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.one_of(
        st.dates(datetime.date(1, 1, 1), datetime.date(9999, 12, 31))
          .map(lambda d: d.isoformat()),
        st.just("0000-00-00"),
        st.text("abc-0", min_size=1, max_size=12)),
    min_size=1, max_size=50))
def test_date_parse_valid_or_null_never_throws(spark, raws):
    got = _eval(spark, raws, X.date_parse, "string")
    for raw, out in zip(raws, got):
        try:
            want = datetime.date.fromisoformat(raw)
            # only zero/invalid dates may map to NULL
            assert out == want or (out is None and raw == "0000-00-00")
        except ValueError:
            assert out is None


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 2 ** 31), min_size=1, max_size=50))
def test_unix_to_ts_roundtrip(spark, secs):
    got = _eval(spark, secs, X.unix_to_ts)
    want = [datetime.datetime.fromtimestamp(s, tz=datetime.timezone.utc)
            .replace(tzinfo=None) for s in secs]   # session TZ is UTC
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.lists(st.text(st.characters(codec="ascii",
                                   exclude_characters=",\x00"),
                     min_size=1, max_size=8),
             min_size=1, max_size=6).map(lambda p: ",".join(p)),
    min_size=1, max_size=30))
def test_csv_to_list_splits(spark, csvs):
    got = _eval(spark, csvs, X.csv_to_list, "string")
    assert got == [c.split(",") for c in csvs]


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.tuples(st.integers(1, 2 ** 20),          # binlog file index
              st.integers(0, 2 ** 32 - 1),      # 32-bit position
              st.integers(0, 255)),             # row within statement
    min_size=2, max_size=40, unique=True))
def test_binlog_seq_total_order_matches_lexicographic(spark, triples):
    """seq must order exactly like (file, pos, row) lexicographically
    and be unique for distinct triples -- the contract upsert's
    max_by(struct, seq) depends on."""
    from mysql_syncer_clickhouse_spark.sources.debezium import binlog_seq
    df = spark.createDataFrame(
        [(f"mysql-bin.{i:06d}", p, r) for i, p, r in triples],
        "file string, pos long, row int")
    seqs = [r["seq"] for r in
            df.select(binlog_seq(F.col("file"), F.col("pos"),
                                 F.col("row"))).collect()]
    by_seq = sorted(range(len(triples)), key=lambda k: seqs[k])
    by_tuple = sorted(range(len(triples)), key=lambda k: triples[k])
    assert by_seq == by_tuple
    assert len(set(seqs)) == len(triples)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=80))
def test_image_header_parse_never_throws_on_garbage(payload):
    """Fuzz the header parser: arbitrary bytes must yield None or a
    well-typed (width, height, format) -- never an exception (crawl
    payloads are hostile)."""
    out = parse_image_header(payload)
    if out is not None:
        w, h, fmt = out
        assert isinstance(w, int) and isinstance(h, int)
        assert fmt in ("png", "bmp")


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 2 ** 20), st.integers(1, 2 ** 20))
def test_image_header_roundtrip_any_dimensions(w, h):
    assert parse_image_header(make_bmp_header(w, h)) == (w, h, "bmp")
    assert parse_image_header(make_png_header(w, h)) == (w, h, "png")
