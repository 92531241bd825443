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
