"""binlog_writer round-trip tests: the package encoder's bytes must
decode through the package decoder (sources/binlog.py) with values
preserved. Symmetric-bug risk for the DECODER is pinned elsewhere
(tests/test_binlog.py: golden hand-computed bytes + an independent
test-side encoder); these tests pin the WRITER against that
already-pinned decoder."""

from __future__ import annotations

import datetime
import json

import pytest

from mysql_syncer_clickhouse_spark.sources import binlog as B
from mysql_syncer_clickhouse_spark.sources.binlog_writer import (
    BinlogColumn, BinlogFileWriter)

COLS = [BinlogColumn.bigint("id"),
        BinlogColumn.bigint("uid", unsigned=True),
        BinlogColumn.integer("qty"),
        BinlogColumn.double("score"),
        BinlogColumn.varchar("name", 80),
        BinlogColumn.varchar("blob_txt", 8192),
        BinlogColumn.datetime2("created", 6)]


def _writer():
    return BinlogFileWriter("app", "items", COLS, table_id=7,
                            server_id=3)


def test_writer_roundtrip_types_and_nulls():
    ts = datetime.datetime(2026, 3, 1, 12, 30, 45, 123456)
    w = _writer()
    w.insert([[ -5, 2**63 + 9, -42, 1.5e-300, "héllo", "x" * 300, ts],
              [None, None, None, None, None, None, None]])
    w.xid(99)
    evs = [e for e in B.iter_binlog_events(w.to_bytes()) if e.rows]
    assert len(evs) == 1 and evs[0].op == "insert"
    assert evs[0].schema == "app" and evs[0].table == "items"
    a0 = evs[0].rows[0]["after"]
    assert a0 == {"id": -5, "uid": 2**63 + 9, "qty": -42,
                  "score": 1.5e-300, "name": "héllo",
                  "blob_txt": "x" * 300, "created": ts}
    assert all(v is None for v in evs[0].rows[1]["after"].values())


def test_writer_update_delete_and_envelope():
    ts = datetime.datetime(2026, 1, 2, 3, 4, 5)
    w = _writer()
    before = [1, 1, 1, 1.0, "a", "b", ts]
    after = [1, 1, 2, 2.0, "a2", "b2", ts]
    w.update([(before, after)])
    w.delete([after])
    rows = B.decode_binlog_file_bytes("mysql-bin.000042", w.to_bytes())
    assert [r["op"] for r in rows] == ["update", "delete"]
    assert json.loads(rows[0]["before"])["qty"] == 1
    assert json.loads(rows[0]["after"])["qty"] == 2
    assert rows[1]["after"] is None
    assert json.loads(rows[1]["before"])["name"] == "a2"
    # log_pos is each event's END position (monotone, decoder contract)
    assert rows[0]["pos"] < rows[1]["pos"]


def test_writer_crc_and_checksummed_framing():
    # flipping any byte after the FDE must trip the decoder's CRC32
    w = _writer()
    w.insert([[1, 1, 1, 1.0, "a", "b",
               datetime.datetime(2026, 1, 1)]])
    data = bytearray(w.to_bytes())
    data[-10] ^= 0xFF
    with pytest.raises(B.BinlogError, match="CRC32"):
        list(B.iter_binlog_events(bytes(data)))


def test_writer_varchar_overflow_raises():
    w = _writer()
    with pytest.raises(ValueError, match="exceeds VARCHAR"):
        w.insert([[1, 1, 1, 1.0, "x" * 81, "b",
                   datetime.datetime(2026, 1, 1)]])


def test_writer_double_json_roundtrip_is_exact():
    # struct<d> + json repr + from_json-style parse must be bit-exact
    vals = [0.1, 1 / 3, 2.2250738585072014e-308, 1.7976931348623157e308,
            -0.0, 123456789.123456789]
    w = _writer()
    for v in vals:
        w.insert([[1, 1, 1, v, "a", "b", datetime.datetime(2026, 1, 1)]])
    evs = [e for e in B.iter_binlog_events(w.to_bytes()) if e.rows]
    got = [e.rows[0]["after"]["score"] for e in evs]
    assert [v.hex() for v in got] == [v.hex() for v in vals]


# ----------------------------------------------------------- fuzz
# hypothesis round-trip: arbitrary typed rows through the writer must
# come back value-identical through the decoder (NULLs anywhere,
# unsigned extremes, utf-8 text, raw bytes, full-fsp datetimes).

from hypothesis import given, settings, strategies as st  # noqa: E402

FUZZ_COLS = [BinlogColumn.bigint("id"),
             BinlogColumn.bigint("uid", unsigned=True),
             BinlogColumn.integer("qty"),
             BinlogColumn.double("score"),
             BinlogColumn.varchar("name", 240),
             BinlogColumn.blob("payload"),
             BinlogColumn.datetime2("created", 6)]

_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=50)

_ROW = st.tuples(
    st.one_of(st.none(), st.integers(-(2 ** 63), 2 ** 63 - 1)),
    st.one_of(st.none(), st.integers(0, 2 ** 64 - 1)),
    st.one_of(st.none(), st.integers(-(2 ** 31), 2 ** 31 - 1)),
    st.one_of(st.none(), st.floats(allow_nan=False)),
    st.one_of(st.none(), _TEXT),
    st.one_of(st.none(), st.binary(max_size=100)),
    st.one_of(st.none(), st.datetimes(
        min_value=datetime.datetime(1000, 1, 1),
        max_value=datetime.datetime(9999, 12, 31, 23, 59, 59, 999999))),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_ROW, min_size=1, max_size=8))
def test_writer_decoder_roundtrip_fuzz(rows):
    w = BinlogFileWriter("app", "t", FUZZ_COLS, table_id=4)
    w.insert([list(r) for r in rows])
    evs = [e for e in B.iter_binlog_events(w.to_bytes()) if e.rows]
    got = [tuple(r["after"][c.name] for c in FUZZ_COLS)
           for e in evs for r in e.rows]
    assert got == list(rows)
