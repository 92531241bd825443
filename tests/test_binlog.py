"""Binlog v4 decoder tests.

The encoder here is an independent TEST-SIDE implementation of the
same public format (header framing, table map, row images, binary
JSON) -- it shares no code with the decoder under test. Symmetric-bug
risk is pinned down by GOLDEN bytes: hand-computed hex for the tricky
encodings (NEWDECIMAL sign-flip groups, DATE bit packing, binary-JSON
small object) asserted against the decoder directly, plus CRC32 from
stdlib zlib on both sides.
"""

from __future__ import annotations

import datetime
import json
import struct
import zlib
from decimal import Decimal

import pytest

from mysql_syncer_clickhouse_spark.sources import binlog as B

# ---------------------------------------------------------------- encoder


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + struct.pack("<Q", n)


class Enc:
    """Builds a binlog file byte-by-byte from the public layout."""

    def __init__(self, server_version: str = "8.0.36",
                 checksum: bool = True):
        self.buf = bytearray(B.BINLOG_MAGIC)
        self.pos = 4
        self.checksum = checksum
        body = struct.pack("<H", 4)
        body += server_version.encode().ljust(50, b"\x00")
        body += struct.pack("<I", 1700000000)
        body += bytes([19])
        body += bytes(40)                       # post-header lengths
        body += bytes([1 if checksum else 0])   # checksum alg
        self._event(B.FORMAT_DESCRIPTION_EVENT, body, force_crc=True)

    def _event(self, type_code: int, body: bytes, ts: int = 1700000100,
               server_id: int = 7, force_crc: bool = False,
               corrupt_crc: bool = False) -> None:
        crc = self.checksum or force_crc
        size = 19 + len(body) + (4 if crc else 0)
        self.pos += size
        header = struct.pack("<IBIIIH", ts, type_code, server_id,
                             size, self.pos, 0)
        ev = header + body
        if crc:
            c = zlib.crc32(ev)
            if corrupt_crc:
                c ^= 0xDEADBEEF
            ev += struct.pack("<I", c)
        self.buf += ev

    def table_map(self, table_id: int, schema: str, table: str,
                  cols: list[tuple], *, names: bool = True,
                  signedness: list[bool] | None = None) -> None:
        """cols: (name, type_code, meta_bytes, unsigned) tuples."""
        body = table_id.to_bytes(6, "little") + struct.pack("<H", 1)
        body += bytes([len(schema)]) + schema.encode() + b"\x00"
        body += bytes([len(table)]) + table.encode() + b"\x00"
        body += _lenenc(len(cols))
        body += bytes(c[1] for c in cols)
        meta = b"".join(c[2] for c in cols)
        body += _lenenc(len(meta)) + meta
        body += bytes((len(cols) + 7) // 8)     # nullability (unused)
        if signedness is None:
            signedness = [len(c) > 3 and c[3] for c in cols
                          if c[1] in (B.T_TINY, B.T_SHORT, B.T_INT24,
                                      B.T_LONG, B.T_LONGLONG, B.T_FLOAT,
                                      B.T_DOUBLE, B.T_NEWDECIMAL)]
        if signedness:
            bm = bytearray((len(signedness) + 7) // 8)
            for i, s in enumerate(signedness):
                if s:
                    bm[i // 8] |= 0x80 >> (i % 8)
            body += bytes([1]) + _lenenc(len(bm)) + bytes(bm)
        if names:
            blob = b"".join(_lenenc(len(c[0])) + c[0].encode()
                            for c in cols)
            body += bytes([4]) + _lenenc(len(blob)) + blob
        self._event(B.TABLE_MAP_EVENT, body)

    def rows(self, type_code: int, table_id: int, ncols: int,
             images: list[list[bytes | None]], ts: int = 1700000100,
             corrupt_crc: bool = False) -> None:
        """images: for insert/delete one image per row; for update
        alternating before, after. Each image = per-column encoded
        bytes or None (NULL)."""
        body = table_id.to_bytes(6, "little") + struct.pack("<H", 0)
        body += struct.pack("<H", 2)            # extra_data_len (v2)
        body += _lenenc(ncols)
        bm_len = (ncols + 7) // 8
        present = b"\xff" * bm_len
        body += present
        if type_code == B.UPDATE_ROWS_EVENT:
            body += present
        for img in images:
            null = bytearray(bm_len)
            vals = b""
            for i, v in enumerate(img):
                if v is None:
                    null[i // 8] |= 1 << (i % 8)
                else:
                    vals += v
            body += bytes(null) + vals
        self._event(type_code, body, ts=ts, corrupt_crc=corrupt_crc)

    def query(self, sql: str, schema: str = "app") -> None:
        body = struct.pack("<IIBHH", 42, 0, len(schema), 0, 0)
        body += schema.encode() + b"\x00" + sql.encode()
        self._event(B.QUERY_EVENT, body)

    def xid(self, xid: int) -> None:
        self._event(B.XID_EVENT, struct.pack("<Q", xid))

    def rows_partial_update(self, table_id: int, ncols: int,
                            pairs) -> None:
        """PARTIAL_UPDATE_ROWS_EVENT (WL#2955). pairs: list of
        (before_img, after_img, value_options, partial_bits); the
        after-image is prefixed by lenenc value_options and, when its
        PARTIAL_JSON bit is set, by partial_bits."""
        body = table_id.to_bytes(6, "little") + struct.pack("<H", 0)
        body += struct.pack("<H", 2)            # v2 var-header
        body += _lenenc(ncols)
        bm_len = (ncols + 7) // 8
        present = b"\xff" * bm_len
        body += present + present
        for before, after, vopts, pbits in pairs:
            body += _img_bytes(before, bm_len)
            body += _lenenc(vopts) + pbits
            body += _img_bytes(after, bm_len)
        self._event(B.PARTIAL_UPDATE_ROWS_EVENT, body)

    def payload(self, inner_frames: bytes, *, compression: int = 255,
                usize: int | None = None) -> None:
        """TRANSACTION_PAYLOAD_EVENT (WL#3549 TLV layout): compression
        type (field 2), optional uncompressed size (field 3), payload
        size (field 1), end mark (0), then the raw inner frames."""
        body = bytes([2, 1, compression])
        if usize is not None:
            ub = usize.to_bytes(max(1, (usize.bit_length() + 7) // 8),
                                "little")
            body += bytes([3, len(ub)]) + ub
        ps = len(inner_frames)
        psb = ps.to_bytes(max(1, (ps.bit_length() + 7) // 8), "little")
        body += bytes([1, len(psb)]) + psb
        body += bytes([0]) + inner_frames
        self._event(B.TRANSACTION_PAYLOAD_EVENT, body)

    def bytes(self) -> bytes:
        return bytes(self.buf)


def _img_bytes(img, bm_len: int) -> bytes:
    null = bytearray(bm_len)
    vals = b""
    for i, v in enumerate(img):
        if v is None:
            null[i // 8] |= 1 << (i % 8)
        else:
            vals += v
    return bytes(null) + vals


def _raw_frames(build) -> bytes:
    """Checksum-less event frames as they appear INSIDE a payload
    envelope (no magic, no FDE, no CRC -- WL#3549)."""
    e = Enc(checksum=False)
    n0 = len(e.buf)
    build(e)
    return bytes(e.buf[n0:])


# value encoders (independent of the module under test)
def e_i8(v):
    return struct.pack("<b", v)


def e_u8(v):
    return struct.pack("<B", v)


def e_i32(v):
    return struct.pack("<i", v)


def e_u32(v):
    return struct.pack("<I", v)


def e_i64(v):
    return struct.pack("<q", v)


def e_varchar(s, maxlen=80):
    b = s.encode()
    return (struct.pack("<H", len(b)) if maxlen > 255
            else bytes([len(b)])) + b


def e_decimal(s: str, precision: int, scale: int) -> bytes:
    d = Decimal(s)
    neg = d < 0
    digits = f"{abs(d):f}"
    if "." in digits:
        ip, fp = digits.split(".")
    else:
        ip, fp = digits, ""
    fp = fp.ljust(scale, "0")[:scale]
    intg = precision - scale
    ip = ip.rjust(intg, "0")
    out = bytearray()
    first = intg % 9
    if first:
        out += int(ip[:first]).to_bytes(B._DIG2BYTES[first], "big")
        ip = ip[first:]
    while ip:
        out += int(ip[:9]).to_bytes(4, "big")
        ip = ip[9:]
    while len(fp) >= 9:
        out += int(fp[:9]).to_bytes(4, "big")
        fp = fp[9:]
    if fp:
        out += int(fp).to_bytes(B._DIG2BYTES[len(fp)], "big")
    out[0] |= 0x80
    if neg:
        out = bytearray(x ^ 0xFF for x in out)
    return bytes(out)


def e_date(y, m, d):
    return (y << 9 | m << 5 | d).to_bytes(3, "little")


def e_datetime2(y, mo, d, h, mi, s, micro=0, fsp=0):
    v = (1 << 39) | ((y * 13 + mo) << 22) | (d << 17) | (h << 12) \
        | (mi << 6) | s
    out = v.to_bytes(5, "big")
    n = (fsp + 1) // 2
    if n:
        out += (micro // 10 ** (6 - 2 * n)).to_bytes(n, "big")
    return out


def e_timestamp2(secs, micro=0, fsp=0):
    out = secs.to_bytes(4, "big")
    n = (fsp + 1) // 2
    if n:
        out += (micro // 10 ** (6 - 2 * n)).to_bytes(n, "big")
    return out


def e_time2(h, mi, s, neg=False, micro=0, fsp=0):
    # one big-endian two's-complement number over 3+ceil(fsp/2) bytes,
    # biased at 0x800000<<(8*frac_bytes) -- negation applies to the
    # WHOLE packed (int<<frac) value, matching the server's encoder
    fb = (fsp + 1) // 2
    x = (h << 12 | mi << 6 | s) << (8 * fb)
    if fb:
        x |= micro // 10 ** (6 - 2 * fb)
    bias = 0x800000 << (8 * fb)
    v = bias - x if neg else bias + x
    return v.to_bytes(3 + fb, "big")


def e_json_obj(obj) -> bytes:
    """Small-object/array binary JSON (test-side encoder)."""
    def enc_value(v):
        """returns (type, inline2bytes or None, payload bytes or None)"""
        if v is None:
            return 0x04, b"\x00\x00", None
        if isinstance(v, bool):
            return 0x04, bytes([1 if v else 2]) + b"\x00", None
        if isinstance(v, int):
            if -(1 << 15) <= v < 1 << 15:
                return 0x05, struct.pack("<h", v), None
            if -(1 << 31) <= v < 1 << 31:
                return 0x07, None, struct.pack("<i", v)
            return 0x09, None, struct.pack("<q", v)
        if isinstance(v, float):
            return 0x0B, None, struct.pack("<d", v)
        if isinstance(v, str):
            b = v.encode()
            assert len(b) < 128
            return 0x0C, None, bytes([len(b)]) + b
        if isinstance(v, (dict, list)):
            return (0x00 if isinstance(v, dict) else 0x02), None, \
                enc_payload(v)
        raise AssertionError(type(v))

    def enc_payload(v) -> bytes:
        is_obj = isinstance(v, dict)
        items = list(v.items()) if is_obj else [(None, x) for x in v]
        n = len(items)
        head = 2 + 2 + (4 if is_obj else 0) * n + 3 * n
        keys = b"".join(k.encode() for k, _ in items) if is_obj else b""
        key_entries = b""
        off = head
        if is_obj:
            for k, _ in items:
                kb = k.encode()
                key_entries += struct.pack("<HH", off, len(kb))
                off += len(kb)
        val_entries, tail = b"", b""
        for _, val in items:
            t, inline, payload = enc_value(val)
            if inline is not None:
                val_entries += bytes([t]) + inline
            else:
                val_entries += bytes([t]) + struct.pack("<H", off)
                tail += payload
                off += len(payload)
        total = head + len(keys) + len(tail)
        return struct.pack("<HH", n, total) + key_entries \
            + val_entries + keys + tail

    t, _, payload = enc_value(obj)
    return bytes([t]) + payload


def e_blob(b: bytes, size_bytes=2):
    return len(b).to_bytes(size_bytes, "little") + b


def wrap_json_col(j: bytes, size_bytes=4) -> bytes:
    return len(j).to_bytes(size_bytes, "little") + j


def e_json_value(v) -> bytes:
    """Standalone binary-JSON value (type byte + data) -- scalars are
    NOT inlined at top level, unlike inside object/array entries."""
    if isinstance(v, (dict, list)):
        return e_json_obj(v)
    if v is None:
        return bytes([0x04, 0])
    if isinstance(v, bool):
        return bytes([0x04, 1 if v else 2])
    if isinstance(v, int):
        if -(1 << 15) <= v < 1 << 15:
            return bytes([0x05]) + struct.pack("<h", v)
        if -(1 << 31) <= v < 1 << 31:
            return bytes([0x07]) + struct.pack("<i", v)
        return bytes([0x09]) + struct.pack("<q", v)
    if isinstance(v, float):
        return bytes([0x0B]) + struct.pack("<d", v)
    b = v.encode()
    assert len(b) < 128
    return bytes([0x0C, len(b)]) + b


def e_json_diffs(diffs) -> bytes:
    """Json_diff_vector binary (sql/json_diff.cc write_binary):
    diffs: list of (op, path, value-or-None)."""
    out = b""
    for op, path, val in diffs:
        pb = path.encode()
        out += bytes([op]) + _lenenc(len(pb)) + pb
        if op != 2:  # REMOVE carries no value
            jb = e_json_value(val)
            out += _lenenc(len(jb)) + jb
    return out


# --------------------------------------------------------------- goldens


def test_golden_newdecimal():
    # 1234567890.1234 as DECIMAL(14,4): hand-computed group bytes
    raw = bytes.fromhex("810dfb38d204d2")
    assert B._decode_newdecimal(raw, 14, 4) == Decimal("1234567890.1234")
    neg = bytes(x ^ 0xFF for x in raw)
    assert B._decode_newdecimal(neg, 14, 4) == Decimal("-1234567890.1234")


def test_golden_date_bits():
    r = B._Reader(bytes.fromhex("6fd00f"))  # 2024-03-15 hand-packed
    assert B._decode_value(r, B.T_DATE, 0, False) == \
        datetime.date(2024, 3, 15)


def test_golden_time2_negative_with_fraction():
    # ADVICE r7: -00:00:01.50 at fsp=2 is the two's-complement of the
    # WHOLE (int<<frac) packed value -> bytes 7F FF FE CE. A decoder
    # that sign-splits the 3-byte int part and reads the fraction byte
    # unsigned gets the fraction (and micro range) wrong.
    r = B._Reader(bytes.fromhex("7ffffece"))
    td = B._decode_time2(r, 2)
    assert td == -datetime.timedelta(seconds=1, microseconds=500000)
    # encoder round-trip at fsp=2 and fsp=6, both signs
    for neg in (False, True):
        for h, mi, s, micro, fsp in [(0, 0, 1, 500000, 2),
                                     (101, 2, 3, 123456, 6),
                                     (0, 0, 0, 10000, 2),
                                     (5, 59, 59, 999999, 6)]:
            raw = e_time2(h, mi, s, neg=neg, micro=micro, fsp=fsp)
            got = B._decode_time2(B._Reader(raw), fsp)
            want = datetime.timedelta(hours=h, minutes=mi, seconds=s,
                                      microseconds=micro)
            assert got == (-want if neg else want), (neg, h, mi, s, micro)
    # fsp=0 negative unchanged by the fix
    assert B._decode_time2(B._Reader(e_time2(101, 2, 3, neg=True)), 0) == \
        -datetime.timedelta(hours=101, minutes=2, seconds=3)


def test_golden_geometry_and_unsigned_boundaries():
    # GEOMETRY decodes as raw SRID+WKB bytes (go-mysql's contract):
    # SRID 4326 + WKB little-endian POINT(1.5, -2.5)
    wkb = (struct.pack("<I", 4326) + b"\x01"
           + struct.pack("<I", 1) + struct.pack("<dd", 1.5, -2.5))
    r = B._Reader(struct.pack("<I", len(wkb)) + wkb)
    got = B._decode_value(r, B.T_GEOMETRY, 4, False)
    assert got == wkb
    # unsigned boundaries: INT24 max vs signed wraparound, TINY 255
    r = B._Reader(b"\xff\xff\xff")
    assert B._decode_value(r, B.T_INT24, 0, True) == (1 << 24) - 1
    r = B._Reader(b"\xff\xff\xff")
    assert B._decode_value(r, B.T_INT24, 0, False) == -1
    r = B._Reader(b"\xff")
    assert B._decode_value(r, B.T_TINY, 0, True) == 255
    r = B._Reader(b"\x80")
    assert B._decode_value(r, B.T_TINY, 0, False) == -128
    r = B._Reader(b"\xff" * 8)
    assert B._decode_value(r, B.T_LONGLONG, 0, True) == (1 << 64) - 1


_PAYLOAD_COLS = [("id", B.T_LONG, b"", False),
                 ("v", B.T_VARCHAR, struct.pack("<H", 80), False)]


def test_payload_uncompressed_roundtrip():
    """TRANSACTION_PAYLOAD with compression NONE: inner frames decode
    as ordinary events, TABLE_MAP state is shared with the outer
    stream, and inner frames are never checksummed."""
    enc = Enc()
    inner = _raw_frames(lambda e: (
        e.table_map(5, "app", "t", _PAYLOAD_COLS),
        e.rows(B.WRITE_ROWS_EVENT, 5, 2,
               [[e_i32(1), e_varchar("in-payload")]]),
        e.xid(77)))
    enc.payload(inner, usize=len(inner))
    # an OUTER row event after the envelope reuses the INNER TABLE_MAP
    enc.rows(B.WRITE_ROWS_EVENT, 5, 2, [[e_i32(2), e_varchar("after")]])
    evs = list(B.iter_binlog_events(enc.bytes()))
    rows = [ev for ev in evs if ev.rows]
    assert rows[0].rows[0]["after"] == {"id": 1, "v": "in-payload"}
    assert rows[0].schema == "app" and rows[0].table == "t"
    assert rows[1].rows[0]["after"] == {"id": 2, "v": "after"}
    assert any(ev.xid == 77 for ev in evs)


def test_payload_zstd_roundtrip():
    """Real zstd-compressed payload (compressed with libzstd via
    pyarrow -- the genuine format, not a self-implementation): inner
    frames decode identically to the uncompressed path."""
    pa = pytest.importorskip("pyarrow")
    inner = _raw_frames(lambda e: (
        e.table_map(5, "app", "t", _PAYLOAD_COLS),
        e.rows(B.WRITE_ROWS_EVENT, 5, 2,
               [[e_i32(9), e_varchar("zstd-payload")]]),
        e.xid(42)))
    comp = bytes(pa.Codec("zstd").compress(inner))
    enc = Enc()
    enc.payload(comp, compression=0, usize=len(inner))
    evs = list(B.iter_binlog_events(enc.bytes()))
    rows = [ev for ev in evs if ev.rows]
    assert rows[0].rows[0]["after"] == {"id": 9, "v": "zstd-payload"}
    assert any(ev.xid == 42 for ev in evs)


def test_payload_zstd_without_size_field_refused_on_pyarrow_path():
    pa = pytest.importorskip("pyarrow")
    try:
        import zstandard  # noqa: F401
        pytest.skip("zstandard installed; pyarrow path not reachable")
    except ImportError:
        pass
    comp = bytes(pa.Codec("zstd").compress(b"x" * 64))
    enc = Enc()
    enc.payload(comp, compression=0)   # no uncompressed-size field
    with pytest.raises(B.BinlogError, match="uncompressed-size"):
        list(B.iter_binlog_events(enc.bytes()))


def test_payload_unknown_compression_and_missing_end_mark_refused():
    enc = Enc()
    enc.payload(b"", compression=7)
    with pytest.raises(B.BinlogError, match="unknown payload compression"):
        list(B.iter_binlog_events(enc.bytes()))
    enc2 = Enc()
    enc2._event(B.TRANSACTION_PAYLOAD_EVENT, bytes([2, 1, 255]))
    with pytest.raises(B.BinlogError, match="end mark"):
        list(B.iter_binlog_events(enc2.bytes()))


def test_payload_nested_envelope_refused():
    enc = Enc()
    inner_payload = _raw_frames(lambda e: e.payload(b""))
    enc.payload(inner_payload)
    with pytest.raises(B.BinlogError, match="nested"):
        list(B.iter_binlog_events(enc.bytes()))


_PJ_COLS = [("id", B.T_LONG, b"", False),
            ("doc", B.T_JSON, bytes([4]), False)]


def _partial_update_file(before_doc, diffs, *, value_options=1,
                         partial_bits=bytes([1])):
    enc = Enc()
    enc.table_map(9, "app", "j", _PJ_COLS)
    before = [e_i32(1), wrap_json_col(e_json_obj(before_doc))]
    after = [e_i32(1), wrap_json_col(e_json_diffs(diffs))]
    enc.rows_partial_update(9, 2, [(before, after, value_options,
                                    partial_bits)])
    return enc.bytes()


def test_partial_json_diffs_applied_to_before_image():
    """WL#2955: REPLACE / array INSERT (past-the-end appends) /
    member INSERT / REMOVE replayed against the before-image; the
    surfaced after-image is a full document."""
    data = _partial_update_file(
        {"a": 1, "b": [1, 2, 3], "keep": "x"},
        [(0, "$.a", 5), (1, "$.b[3]", 9), (2, "$.keep", None),
         (1, "$.c", "new")])
    evs = [ev for ev in B.iter_binlog_events(data) if ev.rows]
    row = evs[0].rows[0]
    assert row["before"]["doc"] == {"a": 1, "b": [1, 2, 3], "keep": "x"}
    assert row["after"]["doc"] == {"a": 5, "b": [1, 2, 3, 9], "c": "new"}
    assert row["after"]["id"] == 1
    assert evs[0].op == "update"


def test_partial_json_quoted_path_and_root_replace():
    data = _partial_update_file(
        {"weird key": [{"x": 1}], "z": 0},
        [(0, '$."weird key"[0].x', 2)])
    row = [ev for ev in B.iter_binlog_events(data) if ev.rows][0].rows[0]
    assert row["after"]["doc"] == {"weird key": [{"x": 2}], "z": 0}
    data = _partial_update_file({"old": 1}, [(0, "$", {"whole": True})])
    row = [ev for ev in B.iter_binlog_events(data) if ev.rows][0].rows[0]
    assert row["after"]["doc"] == {"whole": True}


def test_partial_bit_zero_means_full_document():
    """value_options says PARTIAL_JSON but this column's bit is 0:
    the value is an ordinary full binary-JSON document."""
    enc = Enc()
    enc.table_map(9, "app", "j", _PJ_COLS)
    before = [e_i32(1), wrap_json_col(e_json_obj({"a": 1}))]
    after = [e_i32(1), wrap_json_col(e_json_obj({"a": 2}))]
    enc.rows_partial_update(9, 2, [(before, after, 1, bytes([0]))])
    row = [ev for ev in B.iter_binlog_events(enc.bytes())
           if ev.rows][0].rows[0]
    assert row["after"]["doc"] == {"a": 2}


def test_partial_value_options_zero_has_no_bitmap():
    enc = Enc()
    enc.table_map(9, "app", "j", _PJ_COLS)
    before = [e_i32(1), wrap_json_col(e_json_obj({"a": 1}))]
    after = [e_i32(1), wrap_json_col(e_json_obj({"a": 3}))]
    enc.rows_partial_update(9, 2, [(before, after, 0, b"")])
    row = [ev for ev in B.iter_binlog_events(enc.bytes())
           if ev.rows][0].rows[0]
    assert row["after"]["doc"] == {"a": 3}


def test_partial_null_json_column_still_consumes_its_bit():
    """Bits are consumed per present JSON column including NULL ones
    (go-mysql's interop convention): with j1 NULL, j2's bit is bit 1."""
    cols = [("id", B.T_LONG, b"", False),
            ("j1", B.T_JSON, bytes([4]), False),
            ("j2", B.T_JSON, bytes([4]), False)]
    enc = Enc()
    enc.table_map(9, "app", "jj", cols)
    before = [e_i32(1), wrap_json_col(e_json_obj({"a": 1})),
              wrap_json_col(e_json_obj({"b": 2}))]
    after = [e_i32(1), None,
             wrap_json_col(e_json_diffs([(0, "$.b", 7)]))]
    enc.rows_partial_update(9, 3, [(before, after, 1, bytes([0b10]))])
    row = [ev for ev in B.iter_binlog_events(enc.bytes())
           if ev.rows][0].rows[0]
    assert row["after"]["j1"] is None
    assert row["after"]["j2"] == {"b": 7}


def test_partial_without_before_document_refused():
    """Diffs are unreconstructable without the before-image document
    (binlog_row_image != FULL) -- refuse, don't guess."""
    enc = Enc()
    enc.table_map(9, "app", "j", _PJ_COLS)
    before = [e_i32(1), None]   # NULL before-image doc
    after = [e_i32(1), wrap_json_col(e_json_diffs([(0, "$.a", 5)]))]
    enc.rows_partial_update(9, 2, [(before, after, 1, bytes([1]))])
    with pytest.raises(B.BinlogError, match="before-image"):
        list(B.iter_binlog_events(enc.bytes()))


def test_partial_bad_diffs_refused():
    for diffs, msg in [
            ([(0, "$.missing", 1)], "does not resolve"),
            ([(2, "$.missing", None)], "does not resolve"),
            ([(1, "$.a", 9)], "existing member"),
            ([(5, "$.a", 1)], "unknown JSON diff")]:
        data = _partial_update_file({"a": 1}, diffs)
        with pytest.raises(B.BinlogError, match=msg):
            list(B.iter_binlog_events(data))


def test_partial_update_through_envelope_path():
    """The file-reader envelope surfaces the reconstructed full
    after-image document."""
    data = _partial_update_file({"a": 1, "b": [1]}, [(1, "$.b[9]", 2)])
    env = B.decode_binlog_file_bytes("mysql-bin.000001", data)
    assert len(env) == 1 and env[0]["op"] == "update"
    assert json.loads(env[0]["after"])["doc"] == {"a": 1, "b": [1, 2]}


def test_opaque_json_typed_values():
    """Opaque binary-JSON literals (CAST(x AS JSON) of DECIMAL/DATE/
    TIME/DATETIME): packed-int64 temporals and (precision, scale,
    NEWDECIMAL) decimals decode typed; unknown opaque stays hex."""
    import datetime
    from decimal import Decimal

    dec = e_decimal("1234.56", 6, 2)
    raw = bytes([6, 2]) + dec
    b = bytes([0x0F, B.T_NEWDECIMAL, len(raw)]) + raw
    assert B._decode_json_value(b) == Decimal("1234.56")

    ymd = ((2023 * 13 + 7) << 5) | 4
    b = bytes([0x0F, B.T_DATE, 8]) + struct.pack("<q", (ymd << 17) << 24)
    assert B._decode_json_value(b) == datetime.date(2023, 7, 4)

    hms = (9 << 12) | (8 << 6) | 7
    v = (((ymd << 17) | hms) << 24) | 123
    b = bytes([0x0F, B.T_DATETIME, 8]) + struct.pack("<q", v)
    assert B._decode_json_value(b) == datetime.datetime(
        2023, 7, 4, 9, 8, 7, 123)

    v = -((((1 << 12) | (2 << 6) | 3) << 24) | 4)
    b = bytes([0x0F, B.T_TIME, 8]) + struct.pack("<q", v)
    assert B._decode_json_value(b) == -datetime.timedelta(
        hours=1, minutes=2, seconds=3, microseconds=4)

    b = bytes([0x0F, 250, 2]) + b"\xab\xcd"
    assert B._decode_json_value(b) == {"_opaque_type": 250,
                                       "_hex": "abcd"}


def test_golden_binary_json_small_object():
    # {"a": 1}: hand-laid-out small object (count=1, size=12,
    # key entry offset=11 len=1, inlined int16 value)
    b = bytes.fromhex("0001000c000b000100050100" + "61")
    assert B._decode_json_value(b) == {"a": 1}


def test_golden_event_header_framing():
    enc = Enc(checksum=False)
    enc.query("BEGIN")
    evs = list(B.iter_binlog_events(enc.bytes()))
    assert [e.type_code for e in evs] == [B.FORMAT_DESCRIPTION_EVENT,
                                          B.QUERY_EVENT]
    assert evs[1].query == "BEGIN"
    assert evs[1].server_id == 7
    assert evs[1].schema == "app"


# ----------------------------------------------------------- type matrix


SCALAR_COLS = [
    ("c_tiny", B.T_TINY, b"", False),
    ("c_utiny", B.T_TINY, b"", True),
    ("c_int", B.T_LONG, b"", False),
    ("c_uint", B.T_LONG, b"", True),
    ("c_big", B.T_LONGLONG, b"", False),
    ("c_double", B.T_DOUBLE, bytes([8]), False),
    ("c_dec", B.T_NEWDECIMAL, bytes([12, 4]), False),
    ("c_vc", B.T_VARCHAR, struct.pack("<H", 80), False),
    ("c_vc_long", B.T_VARCHAR, struct.pack("<H", 1000), False),
    ("c_char", B.T_STRING, bytes([0xFE, 40]), False),
    ("c_enum", B.T_STRING, bytes([B.T_ENUM, 1]), False),
    ("c_set", B.T_STRING, bytes([B.T_SET, 1]), False),
    ("c_bit", B.T_BIT, bytes([2, 1]), False),     # BIT(10)
    ("c_blob", B.T_BLOB, bytes([2]), False),
    ("c_json", B.T_JSON, bytes([4]), False),
    ("c_date", B.T_DATE, b"", False),
    ("c_dt", B.T_DATETIME2, bytes([0]), False),
    ("c_dt6", B.T_DATETIME2, bytes([6]), False),
    ("c_ts", B.T_TIMESTAMP2, bytes([0]), False),
    ("c_time", B.T_TIME2, bytes([0]), False),
    ("c_year", B.T_YEAR, b"", False),
]

JSON_DOC = {"k": "value", "n": 12, "big": 70000, "pi": 3.5,
            "ok": True, "nil": None, "arr": [1, "two", False],
            "nested": {"x": -5}}

ROW1 = [
    e_i8(-12), e_u8(200),
    e_i32(-100000), e_u32(3_000_000_000),
    e_i64(-(1 << 40)),
    struct.pack("<d", 2.5),
    e_decimal("-87654.3210", 12, 4),
    e_varchar("héllo", 80), e_varchar("x" * 300, 1000),
    e_varchar("padded", 40),
    bytes([2]),                    # enum index 2
    bytes([0b101]),                # set bits 1+3
    (0b11_0101_0011).to_bytes(2, "big"),
    e_blob(b"\x00\x01\xfe"),
    wrap_json_col(e_json_obj(JSON_DOC)),
    e_date(2024, 3, 15),
    e_datetime2(2024, 3, 15, 10, 30, 45),
    e_datetime2(1999, 12, 31, 23, 59, 59, micro=123456, fsp=6),
    e_timestamp2(1700000000),
    e_time2(101, 2, 3, neg=True),
    e_u8(99),
]

EXPECT1 = {
    "c_tiny": -12, "c_utiny": 200, "c_int": -100000,
    "c_uint": 3_000_000_000, "c_big": -(1 << 40), "c_double": 2.5,
    "c_dec": Decimal("-87654.3210"), "c_vc": "héllo",
    "c_vc_long": "x" * 300, "c_char": "padded", "c_enum": 2,
    "c_set": 0b101, "c_bit": 0b11_0101_0011, "c_blob": b"\x00\x01\xfe",
    "c_json": JSON_DOC, "c_date": datetime.date(2024, 3, 15),
    "c_dt": datetime.datetime(2024, 3, 15, 10, 30, 45),
    "c_dt6": datetime.datetime(1999, 12, 31, 23, 59, 59, 123456),
    "c_ts": datetime.datetime(2023, 11, 14, 22, 13, 20),
    "c_time": -datetime.timedelta(hours=101, minutes=2, seconds=3),
    "c_year": 1999,
}


def _one_table_file(images, type_code=B.WRITE_ROWS_EVENT, **tm_kw):
    enc = Enc()
    enc.table_map(23, "app", "t1", SCALAR_COLS, **tm_kw)
    enc.rows(type_code, 23, len(SCALAR_COLS), images)
    enc.xid(900)
    return enc.bytes()


def test_full_type_matrix_insert():
    evs = [e for e in B.iter_binlog_events(_one_table_file([ROW1]))
           if e.rows]
    assert len(evs) == 1
    ev = evs[0]
    assert (ev.op, ev.schema, ev.table) == ("insert", "app", "t1")
    assert ev.rows[0]["after"] == EXPECT1


def test_nulls_and_zero_dates():
    img = [None] * len(SCALAR_COLS)
    # zero-date / zero-datetime decode to None even when not NULL
    img[SCALAR_COLS.index(("c_date", B.T_DATE, b"", False))] = \
        e_date(0, 0, 0)
    idx_dt = [c[0] for c in SCALAR_COLS].index("c_dt")
    img[idx_dt] = e_datetime2(0, 0, 0, 0, 0, 0)
    ev = [e for e in B.iter_binlog_events(_one_table_file([img]))
          if e.rows][0]
    assert all(v is None for v in ev.rows[0]["after"].values())


def test_update_and_delete_images():
    enc = Enc()
    cols = [("id", B.T_LONG, b"", False),
            ("v", B.T_VARCHAR, struct.pack("<H", 80), False)]
    enc.table_map(5, "app", "kv", cols)
    enc.rows(B.UPDATE_ROWS_EVENT, 5, 2,
             [[e_i32(1), e_varchar("old")], [e_i32(1), e_varchar("new")],
              [e_i32(2), e_varchar("a")], [e_i32(2), e_varchar("b")]])
    enc.rows(B.DELETE_ROWS_EVENT, 5, 2, [[e_i32(2), e_varchar("b")]])
    evs = [e for e in B.iter_binlog_events(enc.bytes()) if e.rows]
    up, de = evs
    assert up.op == "update" and len(up.rows) == 2
    assert up.rows[0] == {"before": {"id": 1, "v": "old"},
                          "after": {"id": 1, "v": "new"}}
    assert de.op == "delete"
    assert de.rows[0] == {"before": {"id": 2, "v": "b"}}


def test_positional_names_without_metadata():
    enc = Enc()
    cols = [("id", B.T_LONG, b"", False)]
    enc.table_map(5, "app", "kv", cols, names=False, signedness=[])
    enc.rows(B.WRITE_ROWS_EVENT, 5, 1, [[e_i32(9)]])
    ev = [e for e in B.iter_binlog_events(enc.bytes()) if e.rows][0]
    assert ev.rows[0]["after"] == {"@0": 9}


def test_signedness_defaults_to_signed_without_tlv():
    enc = Enc()
    cols = [("u", B.T_LONG, b"", True)]
    enc.table_map(5, "app", "kv", cols, names=True, signedness=[])
    enc.rows(B.WRITE_ROWS_EVENT, 5, 1, [[e_u32(3_000_000_000)]])
    ev = [e for e in B.iter_binlog_events(enc.bytes()) if e.rows][0]
    # classic binlog carries no signedness: decodes as signed
    assert ev.rows[0]["after"]["u"] == 3_000_000_000 - (1 << 32)


def test_crc_mismatch_raises_and_optout():
    enc = Enc()
    cols = [("id", B.T_LONG, b"", False)]
    enc.table_map(5, "app", "kv", cols)
    enc.rows(B.WRITE_ROWS_EVENT, 5, 1, [[e_i32(1)]], corrupt_crc=True)
    with pytest.raises(B.BinlogError, match="CRC32"):
        list(B.iter_binlog_events(enc.bytes()))
    evs = list(B.iter_binlog_events(enc.bytes(), verify_checksum=False))
    assert [e.op for e in evs if e.rows] == ["insert"]


def test_no_checksum_server():
    enc = Enc(server_version="5.5.40", checksum=False)
    cols = [("id", B.T_LONG, b"", False)]
    enc.table_map(5, "app", "kv", cols)
    enc.rows(B.WRITE_ROWS_EVENT, 5, 1, [[e_i32(77)]])
    ev = [e for e in B.iter_binlog_events(enc.bytes()) if e.rows][0]
    assert ev.rows[0]["after"] == {"id": 77}


def test_row_event_before_table_map_raises():
    enc = Enc()
    enc.rows(B.WRITE_ROWS_EVENT, 99, 1, [[e_i32(1)]])
    with pytest.raises(B.BinlogError, match="TABLE_MAP"):
        list(B.iter_binlog_events(enc.bytes()))


def test_truncated_event_raises():
    enc = Enc()
    enc.query("BEGIN")
    with pytest.raises(B.BinlogError, match="truncated"):
        list(B.iter_binlog_events(enc.bytes()[:-3]))


def test_truncated_event_tolerant_mode_yields_prefix():
    # ADVICE r7: an actively-written file should yield its complete
    # prefix under tolerate_truncation instead of failing wholesale.
    enc = Enc()
    cols = [("id", B.T_LONG, b"", False)]
    enc.table_map(5, "app", "kv", cols)
    enc.rows(B.WRITE_ROWS_EVENT, 5, 1, [[e_i32(42)]])
    enc.query("BEGIN")  # the event that will be cut mid-body
    data = enc.bytes()[:-3]
    evs = list(B.iter_binlog_events(data, tolerate_truncation=True))
    # FDE + TABLE_MAP + WRITE complete; the cut QUERY is dropped
    assert [e.type_code for e in evs][-1] == B.WRITE_ROWS_EVENT
    assert evs[-1].rows[0]["after"] == {"id": 42}
    rows = B.decode_binlog_file_bytes("mysql-bin.000009", data,
                                      tolerate_truncation=True)
    assert len(rows) == 1 and json.loads(rows[0]["after"]) == {"id": 42}
    # a corrupt size field is NOT truncation: still raises in both modes
    hdr_at = 4  # FDE header starts right after magic
    corrupt = bytearray(enc.bytes())
    corrupt[hdr_at + 9:hdr_at + 13] = (5).to_bytes(4, "little")  # size<19
    with pytest.raises(B.BinlogError, match="corrupt"):
        list(B.iter_binlog_events(bytes(corrupt), tolerate_truncation=True))


# ------------------------------------------------------------ spark e2e


def _items_file(file_no: int, rows_spec) -> bytes:
    """rows_spec: list of (op, images...) on an items(id, title, qty)
    table; op in insert/update/delete."""
    enc = Enc()
    cols = [("id", B.T_LONGLONG, b"", False),
            ("title", B.T_VARCHAR, struct.pack("<H", 80), False),
            ("qty", B.T_LONG, b"", False)]
    enc.table_map(11, "app", "items", cols)

    def img(id_, title, qty):
        return [e_i64(id_),
                None if title is None else e_varchar(title),
                None if qty is None else e_i32(qty)]

    for spec in rows_spec:
        op = spec[0]
        if op == "insert":
            enc.rows(B.WRITE_ROWS_EVENT, 11, 3,
                     [img(*r) for r in spec[1]])
        elif op == "update":
            enc.rows(B.UPDATE_ROWS_EVENT, 11, 3,
                     [img(*r) for pair in spec[1] for r in pair])
        else:
            enc.rows(B.DELETE_ROWS_EVENT, 11, 3,
                     [img(*r) for r in spec[1]])
    enc.xid(1000 + file_no)
    return enc.bytes()


@pytest.fixture()
def binlog_dir(tmp_path):
    d = tmp_path / "binlogs"
    d.mkdir()
    (d / "mysql-bin.000001").write_bytes(_items_file(1, [
        ("insert", [(1, "first", 10), (2, "second", 20)]),
        ("update", [[(1, "first", 10), (1, "first-edited", 11)]]),
    ]))
    (d / "mysql-bin.000002").write_bytes(_items_file(2, [
        ("delete", [(2, "second", 20)]),
        ("insert", [(3, "third", 30)]),
    ]))
    return str(d)


ROW_DDL = "id long, title string, qty int"


def test_read_binlog_files_envelope(spark, binlog_dir):
    env = B.read_binlog_files(spark, binlog_dir).collect()
    assert len(env) == 5  # 2 ins + 1 upd + 1 del + 1 ins
    by_file = {}
    for r in env:
        by_file.setdefault(r["file"], []).append(r)
    assert sorted(by_file) == ["mysql-bin.000001", "mysql-bin.000002"]
    upd = [r for r in env if r["op"] == "update"][0]
    assert json.loads(upd["before"])["title"] == "first"
    assert json.loads(upd["after"])["title"] == "first-edited"
    dele = [r for r in env if r["op"] == "delete"][0]
    assert dele["after"] is None
    assert json.loads(dele["before"])["id"] == 2


def test_read_binlog_files_rejects_unnumbered_names(spark, tmp_path):
    # ADVICE r7: names without a numeric suffix would all key seq=0
    d = tmp_path / "bad"
    d.mkdir()
    (d / "mysql-bin.backup").write_bytes(_items_file(1, [
        ("insert", [(1, "x", 1)])]))
    with pytest.raises(B.BinlogError, match="numeric suffix"):
        B.read_binlog_files(spark, str(d)).collect()
    # opt-out keeps the old permissive behavior
    env = B.read_binlog_files(spark, str(d), strict_names=False).collect()
    assert len(env) == 1


def test_read_binlog_files_rejects_duplicate_basenames(spark, tmp_path):
    # identically named files in different subdirs collapse into one
    # seq space -- refuse rather than silently interleave
    d = tmp_path / "multi"
    (d / "a").mkdir(parents=True)
    (d / "b").mkdir()
    payload = _items_file(1, [("insert", [(1, "x", 1)])])
    (d / "a" / "mysql-bin.000001").write_bytes(payload)
    (d / "b" / "mysql-bin.000001").write_bytes(payload)
    with pytest.raises(B.BinlogError, match="duplicate binlog basename"):
        B.read_binlog_files(
            spark, str(d / "*" / "mysql-bin.*")).collect()


def test_read_binlog_files_tolerates_truncated_tail(spark, tmp_path):
    # the file reader defaults tolerant: an actively-written final file
    # contributes its complete prefix instead of failing the batch
    d = tmp_path / "live"
    d.mkdir()
    (d / "mysql-bin.000001").write_bytes(
        _items_file(1, [("insert", [(1, "x", 1)])]))
    full = _items_file(2, [("insert", [(2, "y", 2)]),
                           ("insert", [(3, "z", 3)])])
    # truncate INTO the second WRITE event's body (its end pos - 3)
    second_write_end = [e.log_pos for e in B.iter_binlog_events(full)
                        if e.rows][-1]
    (d / "mysql-bin.000002").write_bytes(full[:second_write_end - 3])
    env = B.read_binlog_files(spark, str(d)).collect()
    got = {json.loads(r["after"])["id"] for r in env}
    assert got == {1, 2}  # the cut trailing insert (and XID) dropped
    with pytest.raises(Exception, match="truncated"):
        B.read_binlog_files(spark, str(d),
                            tolerate_truncation=False).collect()


def test_envelope_carries_transaction_gtid():
    """Row events are stamped with the GTID of the transaction that
    opened them (GTID-mode resume checkpoints this, not (file, pos));
    rows after XID and rows on anonymous-GTID servers carry NULL."""
    sid = bytes.fromhex("3e11fa4771ca11e19e33c80aa9429562")
    enc = Enc()
    cols = [("id", B.T_LONG, b"", False)]
    enc.table_map(5, "app", "kv", cols)
    enc._event(B.GTID_LOG_EVENT, bytes([1]) + sid
               + struct.pack("<Q", 42))
    enc.rows(B.WRITE_ROWS_EVENT, 5, 1, [[e_i32(1)]])
    enc.xid(9)
    enc._event(B.ANONYMOUS_GTID_LOG_EVENT, bytes([1]) + bytes(16)
               + struct.pack("<Q", 0))
    enc.rows(B.WRITE_ROWS_EVENT, 5, 1, [[e_i32(2)]])
    rows = B.decode_binlog_file_bytes("mysql-bin.000001", enc.bytes())
    assert rows[0]["gtid"] == \
        "3e11fa47-71ca-11e1-9e33-c80aa9429562:42"
    assert rows[1]["gtid"] is None


def test_binlog_to_changelog_final_state(spark, binlog_dir):
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    env = B.read_binlog_files(spark, binlog_dir)
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    assert cl.columns == ["seq", "ts", "op", "id", "title", "qty"]
    final = {r["id"]: (r["title"], r["qty"])
             for r in latest_state(cl, ["id"]).collect()}
    assert final == {1: ("first-edited", 11), 3: ("third", 30)}


def test_binlog_to_changelog_with_before(spark, binlog_dir):
    env = B.read_binlog_files(spark, binlog_dir)
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items",
                               with_before=True)
    rows = cl.filter("op = 'update'").collect()
    assert len(rows) == 1
    assert rows[0]["before_title"] == "first"
    assert rows[0]["title"] == "first-edited"
    ins = cl.filter("op = 'insert'").collect()
    assert all(r["before_title"] is None for r in ins)


def test_binlog_stream_through_pipeline(spark, binlog_dir, tmp_path):
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    env = B.read_binlog_files(spark, binlog_dir, streaming=True,
                              max_files_per_trigger=1)
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    out = str(tmp_path / "sink")
    q = (cl.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = {r["id"]: r["title"]
             for r in latest_state(spark.read.parquet(out),
                                   ["id"]).collect()}
    assert final == {1: "first-edited", 3: "third"}


# ------------------------------------------------- corrupt-bytes fuzz
# The decoder runs inside executor tasks on untrusted bytes: ANY
# malformed input must fail with BinlogError (one exception type, with
# position context) or decode -- never a stray ValueError/IndexError,
# never a hang.

from hypothesis import given, settings, strategies as st  # noqa: E402


def _fuzz_bases():
    items = _items_file(1, [("insert", [(1, "a", 1), (2, "b", 2)]),
                            ("update", [[(1, "a", 1), (1, "c", 3)]])])
    pj = _partial_update_file(
        {"a": 1, "b": [1, 2]}, [(0, "$.a", 5), (1, "$.b[2]", 9)])
    enc = Enc()
    inner = _raw_frames(lambda e: (
        e.table_map(5, "app", "t", _PAYLOAD_COLS),
        e.rows(B.WRITE_ROWS_EVENT, 5, 2, [[e_i32(1), e_varchar("x")]])))
    enc.payload(inner, usize=len(inner))
    return [items, pj, enc.bytes()]


_BASES = _fuzz_bases()


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_decoder_mutated_bytes_fail_cleanly(data):
    buf = bytearray(data.draw(st.sampled_from(_BASES)))
    for _ in range(data.draw(st.integers(1, 8))):
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] = data.draw(st.integers(0, 255))
    try:
        # checksum off so mutations reach the value decoders instead
        # of all dying at the CRC gate
        list(B.iter_binlog_events(bytes(buf), verify_checksum=False))
    except B.BinlogError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_decoder_random_bytes_fail_cleanly(raw):
    try:
        list(B.iter_binlog_events(B.BINLOG_MAGIC + raw,
                                  verify_checksum=False))
    except B.BinlogError:
        pass


def test_mariadb_gtid_events_stamp_rows():
    """flavor=mariadb: GTID_EVENT (162) carries seq_no(8) domain(4);
    identity = domain-server_id-seq. GTID_LIST_EVENT (163) is the
    PREVIOUS_GTIDS analog."""
    enc = Enc()
    enc._event(163, struct.pack("<I", 2)
               + struct.pack("<IIQ", 0, 7, 41)
               + struct.pack("<IIQ", 1, 9, 17))
    enc._event(162, struct.pack("<QIB", 42, 0, 0), server_id=7)
    cols = [("id", B.T_LONG, b"", False)]
    enc.table_map(3, "app", "m", cols)
    enc.rows(B.WRITE_ROWS_EVENT, 3, 1, [[e_i32(5)]])
    enc.xid(9)
    evs = list(B.iter_binlog_events(enc.bytes()))
    assert any(e.gtid_set == "0-7-41,1-9-17" for e in evs)
    assert any(e.gtid == "0-7-42" for e in evs)
    env = B.decode_binlog_file_bytes("mysql-bin.000001", enc.bytes())
    assert env[0]["op"] == "insert" and env[0]["gtid"] == "0-7-42"
