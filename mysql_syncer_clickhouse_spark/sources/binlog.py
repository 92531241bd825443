"""MySQL binlog (v4) file decoder -- the replication-log format itself.

The reference tails the binlog as a pseudo-replica through go-mysql's
canal (reference river/river.go:102-123, river/sync.go:72-102): the
server streams it binlog EVENTS -- TABLE_MAP + WRITE/UPDATE/DELETE_ROWS
-- and canal decodes row images into typed values. This module
implements that decode layer from the public binlog v4 on-disk/wire
format (the file format and the replication stream carry the same
events; a file begins with the 4-byte magic and a
FORMAT_DESCRIPTION_EVENT): event framing, CRC32 checksums, TABLE_MAP
column metadata, row-image bitmaps, and per-type value decoding
(ints, NEWDECIMAL, VARCHAR/STRING/ENUM/SET/BIT, BLOB, DATE/DATETIME2/
TIMESTAMP2/TIME2/YEAR, FLOAT/DOUBLE, binary JSON) -- all from scratch,
stdlib only, the same decode surface canal's row parser covers.

What is deliberately NOT here: the replication-protocol HANDSHAKE
(COM_REGISTER_SLAVE / COM_BINLOG_DUMP) that asks a live server to
stream these bytes -- there is no live MySQL in this sandbox. Given
any byte source that yields binlog bytes (a file, a relay log, a
socket reader's buffer), `iter_binlog_events` decodes it; the Spark
readers below consume binlog FILES, the standard offline form
(mysqlbinlog's input) and the natural distributed unit.

Scale shape: one binlog file = one task (`binaryFile` source +
mapInPandas; a file must be decoded sequentially because TABLE_MAP
state precedes its row events -- same constraint every consumer has,
including the reference's single replication stream). Parallelism
comes from the file axis (a day of 1 GiB binlogs = hundreds of
independent tasks) and everything downstream of the envelope is
ordinary Catalyst (from_json projection, the existing upsert path).
Row values are emitted as a JSON envelope so one fixed schema covers
every table; `binlog_to_changelog` projects a chosen table into the
normalized changelog shape (seq, ts, op, cols...) shared with the
Debezium source -- the apply path cannot tell them apart.

Support matrix vs canal/go-mysql's decode surface (round 8):

  SUPPORTED -- all integer widths incl. unsigned via the SIGNEDNESS
  TLV (default signed without it), FLOAT/DOUBLE, NEWDECIMAL (any
  precision, sign-flip groups), VARCHAR/VAR_STRING/STRING (1/2-byte
  lengths, packed STRING meta), ENUM (index), SET (bitmask), BIT,
  all BLOB widths, GEOMETRY (raw SRID+WKB bytes, what go-mysql
  returns too), JSON (binary small/large objects/arrays, inlined
  scalars, opaque typed literals -- DECIMAL/DATE/TIME/DATETIME
  decoded to typed values, unknown opaque types as hex),
  DATE (zero-date -> NULL),
  DATETIME2/TIMESTAMP2/TIME2 with any fsp (TIME2 as one biased
  two's-complement number -- negative fractions correct), YEAR;
  row events v1 and v2, UPDATE before/after pairing, CRC32 per
  event, FORMAT_DESCRIPTION checksum-algorithm negotiation,
  tolerant truncation for actively-written files;
  binlog_row_value_options=PARTIAL_JSON (event 39: after-image JSON
  diff vectors -- REPLACE/INSERT/REMOVE with full path grammar --
  are replayed against the before-image, so consumers only ever see
  full documents; requires binlog_row_image=FULL, else refused);
  binlog_transaction_compression=ON (event 40: the TLV payload
  envelope is opened in place -- uncompressed payloads always, zstd
  via the 'zstandard' module or pyarrow's bundled libzstd codec,
  and pyarrow is already a hard dependency of this engine).

  EXPLICIT REFUSAL (BinlogError, never silent drop) -- zstd payload
  with neither zstandard nor pyarrow available, or without the
  envelope's uncompressed-size field on the pyarrow path (its codec
  needs the exact size; the server always writes the field),
  partial-JSON diffs whose before-image lacks the document
  (binlog_row_image != FULL), unknown payload compression,
  unknown diff operations, diff paths that do not resolve.

  FRAMING-ONLY SKIP (no row data inside) -- GTID/ANONYMOUS_GTID/
  PREVIOUS_GTIDS and their MariaDB analogs GTID_EVENT(162)/
  GTID_LIST_EVENT(163) (identities surfaced and stamped onto rows
  in both flavors), ROTATE (next-file name surfaced), QUERY (schema
  + statement surfaced), XID (surfaced).
"""

from __future__ import annotations

import copy
import datetime
import json
import struct
import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BINLOG_MAGIC = b"\xfebin"

# event type codes (public libbinlogevents enum)
QUERY_EVENT = 2
ROTATE_EVENT = 4
FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT_V1 = 23
UPDATE_ROWS_EVENT_V1 = 24
DELETE_ROWS_EVENT_V1 = 25
GTID_LOG_EVENT = 33
ANONYMOUS_GTID_LOG_EVENT = 34
PREVIOUS_GTIDS_LOG_EVENT = 35
WRITE_ROWS_EVENT = 30
UPDATE_ROWS_EVENT = 31
DELETE_ROWS_EVENT = 32
HEARTBEAT_LOG_EVENT = 27         # dump-stream keepalive, never file data
TRANSACTION_PAYLOAD_EVENT = 40   # binlog_transaction_compression=ON
PARTIAL_UPDATE_ROWS_EVENT = 39   # binlog_row_value_options=PARTIAL_JSON
# MariaDB's own GTID events (flavor=mariadb; row events reuse the
# v1 type codes, so only the transaction-identity layer differs)
MARIADB_GTID_EVENT = 162
MARIADB_GTID_LIST_EVENT = 163

# column type codes (public enum_field_types)
T_DECIMAL, T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 0, 1, 2, 3, 4, 5
T_NULL, T_TIMESTAMP, T_LONGLONG, T_INT24, T_DATE, T_TIME = 6, 7, 8, 9, 10, 11
T_DATETIME, T_YEAR = 12, 13
T_VARCHAR, T_BIT = 15, 16
T_TIMESTAMP2, T_DATETIME2, T_TIME2 = 17, 18, 19
T_JSON, T_NEWDECIMAL, T_ENUM, T_SET = 245, 246, 247, 248
T_TINY_BLOB, T_MEDIUM_BLOB, T_LONG_BLOB, T_BLOB = 249, 250, 251, 252
T_VAR_STRING, T_STRING, T_GEOMETRY = 253, 254, 255

_HEADER_LEN = 19
# NEWDECIMAL: bytes needed for 0..9 leftover decimal digits
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


class BinlogError(ValueError):
    pass


class _Reader:
    """Little cursor over bytes with the binlog primitive reads."""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b, self.i = b, i

    def remaining(self) -> int:
        return len(self.b) - self.i

    def bytes(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise BinlogError("truncated event body")
        out = self.b[self.i:self.i + n]
        self.i += n
        return out

    def u8(self) -> int:
        return self.bytes(1)[0]

    def u16(self) -> int:
        return struct.unpack_from("<H", self.bytes(2))[0]

    def u24(self) -> int:
        b = self.bytes(3)
        return b[0] | b[1] << 8 | b[2] << 16

    def u32(self) -> int:
        return struct.unpack_from("<I", self.bytes(4))[0]

    def u48(self) -> int:
        b = self.bytes(6)
        return (b[0] | b[1] << 8 | b[2] << 16 | b[3] << 24
                | b[4] << 32 | b[5] << 40)

    def u64(self) -> int:
        return struct.unpack_from("<Q", self.bytes(8))[0]

    def lenenc(self) -> int:
        """length-encoded integer (public wire primitive)."""
        first = self.u8()
        if first < 0xFB:
            return first
        if first == 0xFC:
            return self.u16()
        if first == 0xFD:
            return self.u24()
        if first == 0xFE:
            return self.u64()
        raise BinlogError(f"bad lenenc prefix {first:#x}")

    def be(self, n: int) -> int:
        return int.from_bytes(self.bytes(n), "big")


@dataclass
class TableMap:
    """Decoded TABLE_MAP_EVENT: the schema row events are applied with."""
    table_id: int
    schema: str
    table: str
    col_types: list[int]
    col_meta: list[int]
    null_bitmap: bytes
    # from optional metadata (binlog_row_metadata >= MINIMAL, MySQL 8):
    # bit i set => i-th NUMERIC column is unsigned
    signedness: list[bool] = field(default_factory=list)
    col_names: list[str] = field(default_factory=list)
    # per-column unsigned flags, precomputed once (unsigned() rescans
    # col_types per call -- O(cols^2) per ROW in the decode hot loop)
    uflags: list[bool] = field(default_factory=list)

    def unsigned(self, col_idx: int) -> bool:
        """Signedness of a numeric column. The classic binlog does NOT
        carry it (canal reads it from the live table schema,
        river/sync.go:243-276); MySQL 8's SIGNEDNESS optional-metadata
        TLV does, and we honor it when present."""
        if not self.signedness:
            return False
        n = -1
        for i, t in enumerate(self.col_types):
            if t in (T_TINY, T_SHORT, T_INT24, T_LONG, T_LONGLONG,
                     T_FLOAT, T_DOUBLE, T_NEWDECIMAL, T_DECIMAL):
                n += 1
            if i == col_idx:
                return n >= 0 and n < len(self.signedness) \
                    and self.signedness[n]
        return False


@dataclass
class BinlogEvent:
    """One decoded event. `rows` is populated for row events:
    - insert: [{'after': {...}}, ...]
    - delete: [{'before': {...}}, ...]
    - update: [{'before': {...}, 'after': {...}}, ...]
    Column keys are names when the TABLE_MAP carried them (MySQL 8
    binlog_row_metadata=FULL), else positional '@0', '@1', ... (the
    classic binlog omits names -- same contract mysqlbinlog prints)."""
    type_code: int
    timestamp: int
    server_id: int
    log_pos: int
    op: str | None = None          # insert/update/delete for row events
    schema: str | None = None
    table: str | None = None
    rows: list[dict] = field(default_factory=list)
    query: str | None = None       # QUERY_EVENT text (DDL, BEGIN)
    next_file: str | None = None   # ROTATE_EVENT
    xid: int | None = None
    gtid: str | None = None        # GTID_LOG_EVENT ("uuid:gno")
    gtid_set: str | None = None    # PREVIOUS_GTIDS_LOG_EVENT (text form)


def _decode_packed_meta(col_types: list[int], meta: bytes) -> list[int]:
    """Per-column metadata: the TABLE_MAP packs a variable number of
    bytes per column depending on its type (public table-map layout)."""
    r = _Reader(meta)
    out: list[int] = []
    for t in col_types:
        if t in (T_FLOAT, T_DOUBLE, T_BLOB, T_TINY_BLOB, T_MEDIUM_BLOB,
                 T_LONG_BLOB, T_JSON, T_GEOMETRY):
            out.append(r.u8())
        elif t in (T_VARCHAR, T_VAR_STRING, T_BIT, T_NEWDECIMAL, T_DECIMAL):
            out.append(r.u16())
        elif t in (T_STRING, T_ENUM, T_SET):
            # two bytes: real type + length, packed (public quirk: the
            # upper length bits hide in byte0's 0x30 mask, inverted)
            b0, b1 = r.u8(), r.u8()
            out.append(b0 << 8 | b1)
        elif t in (T_TIMESTAMP2, T_DATETIME2, T_TIME2):
            out.append(r.u8())
        else:
            out.append(0)
    return out


def _string_real_type_len(meta: int) -> tuple[int, int]:
    """Unpack MYSQL_TYPE_STRING's 2-byte metadata into (real_type, max_len)."""
    b0, b1 = meta >> 8, meta & 0xFF
    if b0 in (T_ENUM, T_SET):
        return b0, b1
    if b0 == 0:
        return T_STRING, b1
    # CHAR(n): length's high bits are folded into b0 (xor 0x30 trick)
    return T_STRING, (((b0 & 0x30) ^ 0x30) << 4) | b1


def _decimal_bin_size(precision: int, scale: int) -> int:
    intg = precision - scale
    return (intg // 9) * 4 + _DIG2BYTES[intg % 9] \
        + (scale // 9) * 4 + _DIG2BYTES[scale % 9]


def _decode_newdecimal(raw: bytes, precision: int, scale: int) -> Decimal:
    """NEWDECIMAL: sign-flipped big-endian 9-digit groups (public
    my_decimal binary format; same layout the server stores)."""
    positive = bool(raw[0] & 0x80)
    b = bytearray(raw)
    b[0] ^= 0x80
    if not positive:
        b = bytearray(x ^ 0xFF for x in b)
    r = _Reader(bytes(b))
    intg = precision - scale
    digits = ""
    first = intg % 9
    if first:
        digits += str(r.be(_DIG2BYTES[first]))
    for _ in range(intg // 9):
        digits += str(r.be(4)).zfill(9)
    digits = digits.lstrip("0") or "0"
    frac = ""
    for _ in range(scale // 9):
        frac += str(r.be(4)).zfill(9)
    last = scale % 9
    if last:
        frac += str(r.be(_DIG2BYTES[last])).zfill(last)
    s = digits + ("." + frac if frac else "")
    return Decimal(("" if positive else "-") + s)


def _frac_micro(r: _Reader, fsp: int) -> int:
    """Fractional seconds: ceil(fsp/2) big-endian bytes scaled to micros."""
    n = (fsp + 1) // 2
    if n == 0:
        return 0
    v = r.be(n)
    return v * 10 ** (6 - 2 * n)


def _decode_datetime2(r: _Reader, fsp: int) -> datetime.datetime | None:
    # 5 bytes big-endian: sign(1) year_month(17) day(5) hour(5) min(6) sec(6)
    v = r.be(5)
    micro = _frac_micro(r, fsp)
    ym = (v >> 22) & 0x1FFFF
    year, month = ym // 13, ym % 13
    day = (v >> 17) & 0x1F
    hour, minute, sec = (v >> 12) & 0x1F, (v >> 6) & 0x3F, v & 0x3F
    if year == 0 or month == 0 or day == 0:
        return None  # zero-date -> NULL (the sink guard's contract)
    return datetime.datetime(year, month, day, hour, minute, sec, micro)


def _decode_time2(r: _Reader, fsp: int) -> datetime.timedelta:
    # The whole 3+ceil(fsp/2) bytes are ONE big-endian two's-complement
    # number biased at 0x800000<<(8*frac_bytes): a negative TIME negates
    # the packed (int<<frac) value as a unit, so the fraction bytes are
    # NOT an independent unsigned field (e.g. -00:00:01.50 at fsp=2 is
    # 7F FF FE CE -- reading the fraction byte alone would yield 0xCE
    # "hundredths" and a wrong sign-split).
    frac_bytes = (fsp + 1) // 2
    v = r.be(3 + frac_bytes) - (0x800000 << (8 * frac_bytes))
    neg = v < 0
    if neg:
        v = -v
    frac = v & ((1 << (8 * frac_bytes)) - 1) if frac_bytes else 0
    packed = v >> (8 * frac_bytes)
    micro = frac * 10 ** (6 - 2 * frac_bytes) if frac_bytes else 0
    hour, minute, sec = (packed >> 12) & 0x3FF, (packed >> 6) & 0x3F, \
        packed & 0x3F
    td = datetime.timedelta(hours=hour, minutes=minute, seconds=sec,
                            microseconds=micro)
    return -td if neg else td


def _decode_json_opaque(ft: int, raw: bytes) -> Any:
    """Typed opaque binary-JSON values: the server stores DECIMAL /
    DATE / TIME / DATETIME inside JSON documents as opaque
    (field_type, payload) pairs -- JSON_OBJECT('d', CAST(x AS
    DECIMAL)), CAST(d AS JSON), etc. The temporal payload is the
    packed-int64 in-memory form (my_packed_time: ((ymd<<17|hms)<<24)
    | microseconds), the decimal payload is (precision, scale,
    NEWDECIMAL binary) -- the same surface go-mysql's jsonbinary
    decoder covers. Unknown opaque types surface as hex, never drop."""
    if ft in (T_NEWDECIMAL, T_DECIMAL) and len(raw) >= 2:
        precision, scale = raw[0], raw[1]
        need = _decimal_bin_size(precision, scale)
        if len(raw) >= 2 + need:
            return _decode_newdecimal(raw[2:2 + need], precision, scale)
    if ft in (T_DATE, T_DATETIME, T_TIMESTAMP, T_TIME) and len(raw) >= 8:
        v = int.from_bytes(raw[:8], "little", signed=True)
        neg = v < 0
        if neg:
            v = -v
        intpart = v >> 24
        micro = v & 0xFFFFFF
        minute, sec = (intpart >> 6) & 0x3F, intpart & 0x3F
        if ft == T_TIME:
            # TIME hours span 0..838 -> 10 bits
            td = datetime.timedelta(hours=(intpart >> 12) & 0x3FF,
                                    minutes=minute, seconds=sec,
                                    microseconds=micro)
            return -td if neg else td
        hour = (intpart >> 12) & 0x1F   # 5 bits; bits 17+ are ymd
        ymd = intpart >> 17
        ym = ymd >> 5
        year, month, day = ym // 13, ym % 13, ymd & 0x1F
        if year == 0 or month == 0 or day == 0:
            return None  # zero-date -> NULL, the module's convention
        if ft == T_DATE:
            return datetime.date(year, month, day)
        return datetime.datetime(year, month, day, hour, minute, sec,
                                 micro)
    return {"_opaque_type": ft, "_hex": raw.hex()}


def _decode_json_value(b: bytes) -> Any:
    """MySQL binary JSON (the public JSONB-like format): type byte +
    small/large objects/arrays with offset tables, inlined small
    scalars, 7-bit varint string lengths, typed opaque literals."""
    if not b:
        return None

    def var_len(buf: bytes, i: int) -> tuple[int, int]:
        ln, shift = 0, 0
        while True:
            x = buf[i]
            i += 1
            ln |= (x & 0x7F) << shift
            if not x & 0x80:
                return ln, i
            shift += 7

    def value(t: int, buf: bytes) -> Any:
        if t in (0x00, 0x01, 0x02, 0x03):  # object/array, small/large
            large = t in (0x01, 0x03)
            w = 4 if large else 2
            rd = (lambda i: int.from_bytes(buf[i:i + w], "little"))
            count, i = rd(0), w
            i += w  # total size
            is_obj = t in (0x00, 0x01)
            keys = []
            if is_obj:
                for k in range(count):
                    ko = rd(i)
                    klen = int.from_bytes(buf[i + w:i + w + 2], "little")
                    keys.append(buf[ko:ko + klen].decode("utf-8"))
                    i += w + 2
            vals = []
            for _ in range(count):
                vt = buf[i]
                inlined = vt in (0x04, 0x05, 0x06) or \
                    (large and vt in (0x07, 0x08))
                if inlined:
                    raw = buf[i + 1:i + 1 + w]
                    if vt == 0x04:
                        lit = raw[0]
                        vals.append(None if lit == 0 else lit == 1)
                    elif vt == 0x05:
                        vals.append(int.from_bytes(raw[:2], "little",
                                                   signed=True))
                    elif vt == 0x06:
                        vals.append(int.from_bytes(raw[:2], "little"))
                    elif vt == 0x07:
                        vals.append(int.from_bytes(raw[:4], "little",
                                                   signed=True))
                    else:
                        vals.append(int.from_bytes(raw[:4], "little"))
                else:
                    # the type byte lives in the ENTRY; the offset
                    # points straight at the value's data
                    off = rd(i + 1)
                    vals.append(value(vt, buf[off:]))
                i += 1 + w
            return dict(zip(keys, vals)) if is_obj else vals
        if t == 0x04:
            lit = buf[0]
            return None if lit == 0 else lit == 1
        if t == 0x05:
            return int.from_bytes(buf[:2], "little", signed=True)
        if t == 0x06:
            return int.from_bytes(buf[:2], "little")
        if t == 0x07:
            return int.from_bytes(buf[:4], "little", signed=True)
        if t == 0x08:
            return int.from_bytes(buf[:4], "little")
        if t == 0x09:
            return int.from_bytes(buf[:8], "little", signed=True)
        if t == 0x0A:
            return int.from_bytes(buf[:8], "little")
        if t == 0x0B:
            return struct.unpack("<d", buf[:8])[0]
        if t == 0x0C:
            ln, i = var_len(buf, 0)
            return buf[i:i + ln].decode("utf-8")
        if t == 0x0F:  # opaque: (field type u8, varlen, payload)
            ln, i = var_len(buf, 1)
            return _decode_json_opaque(buf[0], buf[i:i + ln])
        raise BinlogError(f"unknown binary-JSON type {t:#x}")

    return value(b[0], b[1:])


# JSON partial updates (binlog_row_value_options=PARTIAL_JSON, MySQL
# WL#2955): a PARTIAL_UPDATE_ROWS after-image stores changed JSON
# columns as a Json_diff_vector instead of the full document.
DIFF_REPLACE, DIFF_INSERT, DIFF_REMOVE = 0, 1, 2


@dataclass
class _JsonPartial:
    """Marker for an after-image JSON column decoded as diffs; resolved
    against the before-image by _merge_partial_after before the row is
    surfaced (consumers only ever see full documents)."""
    diffs: list


def _decode_json_diffs(b: bytes) -> list[tuple[int, str, Any]]:
    """Json_diff_vector binary layout (sql/json_diff.cc
    write_binary/read_binary; go-mysql decodeJsonPartialBinary agrees):
    repeated (operation u8, lenenc path-length + path,
    [lenenc value-length + binary-JSON value] unless REMOVE)."""
    r = _Reader(b)
    diffs: list[tuple[int, str, Any]] = []
    while r.remaining() > 0:
        op = r.u8()
        if op not in (DIFF_REPLACE, DIFF_INSERT, DIFF_REMOVE):
            raise BinlogError(f"unknown JSON diff operation {op}")
        path = r.bytes(r.lenenc()).decode("utf-8")
        value = None
        if op != DIFF_REMOVE:
            value = _decode_json_value(r.bytes(r.lenenc()))
        diffs.append((op, path, value))
    return diffs


def _parse_json_path(path: str) -> list[Any]:
    """A Json_path as the server serializes into diffs: '$' followed by
    .member / ."quoted member" / [N] legs. Diff paths are always
    concrete -- no wildcards or ranges (sql/json_diff.cc only emits
    seekable paths)."""
    if not path.startswith("$"):
        raise BinlogError(f"bad JSON path {path!r}")
    legs: list[Any] = []
    i = 1
    while i < len(path):
        c = path[i]
        if c == ".":
            i += 1
            if i < len(path) and path[i] == '"':
                j = i + 1
                while j < len(path) and path[j] != '"':
                    j += 2 if path[j] == "\\" else 1
                if j >= len(path):
                    raise BinlogError(f"unterminated quote in {path!r}")
                legs.append(json.loads(path[i:j + 1]))
                i = j + 1
            else:
                j = i
                while j < len(path) and path[j] not in ".[":
                    j += 1
                if j == i:
                    raise BinlogError(f"empty member leg in {path!r}")
                legs.append(path[i:j])
                i = j
        elif c == "[":
            j = path.find("]", i)
            if j < 0 or not path[i + 1:j].isdigit():
                raise BinlogError(f"bad array leg in {path!r}")
            legs.append(int(path[i + 1:j]))
            i = j + 1
        else:
            raise BinlogError(f"bad JSON path leg at {i} in {path!r}")
    return legs


def _json_seek(container: Any, leg: Any, path: str) -> Any:
    """One existing path leg; raising beats silently fabricating a
    document that diverges from the server's."""
    if isinstance(leg, int):
        if not isinstance(container, list) or leg >= len(container):
            raise BinlogError(f"JSON diff path {path!r} does not "
                              f"resolve in the before-image")
        return container[leg]
    if not isinstance(container, dict) or leg not in container:
        raise BinlogError(f"JSON diff path {path!r} does not "
                          f"resolve in the before-image")
    return container[leg]


def _apply_json_diffs(doc: Any, diffs: list[tuple[int, str, Any]]) -> Any:
    """Replay a diff vector against the before-image document --
    the same semantics as the server's apply_json_diff
    (sql/json_diff.cc): REPLACE needs an existing target, INSERT adds
    a new member or splices into an array (past-the-end appends, as
    JSON_ARRAY_INSERT does), REMOVE deletes an existing target."""
    doc = copy.deepcopy(doc)
    for op, path, value in diffs:
        legs = _parse_json_path(path)
        if not legs:
            if op != DIFF_REPLACE:
                raise BinlogError(f"JSON diff op {op} at root path")
            doc = value
            continue
        parent = doc
        for leg in legs[:-1]:
            parent = _json_seek(parent, leg, path)
        leg = legs[-1]
        if op == DIFF_REPLACE:
            _json_seek(parent, leg, path)
            parent[leg] = value
        elif op == DIFF_INSERT:
            if isinstance(parent, list) and isinstance(leg, int):
                parent.insert(leg, value)
            elif isinstance(parent, dict) and not isinstance(leg, int):
                if leg in parent:
                    raise BinlogError(f"JSON diff INSERT over existing "
                                      f"member {path!r}")
                parent[leg] = value
            else:
                raise BinlogError(f"JSON diff INSERT leg/container "
                                  f"mismatch at {path!r}")
        else:  # DIFF_REMOVE
            _json_seek(parent, leg, path)
            if isinstance(parent, list):
                parent.pop(leg)
            else:
                del parent[leg]
    return doc


def _merge_partial_after(before: dict[str, Any],
                         after: dict[str, Any]) -> dict[str, Any]:
    """Resolve _JsonPartial columns of a PARTIAL_UPDATE after-image
    against the before-image, so downstream only ever sees full
    documents. Diffs without a before-image document (binlog_row_image
    != FULL) are unreconstructable -- refuse, don't guess."""
    out: dict[str, Any] = {}
    for k, v in after.items():
        if isinstance(v, _JsonPartial):
            if k not in before or before[k] is None:
                raise BinlogError(
                    f"partial-JSON update on column {k!r} without a "
                    f"before-image document (binlog_row_image must be "
                    f"FULL to reconstruct after-images from diffs)")
            out[k] = _apply_json_diffs(before[k], v.diffs)
        else:
            out[k] = v
    return out


def _decode_value(r: _Reader, t: int, meta: int, unsigned: bool,
                  as_json_diffs: bool = False) -> Any:
    """One column value from a row image (public row-event encoding)."""
    if t == T_TINY:
        v = r.u8()
        return v if unsigned else (v - 256 if v >= 128 else v)
    if t == T_SHORT:
        v = r.u16()
        return v if unsigned else (v - 65536 if v >= 32768 else v)
    if t == T_INT24:
        v = r.u24()
        return v if unsigned else (v - (1 << 24) if v >= (1 << 23) else v)
    if t == T_LONG:
        v = r.u32()
        return v if unsigned else struct.unpack("<i", struct.pack("<I", v))[0]
    if t == T_LONGLONG:
        v = r.u64()
        return v if unsigned else struct.unpack("<q", struct.pack("<Q", v))[0]
    if t == T_FLOAT:
        return struct.unpack("<f", r.bytes(4))[0]
    if t == T_DOUBLE:
        return struct.unpack("<d", r.bytes(8))[0]
    if t == T_NEWDECIMAL:
        # metadata order is (precision, scale) as two u8s -> LE u16
        precision, scale = meta & 0xFF, (meta >> 8) & 0xFF
        return _decode_newdecimal(
            r.bytes(_decimal_bin_size(precision, scale)), precision, scale)
    if t == T_VARCHAR or t == T_VAR_STRING:
        n = r.u16() if meta > 255 else r.u8()
        return r.bytes(n).decode("utf-8", "replace")
    if t in (T_STRING, T_ENUM, T_SET):
        real, length = (_string_real_type_len(meta)
                        if t == T_STRING else (t, meta & 0xFF))
        if real == T_ENUM:
            return r.be(1) if length == 1 else r.u16()  # 1-based index
        if real == T_SET:
            return int.from_bytes(r.bytes(length), "little")  # bitmask
        n = r.u16() if length > 255 else r.u8()
        return r.bytes(n).decode("utf-8", "replace")
    if t in (T_BLOB, T_TINY_BLOB, T_MEDIUM_BLOB, T_LONG_BLOB, T_GEOMETRY):
        n = int.from_bytes(r.bytes(meta), "little")
        return r.bytes(n)
    if t == T_JSON:
        n = int.from_bytes(r.bytes(meta), "little")
        raw = r.bytes(n)
        if as_json_diffs:
            return _JsonPartial(_decode_json_diffs(raw))
        return _decode_json_value(raw)
    if t == T_DATE:
        v = r.u24()
        day, month, year = v & 0x1F, (v >> 5) & 0x0F, v >> 9
        if year == 0 or month == 0 or day == 0:
            return None
        return datetime.date(year, month, day)
    if t == T_DATETIME2:
        return _decode_datetime2(r, meta)
    if t == T_TIMESTAMP2:
        secs = r.be(4)
        micro = _frac_micro(r, meta)
        if secs == 0:
            return None  # zero-timestamp
        return datetime.datetime.fromtimestamp(
            secs, tz=datetime.timezone.utc).replace(tzinfo=None) \
            + datetime.timedelta(microseconds=micro)
    if t == T_TIME2:
        return _decode_time2(r, meta)
    if t == T_YEAR:
        v = r.u8()
        return 0 if v == 0 else 1900 + v
    if t == T_BIT:
        nbits = (meta >> 8) * 8 + (meta & 0xFF)
        return int.from_bytes(r.bytes((nbits + 7) // 8), "big")
    raise BinlogError(f"unsupported column type {t}")


def _bit(bm: bytes, i: int) -> bool:
    return bool(bm[i // 8] & (1 << (i % 8)))


def _decode_row_image(r: _Reader, tm: TableMap, present_idx: list[int],
                      partial: bool = False) -> dict[str, Any]:
    """One row image (present_idx: indices of columns in the image,
    computed ONCE per event by the caller -- this runs per row in the
    decode hot loop). `partial=True` only on a PARTIAL_UPDATE_ROWS
    after-image (WL#2955): it is prefixed by a lenenc value_options
    and -- when the PARTIAL_JSON_UPDATES bit is set -- a partial_bits
    bitmap sized over ALL of the table's JSON columns; bits are
    consumed in order by every JSON column present in the image (NULL
    ones included), the interop convention go-mysql decodes."""
    partial_bits = b""
    if partial:
        value_options = r.lenenc()
        if value_options & 1:  # PARTIAL_JSON_UPDATES
            n_json = sum(1 for t in tm.col_types if t == T_JSON)
            partial_bits = r.bytes((n_json + 7) // 8)
    null_bm = r.bytes((len(present_idx) + 7) // 8)
    out: dict[str, Any] = {}
    json_seen = 0
    names, types, metas, uflags = (tm.col_names, tm.col_types,
                                   tm.col_meta, tm.uflags)
    for j, i in enumerate(present_idx):
        name = names[i] if i < len(names) else f"@{i}"
        as_diffs = False
        if partial_bits and types[i] == T_JSON:
            as_diffs = _bit(partial_bits, json_seen)
            json_seen += 1
        if null_bm[j >> 3] & (1 << (j & 7)):
            out[name] = None
        else:
            out[name] = _decode_value(r, types[i], metas[i],
                                      uflags[i], as_diffs)
    return out


def _parse_table_map(body: _Reader) -> TableMap:
    table_id = body.u48()
    body.u16()  # flags
    schema = body.bytes(body.u8()).decode()
    body.u8()   # trailing 0
    table = body.bytes(body.u8()).decode()
    body.u8()   # trailing 0
    n = body.lenenc()
    col_types = list(body.bytes(n))
    meta_len = body.lenenc()
    col_meta = _decode_packed_meta(col_types, body.bytes(meta_len))
    null_bm = body.bytes((n + 7) // 8)
    tm = TableMap(table_id, schema, table, col_types, col_meta, null_bm)
    # optional metadata TLVs (MySQL 8 binlog_row_metadata): 1=SIGNEDNESS
    # (bitmap over numeric columns, MSB-first), 4=COLUMN_NAME
    while body.remaining() >= 2:
        t = body.u8()
        ln = body.lenenc()
        val = body.bytes(ln)
        if t == 1:
            bits = []
            for i, byte in enumerate(val):
                for k in range(8):
                    bits.append(bool(byte & (0x80 >> k)))
            tm.signedness = bits
        elif t == 4:
            rr = _Reader(val)
            names = []
            while rr.remaining():
                names.append(rr.bytes(rr.lenenc()).decode())
            tm.col_names = names
    tm.uflags = [tm.unsigned(i) for i in range(len(col_types))]
    return tm


def _sid_to_uuid(sid: bytes) -> str:
    h = sid.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def decode_gtid_set(b: bytes) -> str:
    """The SID-block GTID-set encoding (PREVIOUS_GTIDS body, and the
    COM_BINLOG_DUMP_GTID payload): n_sids u64, then per sid 16 UUID
    bytes + n_intervals u64 + (start u64, stop u64) pairs with stop
    EXCLUSIVE -- rendered to the canonical text form
    'uuid:1-5:7,uuid2:3'."""
    r = _Reader(b)
    parts = []
    for _ in range(r.u64()):
        uuid = _sid_to_uuid(r.bytes(16))
        ivs = []
        for _ in range(r.u64()):
            start, stop = r.u64(), r.u64()
            ivs.append(str(start) if stop == start + 1
                       else f"{start}-{stop - 1}")
        parts.append(uuid + ":" + ":".join(ivs))
    return ",".join(parts)


def encode_gtid_set(text: str) -> bytes:
    """Inverse of decode_gtid_set: 'uuid:1-5:7' -> SID blocks. The
    replica sends this in COM_BINLOG_DUMP_GTID to say what it already
    has (master.info's GTID form)."""
    out = bytearray()
    sids = [p for p in text.replace(" ", "").split(",") if p]
    out += struct.pack("<Q", len(sids))
    for part in sids:
        uuid, *ivs = part.split(":")
        if not ivs:
            raise BinlogError(f"GTID set entry without intervals: {part!r}")
        out += bytes.fromhex(uuid.replace("-", ""))
        out += struct.pack("<Q", len(ivs))
        for iv in ivs:
            if "-" in iv:
                a, b_ = iv.split("-")
                out += struct.pack("<QQ", int(a), int(b_) + 1)
            else:
                out += struct.pack("<QQ", int(iv), int(iv) + 1)
    return bytes(out)


def fde_checksummed(fde_body: bytes) -> bool:
    """Whether a FORMAT_DESCRIPTION event declares CRC32 checksums.
    Layout: binlog_version(2) server_version(50) ts(4) header_len(1)
    + post-header array [+ checksum_alg(1) + crc32(4)] -- the alg byte
    exists only for server versions >= 5.6.1. Shared by the file
    decoder and the replication tailer (mysql_repl.py), which must
    know whether streamed ROTATE events carry a trailing CRC."""
    # tolerant decode: a corrupt version string must raise BinlogError
    # downstream (or parse as 0.0.0), never a stray UnicodeDecodeError
    ver = fde_body[2:52].split(b"\x00")[0].decode("utf-8", "replace")
    parts = tuple(int("".join(ch for ch in p if ch.isdigit()) or 0)
                  for p in ver.split(".")[:3])
    if parts < (5, 6, 1):
        return False
    if len(fde_body) < 5:
        raise BinlogError("FORMAT_DESCRIPTION body too short")
    alg = fde_body[-5]
    if alg not in (0, 1):
        raise BinlogError(f"unsupported checksum alg {alg}")
    return alg == 1


# TRANSACTION_PAYLOAD_EVENT (binlog_transaction_compression=ON,
# MySQL WL#3549): the transaction's events travel wrapped -- and
# usually zstd-compressed -- inside one envelope event.
_PAYLOAD_COMPRESSION_ZSTD = 0
_PAYLOAD_COMPRESSION_NONE = 255


def _decompress_payload(body: _Reader) -> bytes:
    """TRANSACTION_PAYLOAD TLV header (libbinlogevents
    control_events.cpp / codecs): repeated (lenenc type, lenenc length,
    value) fields -- 1=payload size, 2=compression type,
    3=uncompressed size -- until the end mark (type 0); the raw payload
    follows the end mark. Returns the decompressed inner event stream.
    zstd needs the optional 'zstandard' module; without it the error
    names both the pip package and the server knob."""
    comp = _PAYLOAD_COMPRESSION_NONE
    usize: int | None = None
    while True:
        if body.remaining() == 0:
            raise BinlogError("TRANSACTION_PAYLOAD without an end mark")
        ftype = body.lenenc()
        if ftype == 0:  # OTW_PAYLOAD_HEADER_END_MARK
            payload = body.bytes(body.remaining())
            break
        val = body.bytes(body.lenenc())
        if ftype == 2:  # OTW_PAYLOAD_COMPRESSION_TYPE_FIELD
            comp = int.from_bytes(val, "little")
        elif ftype == 3:  # OTW_PAYLOAD_UNCOMPRESSED_SIZE_FIELD
            usize = int.from_bytes(val, "little")
        # ftype 1 (payload size) is redundant with the end-mark slice
    if comp == _PAYLOAD_COMPRESSION_NONE:
        return payload
    if comp == _PAYLOAD_COMPRESSION_ZSTD:
        out: bytes | None = None
        try:
            import zstandard
            out = zstandard.ZstdDecompressor().decompress(
                payload, max_output_size=usize if usize else 1 << 30)
        except ImportError:
            # pyarrow (a hard dependency of this engine anyway)
            # bundles libzstd; its codec needs the exact output size,
            # which the envelope's uncompressed-size field carries
            # (the server always writes it).
            try:
                import pyarrow
            except ImportError:
                raise BinlogError(
                    "TRANSACTION_PAYLOAD is zstd-compressed and "
                    "neither 'zstandard' nor 'pyarrow' is available "
                    "-- pip install either, or set "
                    "binlog_transaction_compression=OFF on the "
                    "server") from None
            if usize is None:
                raise BinlogError(
                    "zstd TRANSACTION_PAYLOAD without an "
                    "uncompressed-size field -- pyarrow's codec needs "
                    "the exact size; install 'zstandard' for "
                    "streaming decompression") from None
            out = bytes(pyarrow.Codec("zstd").decompress(
                payload, decompressed_size=usize))
        if usize is not None and len(out) != usize:
            raise BinlogError(
                f"zstd payload decompressed to {len(out)} bytes, "
                f"header said {usize}")
        return out
    raise BinlogError(f"unknown payload compression type {comp}")


def iter_binlog_events(data: bytes, *,
                       verify_checksum: bool = True,
                       tolerate_truncation: bool = False,
                       ) -> Iterator[BinlogEvent]:
    """Decode a binlog byte stream (file contents including the magic,
    or a raw event stream without it) into BinlogEvents. TABLE_MAP
    state is tracked internally, exactly as a replica must.
    TRANSACTION_PAYLOAD envelopes are opened in place: their inner
    events come out of this iterator as ordinary events (inner frames
    are never checksummed -- WL#3549 -- and share the file's TABLE_MAP
    state).

    `tolerate_truncation=True` stops cleanly at the last COMPLETE event
    instead of raising -- an actively-written or partially-shipped file
    yields its complete prefix (the server appends whole events, so the
    prefix is consistent). A size field SMALLER than the header is
    corruption, not truncation, and always raises."""
    pos = 4 if data[:4] == BINLOG_MAGIC else 0
    checksummed = False
    tables: dict[int, TableMap] = {}
    while pos + _HEADER_LEN <= len(data):
        ts, tc, sid, size, log_pos, _flags = struct.unpack_from(
            "<IBIIIH", data, pos)
        if size < _HEADER_LEN:
            raise BinlogError(f"corrupt event size {size} at {pos}")
        if pos + size > len(data):
            if tolerate_truncation:
                return
            raise BinlogError(f"truncated event at {pos}")
        body_b = data[pos + _HEADER_LEN:pos + size]
        if tc == FORMAT_DESCRIPTION_EVENT:
            checksummed = fde_checksummed(body_b)
        ev_crc_ok = True
        if checksummed:
            if len(body_b) < 4:
                # a mutated size field can shrink the body below the
                # 4-byte CRC trailer; that's corruption, and it must
                # surface as the decoder's clean error, not a raw
                # struct.error (hypothesis-found)
                raise BinlogError(
                    f"corrupt event at {pos}: body too short for "
                    f"its CRC32 trailer ({len(body_b)} bytes)")
            want = struct.unpack("<I", body_b[-4:])[0]
            got = zlib.crc32(data[pos:pos + size - 4])
            ev_crc_ok = want == got
            if verify_checksum and not ev_crc_ok:
                raise BinlogError(
                    f"CRC32 mismatch at {pos} (event type {tc})")
            body_b = body_b[:-4]
        body = _Reader(body_b)
        ev = BinlogEvent(tc, ts, sid, log_pos)
        if tc == TRANSACTION_PAYLOAD_EVENT:
            inner = _decompress_payload(body)
            ipos = 0
            while ipos + _HEADER_LEN <= len(inner):
                its, itc, isid, isize, ilog, _ = struct.unpack_from(
                    "<IBIIIH", inner, ipos)
                if isize < _HEADER_LEN or ipos + isize > len(inner):
                    raise BinlogError(
                        f"corrupt payload frame at inner offset {ipos}")
                if itc == TRANSACTION_PAYLOAD_EVENT:
                    raise BinlogError("nested TRANSACTION_PAYLOAD")
                ibody = _Reader(inner[ipos + _HEADER_LEN:ipos + isize])
                iev = BinlogEvent(itc, its, isid, ilog)
                _decode_body_guarded(itc, ibody, tables, iev,
                                     f"payload frame at {ipos}")
                yield iev
                ipos += isize
            if ipos != len(inner):
                raise BinlogError("trailing bytes in payload envelope")
        else:
            _decode_body_guarded(tc, body, tables, ev, f"offset {pos}")
            yield ev
        pos += size


def _decode_body_guarded(tc: int, body: _Reader,
                         tables: dict[int, TableMap],
                         ev: BinlogEvent, where: str) -> None:
    """Corrupt-bytes contract: whatever a malformed body trips inside
    the decoders (an impossible date, a bad utf-8 name, an index past
    a JSON offset table), the caller sees ONE exception type --
    BinlogError -- with the event position. The decoder runs inside
    executor tasks on untrusted bytes; stray ValueErrors would surface
    as inscrutable task failures."""
    try:
        _decode_event_body(tc, body, tables, ev)
    except BinlogError:
        raise
    except (ValueError, IndexError, KeyError, OverflowError,
            UnicodeDecodeError, struct.error) as e:
        raise BinlogError(
            f"corrupt event body ({where}, type {tc}): {e}") from e


def _decode_event_body(tc: int, body: _Reader,
                       tables: dict[int, TableMap],
                       ev: BinlogEvent) -> None:
    """Decode one event's body into `ev` (TABLE_MAP state shared via
    `tables`). Framing, checksums, and payload envelopes are the
    caller's job."""
    if tc == TABLE_MAP_EVENT:
        tm = _parse_table_map(body)
        tables[tm.table_id] = tm
    elif tc in (WRITE_ROWS_EVENT, UPDATE_ROWS_EVENT, DELETE_ROWS_EVENT,
                WRITE_ROWS_EVENT_V1, UPDATE_ROWS_EVENT_V1,
                DELETE_ROWS_EVENT_V1, PARTIAL_UPDATE_ROWS_EVENT):
        table_id = body.u48()
        body.u16()  # flags
        if tc not in (WRITE_ROWS_EVENT_V1, UPDATE_ROWS_EVENT_V1,
                      DELETE_ROWS_EVENT_V1):
            extra = body.u16()   # v2 var-header (incl. event 39)
            if extra > 2:
                body.bytes(extra - 2)
        tm = tables.get(table_id)
        if tm is None:
            raise BinlogError(f"row event before TABLE_MAP "
                              f"(table id {table_id})")
        ncols = body.lenenc()
        bm_len = (ncols + 7) // 8
        present1 = body.bytes(bm_len)
        is_update = tc in (UPDATE_ROWS_EVENT, UPDATE_ROWS_EVENT_V1,
                           PARTIAL_UPDATE_ROWS_EVENT)
        partial = tc == PARTIAL_UPDATE_ROWS_EVENT
        present2 = body.bytes(bm_len) if is_update else present1
        idx1 = [i for i in range(len(tm.col_types))
                if _bit(present1, i)]
        idx2 = (idx1 if present2 is present1 else
                [i for i in range(len(tm.col_types))
                 if _bit(present2, i)])
        ev.schema, ev.table = tm.schema, tm.table
        ev.op = ("insert" if tc in (WRITE_ROWS_EVENT,
                                    WRITE_ROWS_EVENT_V1)
                 else "delete" if tc in (DELETE_ROWS_EVENT,
                                         DELETE_ROWS_EVENT_V1)
                 else "update")
        while body.remaining() > 0:
            mark = body.i
            if is_update:
                before = _decode_row_image(body, tm, idx1)
                after = _decode_row_image(body, tm, idx2,
                                          partial=partial)
                if partial:
                    after = _merge_partial_after(before, after)
                ev.rows.append({"before": before, "after": after})
            elif ev.op == "insert":
                ev.rows.append(
                    {"after": _decode_row_image(body, tm, idx1)})
            else:
                ev.rows.append(
                    {"before": _decode_row_image(body, tm, idx1)})
            if body.i == mark:
                # all-zero present bitmap (corrupt): a row image that
                # consumes no bytes would loop forever
                raise BinlogError("row image consumed no bytes")
    elif tc == QUERY_EVENT:
        body.u32()  # thread id
        body.u32()  # exec time
        schema_len = body.u8()
        body.u16()  # error code
        status_len = body.u16()
        body.bytes(status_len)
        ev.schema = body.bytes(schema_len).decode()
        body.u8()   # trailing 0
        ev.query = body.bytes(body.remaining()).decode("utf-8",
                                                       "replace")
    elif tc == ROTATE_EVENT:
        body.u64()  # first position in next file
        ev.next_file = body.bytes(body.remaining()).decode()
    elif tc == XID_EVENT:
        ev.xid = body.u64()
    elif tc in (GTID_LOG_EVENT, ANONYMOUS_GTID_LOG_EVENT):
        # flags(1) sid(16) gno(8) -- the transaction's identity;
        # the anonymous variant carries a zero/ignored sid
        body.u8()
        sid = body.bytes(16)
        gno = body.u64()
        if tc == GTID_LOG_EVENT:
            ev.gtid = f"{_sid_to_uuid(sid)}:{gno}"
    elif tc == MARIADB_GTID_EVENT:
        # MariaDB layout: seq_no(8) domain_id(4) flags(1)...; the
        # server_id comes from the common header -- together they
        # form the textual 'domain-server-seq' identity
        seq_no = body.u64()
        domain = body.u32()
        ev.gtid = f"{domain}-{ev.server_id}-{seq_no}"
    elif tc == MARIADB_GTID_LIST_EVENT:
        # count(4, low 28 bits) then per GTID:
        # domain(4) server(4) seq(8) -- the PREVIOUS_GTIDS analog
        n = body.u32() & 0x0FFFFFFF
        ev.gtid_set = ",".join(
            f"{body.u32()}-{body.u32()}-{body.u64()}"
            for _ in range(n))
    elif tc == PREVIOUS_GTIDS_LOG_EVENT:
        ev.gtid_set = decode_gtid_set(
            body.bytes(body.remaining()))
    # FDE / HEARTBEAT / others: framing-only skip


def _json_default(v: Any) -> Any:
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) \
            else v.isoformat()
    if isinstance(v, datetime.timedelta):
        total = v.total_seconds()
        sign = "-" if total < 0 else ""
        total = abs(total)
        h, rem = divmod(int(total), 3600)
        m, s = divmod(rem, 60)
        micro = round((total - int(total)) * 1e6)
        frac = f".{micro:06d}".rstrip("0") if micro else ""
        return f"{sign}{h:02d}:{m:02d}:{s:02d}{frac}"
    raise TypeError(type(v).__name__)


# envelope schema shared by the file readers: one fixed shape for all
# tables (rows as JSON), projected per-table by binlog_to_changelog.
# `gtid` is the enclosing transaction's identity (GTID_LOG_EVENT
# "uuid:gno", NULL on non-GTID servers) -- what a GTID-mode resume
# checkpoints instead of (file, pos).
ENVELOPE_DDL = ("file string, pos long, server_id long, ts timestamp, "
                "op string, db string, `table` string, row_in_event int, "
                "before string, after string, gtid string")


def decode_binlog_file_bytes(file_name: str, data: bytes, *,
                             verify_checksum: bool = True,
                             tolerate_truncation: bool = False,
                             ) -> list[dict]:
    """File bytes -> envelope dicts (one per row image). `pos` is the
    event's end position (header log_pos) -- the same monotone position
    the reference checkpoints in master.info (river/master.go:17-25);
    row events carry the GTID of the transaction that opened them."""
    out: list[dict] = []
    gtid: str | None = None
    for ev in iter_binlog_events(data, verify_checksum=verify_checksum,
                                 tolerate_truncation=tolerate_truncation):
        if ev.type_code in (GTID_LOG_EVENT, ANONYMOUS_GTID_LOG_EVENT,
                            MARIADB_GTID_EVENT):
            gtid = ev.gtid               # None for the anonymous form
        elif ev.type_code == XID_EVENT:
            gtid = None                  # transaction closed
        if not ev.rows:
            continue
        for i, row in enumerate(ev.rows):
            out.append({
                "file": file_name, "pos": ev.log_pos,
                "server_id": ev.server_id,
                "ts": datetime.datetime.fromtimestamp(
                    ev.timestamp, tz=datetime.timezone.utc
                ).replace(tzinfo=None),
                "op": ev.op, "db": ev.schema, "table": ev.table,
                "row_in_event": i,
                "before": (json.dumps(row["before"],
                                      default=_json_default)
                           if "before" in row else None),
                "after": (json.dumps(row["after"], default=_json_default)
                          if "after" in row else None),
                "gtid": gtid,
            })
    return out


_BINLOG_NAME_RE = r"\.\d+$"


def read_binlog_files(spark: SparkSession, path: str, *,
                      streaming: bool = False,
                      max_files_per_trigger: int = 4,
                      tolerate_truncation: bool = True,
                      strict_names: bool = True) -> DataFrame:
    """Decode a directory of binlog files into the envelope DataFrame.

    One file = one decode task (binaryFile source + mapInPandas):
    TABLE_MAP state makes a single file inherently sequential, so the
    file axis IS the parallelism -- with per-file sizes capped by the
    server's max_binlog_size this is the same bounded-task shape as
    any log-shipping source. Decode is stdlib-Python per file but
    Arrow-batched on the way out; everything downstream is Catalyst.

    `tolerate_truncation` defaults True HERE (unlike the byte-level
    API): a directory being tailed normally contains one actively
    written final file, and losing every complete event in it because
    the tail is mid-append would be wrong for exactly the live case
    this reader exists for.

    `strict_names=True` enforces what `debezium.binlog_seq` needs for a
    total order: every basename carries a numeric suffix
    (mysql-bin.000042), and no two files share a basename (identically
    named files in different subdirectories would collapse into one seq
    space). Checked per-file in every mode, plus a driver-side
    duplicate scan in batch mode (path-only projection -- binaryFile
    prunes `content`, so this lists files without reading them;
    streaming mode cannot pre-enumerate and relies on the shape check).
    """
    import re

    reader = (spark.readStream if streaming else spark.read)
    r = reader.format("binaryFile").option("pathGlobFilter", "*")
    if streaming:
        # streaming file sources need the schema up front (binaryFile's
        # is fixed by the format)
        r = (r.option("maxFilesPerTrigger", max_files_per_trigger)
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary"))
    raw = r.load(path)

    if strict_names and not streaming:
        seen: dict[str, str] = {}
        for row in raw.select("path").collect():  # bounded: file listing
            base = str(row["path"]).rsplit("/", 1)[-1]
            if not re.search(_BINLOG_NAME_RE, base):
                raise BinlogError(
                    f"binlog file name {base!r} lacks the numeric suffix "
                    f"binlog_seq keys on (expected mysql-bin.NNNNNN)")
            if base in seen and seen[base] != str(row["path"]):
                raise BinlogError(
                    f"duplicate binlog basename {base!r} "
                    f"({seen[base]} vs {row['path']}): identically named "
                    f"files would collapse into one seq space")
            seen[base] = str(row["path"])

    return decode_binary_column(
        raw.select(F.element_at(F.split("path", "/"), -1).alias("file"),
                   "content"),
        tolerate_truncation=tolerate_truncation,
        strict_names=strict_names)


def decode_binary_column(df: DataFrame, *,
                         file_col: str = "file",
                         content_col: str = "content",
                         tolerate_truncation: bool = False,
                         strict_names: bool = True) -> DataFrame:
    """(file name, binlog bytes) rows -> the envelope DataFrame. The
    in-plan form of read_binlog_files: same one-file-one-decode
    mapInPandas shape, but the bytes come from a binary COLUMN --
    round-trip checks against binlog_writer, binlog chunks shipped
    through Kafka/parquet, relay-log excerpts."""
    import re

    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["file", "pos", "server_id", "ts", "op", "db", "table",
                "row_in_event", "before", "after", "gtid"]
        for pdf in batches:
            rows: list[dict] = []
            for name, content in zip(pdf[file_col], pdf[content_col]):
                name = str(name)
                if strict_names and not re.search(_BINLOG_NAME_RE, name):
                    raise BinlogError(
                        f"binlog file name {name!r} lacks the numeric "
                        f"suffix binlog_seq keys on")
                rows.extend(decode_binlog_file_bytes(
                    name, bytes(content),
                    tolerate_truncation=tolerate_truncation))
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            else:
                # empty frame needs real dtypes for Arrow conversion
                yield pd.DataFrame({
                    "file": pd.Series(dtype="object"),
                    "pos": pd.Series(dtype="int64"),
                    "server_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[ns]"),
                    "op": pd.Series(dtype="object"),
                    "db": pd.Series(dtype="object"),
                    "table": pd.Series(dtype="object"),
                    "row_in_event": pd.Series(dtype="int32"),
                    "before": pd.Series(dtype="object"),
                    "after": pd.Series(dtype="object"),
                    "gtid": pd.Series(dtype="object")})

    return (df.select(F.col(file_col).alias(file_col),
                      F.col(content_col).alias(content_col))
            .mapInPandas(decode, schema=ENVELOPE_DDL))


def binlog_to_changelog(env: DataFrame, row_ddl: str, *,
                        db: str | None = None,
                        table: str | None = None,
                        with_before: bool = False) -> DataFrame:
    """Project one table's envelope rows into the normalized changelog
    (seq, ts, op, cols...) -- the same output contract as
    debezium.parse_debezium, so the existing apply path
    (streaming/pipeline.py + operators/upsert.py) consumes binlog files
    without modification. seq = (binlog file index, position, row) via
    debezium.binlog_seq: the reference's master.info total order."""
    from pyspark.sql.types import StructType

    from .debezium import binlog_seq

    out = env
    if db is not None:
        out = out.filter(F.col("db") == db)
    if table is not None:
        out = out.filter(F.col("table") == table)
    row_fields = StructType.fromDDL(row_ddl).fieldNames()
    image = F.from_json(
        F.coalesce(F.col("after"), F.col("before")), row_ddl)
    before = F.when(F.col("op") == "update",
                    F.from_json(F.col("before"), row_ddl))
    before_cols = ([before.getField(c).alias(f"before_{c}")
                    for c in row_fields] if with_before else [])
    return out.select(
        binlog_seq(F.col("file"), F.col("pos"), F.col("row_in_event")),
        F.col("ts"),
        F.col("op"),
        *[image.getField(c).alias(c) for c in row_fields],
        *before_cols)


# ------------------------------------------------------------- DDL

DDL_DDL = "file string, pos long, ts timestamp, db string, query string"

_DDL_HEAD_RE = None   # compiled lazily (module import stays cheap)


def _is_ddl_text(q: str) -> bool:
    """Cheap head-keyword filter for QUERY-event text: keep only
    statements sources/ddl.py can act on (ALTER/CREATE/DROP/RENAME/
    TRUNCATE TABLE); BEGIN markers, statement-format DML, SET/GRANT
    session noise and CREATE DATABASE/INDEX/VIEW stay out of band."""
    global _DDL_HEAD_RE
    import re
    if _DDL_HEAD_RE is None:
        _DDL_HEAD_RE = re.compile(
            r"\s*(?:/\*.*?\*/\s*)*"
            r"(alter\s+(?:online\s+|offline\s+|ignore\s+)?table"
            r"|create\s+table|drop\s+table|rename\s+table"
            r"|truncate\s)", re.I | re.S)
    return bool(_DDL_HEAD_RE.match(q))


def decode_binlog_ddl(file_name: str, data: bytes, *,
                      verify_checksum: bool = True,
                      tolerate_truncation: bool = False) -> list[dict]:
    """File bytes -> schema-changing QUERY events, in file order --
    the raw material for sources/ddl.parse_mysql_ddl. The reference
    only checkpoints past these (OnDDL, river/sync.go:62-65); we
    surface them so the sink can evolve. `pos` is the event's END
    position, same checkpoint monotone as the envelope rows.

    Fast path: this walks event HEADERS and decodes only QUERY_EVENT
    bodies (plus the FDE for the checksum flag, and
    TRANSACTION_PAYLOAD envelopes, whose inner frames can carry a
    compressed DDL) -- row images are ~all of a binlog's bytes and
    skipping their decode measured ~5x over the full
    iter_binlog_events walk. CRC is verified for the events actually
    decoded; skipped events are framed by size only, exactly the
    cheap pass a replica's log rotation scan does."""

    def _query_dicts(tc: int, ts: int, log_pos: int,
                     body_b: bytes) -> "dict | None":
        ev = BinlogEvent(tc, ts, 0, log_pos)
        _decode_event_body(tc, _Reader(body_b), {}, ev)
        if not ev.query or not _is_ddl_text(ev.query):
            return None
        return {
            "file": file_name, "pos": log_pos,
            "ts": datetime.datetime.fromtimestamp(
                ts, tz=datetime.timezone.utc).replace(tzinfo=None),
            "db": ev.schema, "query": ev.query,
        }

    out: list[dict] = []
    pos = 4 if data[:4] == BINLOG_MAGIC else 0
    checksummed = False
    while pos + _HEADER_LEN <= len(data):
        ts, tc, _sid, size, log_pos, _flags = struct.unpack_from(
            "<IBIIIH", data, pos)
        if size < _HEADER_LEN:
            raise BinlogError(f"corrupt event size {size} at {pos}")
        if pos + size > len(data):
            if tolerate_truncation:
                return out
            raise BinlogError(f"truncated event at {pos}")
        if tc == FORMAT_DESCRIPTION_EVENT:
            checksummed = fde_checksummed(
                data[pos + _HEADER_LEN:pos + size])
        elif tc in (QUERY_EVENT, TRANSACTION_PAYLOAD_EVENT):
            body_b = data[pos + _HEADER_LEN:pos + size]
            if checksummed:
                if verify_checksum and struct.unpack(
                        "<I", body_b[-4:])[0] != zlib.crc32(
                        data[pos:pos + size - 4]):
                    raise BinlogError(
                        f"CRC32 mismatch at {pos} (event type {tc})")
                body_b = body_b[:-4]
            if tc == QUERY_EVENT:
                d = _query_dicts(tc, ts, log_pos, body_b)
                if d is not None:
                    out.append(d)
            else:
                # compressed transactions (WL#3549): inner frames are
                # never checksummed; a DDL statement can ride here
                inner = _decompress_payload(_Reader(body_b))
                ipos = 0
                while ipos + _HEADER_LEN <= len(inner):
                    its, itc, _isid, isize, ilog, _ = struct.unpack_from(
                        "<IBIIIH", inner, ipos)
                    if isize < _HEADER_LEN or ipos + isize > len(inner):
                        raise BinlogError(
                            f"corrupt payload frame at inner offset "
                            f"{ipos}")
                    if itc == QUERY_EVENT:
                        d = _query_dicts(
                            itc, its, ilog,
                            inner[ipos + _HEADER_LEN:ipos + isize])
                        if d is not None:
                            out.append(d)
                    ipos += isize
        pos += size
    return out


def read_binlog_ddl(spark: SparkSession, path: str, *,
                    tolerate_truncation: bool = True) -> DataFrame:
    """Decode a binlog directory's schema-changing QUERY events into a
    (file, pos, ts, db, query) DataFrame -- the same one-file-one-task
    mapInPandas shape as the envelope decode, but over the RARE event
    class, so the result is small enough to collect and order
    driver-side for serial application (DDL is inherently ordered
    against the row stream; see sources/ddl.apply_ddl_to_sink)."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            rows: list[dict] = []
            for name, content in zip(pdf["path"], pdf["content"]):
                base = str(name).rsplit("/", 1)[-1]
                rows.extend(decode_binlog_ddl(
                    base, bytes(content),
                    tolerate_truncation=tolerate_truncation))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["file", "pos", "ts", "db", "query"])
            else:
                yield pd.DataFrame({
                    "file": pd.Series(dtype="object"),
                    "pos": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[ns]"),
                    "db": pd.Series(dtype="object"),
                    "query": pd.Series(dtype="object")})

    raw = (spark.read.format("binaryFile").load(path)
           .select("path", "content"))
    return raw.mapInPandas(decode, schema=DDL_DDL)
