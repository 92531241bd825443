"""--checksum over the NATIVE TCP protocol (VERDICT r13 top ask):
digest SELECT decoding, distributed drill-down read-back, and repair
execution without an HTTP port.

Selftest-twin pattern: the fake server here EVALUATES the emitted
digest SQL's semantics over a Python row store with the independent
pure-Python CityHash64, and encodes its responses with TEST-SIDE
column encoders (never the module's own encode_block), so the
production decoders in sinks/clickhouse_native.py are checked against
an independent implementation of the same public wire format.
Algorithm-level agreement with a live server stays `pytest -m
interop`."""

from __future__ import annotations

import json
import re
import socketserver
import struct
import threading

import pytest

from mysql_syncer_clickhouse_spark.sinks import clickhouse_native as N
from mysql_syncer_clickhouse_spark.sinks.cityhash102 import cityhash64
from tests.test_clickhouse_native_sink import (
    _decode_block_mc,
    _rd_str,
    _rd_varint,
    _SockReader,
    _wr_frame,
    _wr_str,
    _wr_varint,
)
# ------------------------------------------ independent column encode


def _enc_col(ch_type: str, vals: list) -> bytes:
    """Test-side encoder for the server->client response columns --
    written here, independently of the module under test."""
    if ch_type.startswith("Nullable("):
        mask = bytes(1 if v is None else 0 for v in vals)
        inner = ch_type[9:-1]
        dflt = "" if inner == "String" else 0
        return mask + _enc_col(
            inner, [dflt if v is None else v for v in vals])
    if ch_type == "String":
        out = bytearray()
        for v in vals:
            b = v.encode() if isinstance(v, str) else bytes(v)
            out += _wr_varint(len(b)) + b
        return bytes(out)
    fixed = {"Int8": "b", "Int16": "h", "Int32": "i", "Int64": "q",
             "UInt8": "B", "UInt16": "H", "UInt32": "I", "UInt64": "Q",
             "Float32": "f", "Float64": "d"}
    if ch_type in fixed:
        return b"".join(struct.pack("<" + fixed[ch_type], v)
                        for v in vals)
    if ch_type in ("UInt128", "UInt256", "Int128", "Int256"):
        w = 16 if ch_type.endswith("128") else 32
        return b"".join(
            int(v).to_bytes(w, "little",
                            signed=not ch_type.startswith("U"))
            for v in vals)
    raise AssertionError(f"fake server can't encode {ch_type}")


def _wr_block(cols: list[tuple[str, str]], rows: list[tuple],
              compressed: bool) -> bytes:
    body = bytearray(b"\x01\x00\x02\xff\xff\xff\xff\x00")
    body += _wr_varint(len(cols)) + _wr_varint(len(rows))
    for j, (n, t) in enumerate(cols):
        body += _wr_str(n) + _wr_str(t)
        if rows:
            body += _enc_col(t, [r[j] for r in rows])
        # zero-row columns carry no data (none of the fake's types
        # have a serialization-state prefix), so an INSERT header can
        # declare types the test encoder has no data encoder for
    body = bytes(body)
    if compressed:
        body = _wr_frame(body)
    return _wr_varint(1) + _wr_str("") + body


# ------------------------------------------------- evaluating fake


class _MiniNativeCH:
    """A native-protocol fake that EVALUATES: system.columns
    introspection, the pushdown digest aggregate (independent
    CityHash64 + canonical rendering), bucket-filtered read-back
    SELECTs, and INSERT/ALTER writes (recorded, INSERT blocks decoded
    with the test-side decoders)."""

    def __init__(self, rows: list[dict],
                 schema: list[tuple[str, str]],
                 pk: list[str], n_buckets: int,
                 engine: str = "ReplacingMergeTree"):
        self.rows, self.schema = rows, schema
        self.pk, self.n = pk, n_buckets
        self.engine = engine
        self.queries: list[str] = []
        self.writes: list[str] = []
        self.inserts: list[tuple[str, list[tuple]]] = []
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                r = _SockReader(self.request)
                try:
                    outer._session(self.request, r)
                except (ConnectionError, OSError):
                    pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Server(("127.0.0.1", 0), Handler)
        self.host, self.port = self._srv.server_address
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()

    @property
    def addr(self) -> str:
        return f"{self.host}:{self.port}"

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()

    def _canon_val(self, v, typ: str) -> "str | None":
        """TYPED store value -> the string the emitted canonical SQL
        renders server-side (independent implementation: float bit
        patterns, fixed-scale decimals, epoch micros, uppercase hex
        for raw bytes)."""
        import datetime
        import struct as _s
        from decimal import Decimal
        if v is None:
            return None
        t = typ[9:-1] if typ.startswith("Nullable(") else typ
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex().upper()
        if t == "Float64":
            return str(_s.unpack("<Q", _s.pack("<d", v))[0])
        if t == "Float32":
            return str(_s.unpack("<I", _s.pack("<f", v))[0])
        if t.startswith("DateTime64"):
            epoch = datetime.datetime(1970, 1, 1)
            return str((v - epoch)
                       // datetime.timedelta(microseconds=1))
        if t.startswith("DateTime"):
            epoch = datetime.datetime(1970, 1, 1)
            return str(int((v - epoch).total_seconds()))
        if t.startswith("Decimal"):
            scale = int(t[8:-1].split(",")[1])
            return str(Decimal(v).quantize(
                Decimal(1).scaleb(-scale)))
        return str(v)

    def _canon_row(self, r: dict, order: list[str]) -> bytes:
        by_name = dict(self.schema)
        parts = []
        for c in order:
            s = self._canon_val(r[c], by_name[c])
            parts.append(
                "N" if s is None else f"{len(s.encode())}:{s}")
        return "".join(parts).encode()

    def _bucket(self, r: dict, n: "int | None" = None) -> int:
        return cityhash64(self._canon_row(r, self.pk)) % (n or self.n)

    def _canon_order(self) -> list[str]:
        rest = sorted(n for n, _ in self.schema if n not in self.pk)
        return self.pk + rest

    # -- query evaluation (mirrors test_syncverify._ChecksumFakeCH,
    #    but answering in native blocks over typed values)

    def _answer(self, sql: str, send, compressed: bool) -> None:
        import collections
        if "system.columns" in sql:
            send(_wr_block([("name", "String"), ("type", "String")],
                           [(n, t) for n, t in self.schema],
                           compressed))
            return
        if "system.tables" in sql:
            send(_wr_block([("engine", "String")],
                           [(self.engine,)], compressed))
            return
        if "groupBitXor" in sql:
            known = {n for n, _ in self.schema}
            refs = [n for n in re.findall(r"`([^`]+)`", sql)
                    if n in known]
            order = list(dict.fromkeys(refs)) or self._canon_order()
            nm = re.search(r"%\s*(\d+)\s+AS bucket", sql)
            n = int(nm.group(1)) if nm else self.n
            sm = re.search(r"WHERE bucket % (\d+) = (\d+)", sql)
            sample = ((int(sm.group(1)), int(sm.group(2)))
                      if sm else None)
            agg = collections.defaultdict(lambda: [0, 0, 0])
            for r in self.rows:
                b = self._bucket(r, n)
                if sample and b % sample[0] != sample[1]:
                    continue
                fp = cityhash64(self._canon_row(r, order))
                a = agg[b]
                a[0] += 1
                a[1] ^= fp
                a[2] += fp
            send(_wr_block(
                [("bucket", "UInt64"), ("cnt", "UInt64"),
                 ("xor_fp", "UInt64"), ("sum_fp", "UInt256")],
                [(b, v[0], v[1], v[2])
                 for b, v in sorted(agg.items())], compressed))
            return
        m = re.search(r"=\s*(\d+)\s*$", sql.strip())
        if m and sql.lstrip().upper().startswith("SELECT"):
            i = int(m.group(1))
            known = {n for n, _ in self.schema}
            refs = [n for n in re.findall(r"`([^`]+)`", sql)
                    if n in known]
            order = list(dict.fromkeys(refs)) or self._canon_order()
            by_name = dict(self.schema)
            cols = [(n, by_name[n]) for n in order]
            hit = [tuple(r[n] for n in order)
                   for r in self.rows if self._bucket(r) == i]
            send(_wr_block(cols, hit, compressed))
            return
        raise AssertionError(f"fake can't evaluate: {sql[:120]}")

    def _session(self, sock, r) -> None:
        assert _rd_varint(r) == 0
        _rd_str(r)
        _rd_varint(r)
        _rd_varint(r)
        _rd_varint(r)
        _rd_str(r)
        _rd_str(r)
        _rd_str(r)
        hello = (_wr_varint(0) + _wr_str("MiniNativeCH")
                 + _wr_varint(23) + _wr_varint(8)
                 + _wr_varint(N.CLIENT_REVISION)
                 + _wr_str("UTC") + _wr_str("mini") + _wr_varint(1))
        sock.sendall(hello)
        while True:
            pkt = _rd_varint(r)
            assert pkt == 1, f"unexpected client packet {pkt}"
            _rd_str(r)
            assert r.read(1)[0] == 1
            _rd_str(r)
            _rd_str(r)
            _rd_str(r)
            assert r.read(1)[0] == 1
            _rd_str(r)
            _rd_str(r)
            _rd_str(r)
            _rd_varint(r)
            _rd_varint(r)
            _rd_varint(r)
            _rd_str(r)                       # quota key
            _rd_varint(r)                    # version patch
            while True:
                if not _rd_str(r):
                    break
                r.read(1)
                _rd_str(r)
            assert _rd_varint(r) == 2
            compression = _rd_varint(r)
            sql = _rd_str(r)
            assert _rd_varint(r) == 2        # empty external block
            _rd_str(r)
            _decode_block_mc(r, compression == 1)
            with self._lock:
                self.queries.append(sql)
            head = sql.lstrip().upper()
            if head.startswith("INSERT"):
                with self._lock:
                    self.writes.append(sql)
                # a REAL server's INSERT header declares the target
                # columns' types (what describe_columns adopts); the
                # statement's explicit column list narrows it
                m = re.search(r"INSERT INTO [^(]+\(([^)]*)\)", sql)
                if m and self.schema:
                    names = [c.strip().strip("`")
                             for c in m.group(1).split(",")]
                    by_name = dict(self.schema)
                    hcols = [(c, by_name[c]) for c in names
                             if c in by_name]
                else:
                    hcols = list(self.schema)
                sock.sendall(_wr_block(hcols, [], compression == 1))
                got: list[tuple] = []
                names: list[str] = []
                while True:
                    assert _rd_varint(r) == 2
                    _rd_str(r)
                    bcols, brows = _decode_block_mc(r, compression == 1)
                    if not bcols and not brows:
                        break
                    names = [n for n, _t in bcols]
                    got.extend(brows)
                with self._lock:
                    self.inserts.append((sql, got))
                    # inserted rows LAND in the store (typed, via the
                    # test-side decoders) so digest-after-insert
                    # round-trips evaluate like a real server
                    for row in got:
                        self.rows.append(dict(zip(names, row)))
            elif head.startswith(("ALTER", "CREATE", "DROP")):
                with self._lock:
                    self.writes.append(sql)
                    if head.startswith("DROP TABLE"):
                        self.rows.clear()
            else:
                self._answer(sql, sock.sendall, compression == 1)
                # ProfileInfo before EndOfStream, like a live server
                # on SELECT -- exercises the client's consume path
                sock.sendall(_wr_varint(6) + _wr_varint(len(self.rows))
                             + _wr_varint(1) + _wr_varint(128)
                             + b"\x00" + _wr_varint(0) + b"\x00")
            sock.sendall(_wr_varint(5))      # EndOfStream

# --------------------------------------------------------------- tests


_SCHEMA = [("id", "Int64"), ("es_title", "Nullable(String)"),
           ("mydate", "Nullable(Int64)"), ("op", "String"),
           ("seq", "Int64")]

_IN_SYNC = [
    {"id": 1, "es_title": "first-edited", "mydate": 86400,
     "op": "update", "seq": 3},
    {"id": 2, "es_title": None, "mydate": None,
     "op": "delete", "seq": 4},
]


def _cfg(tmp_path, addr):
    import os

    from mysql_syncer_clickhouse_spark.config import EngineConfig
    toml = os.path.join(os.path.dirname(__file__), "..", "etc",
                        "river.toml")
    cfg = EngineConfig.from_toml(toml)
    cfg.data_dir = str(tmp_path / "log")
    cfg.sink_addr = addr
    return cfg


@pytest.mark.parametrize("compression", [False, "lz4"])
def test_select_rows_decodes_typed_blocks(compression):
    srv = _MiniNativeCH(list(_IN_SYNC), _SCHEMA, ["id"], 16)
    try:
        conn = N.NativeConnection(srv.host, srv.port,
                                  compression=compression)
        cols, rows = conn.select_rows(
            "SELECT name, type FROM system.columns WHERE database = "
            "'olap' AND table = 't' ORDER BY position")
        conn.close()
        assert cols == [("name", "String"), ("type", "String")]
        assert (rows[0][0], rows[1][0]) == (b"id", b"es_title")
    finally:
        srv.stop()


def test_transport_selection():
    from mysql_syncer_clickhouse_spark.sinks.verify_transport import (
        HTTPVerifyTransport,
        NativeVerifyTransport,
        transport_for,
    )

    class Cfg:
        sink_addr = "127.0.0.1:9000"
        sink_user = sink_pass = None
        sink_secure = False
        sink_ca = None

    t = transport_for(Cfg(), None)("db", "t", ("id",))
    assert isinstance(t, NativeVerifyTransport)
    assert (t.host, t.port) == ("127.0.0.1", 9000)
    t = transport_for(Cfg(), "http://h:8123")("db", "t", ("id",))
    assert isinstance(t, HTTPVerifyTransport)
    http_cfg = Cfg()
    http_cfg.sink_addr = "https://h:8443"
    t = transport_for(http_cfg, None)("db", "t", ("id",))
    assert isinstance(t, HTTPVerifyTransport)
    none_cfg = Cfg()
    none_cfg.sink_addr = None
    with pytest.raises(SystemExit, match="sink_addr"):
        transport_for(none_cfg, None)


def _write_items_changelog(spark, tmp_path):
    import os
    changelog = tmp_path / "changelog" / "app.items"
    os.makedirs(changelog)
    rows = [
        (1, "insert", 1, "first", 86400),
        (2, "insert", 2, "second", 86400),
        (3, "update", 1, "first-edited", 86400),
        (4, "delete", 2, None, None),
    ]
    spark.createDataFrame(
        rows, "seq long, op string, id long, title string, mydate long"
    ).coalesce(1).write.mode("append").parquet(str(changelog))
    return str(tmp_path / "changelog")


def test_cli_checksum_native_in_sync(spark, tmp_path):
    """The r13 refusal path, now the headline: a native-TCP sink_addr
    verifies end-to-end with zero HTTP -- introspection, digest and
    verdict all over port-9000 framing."""
    from mysql_syncer_clickhouse_spark.__main__ import run_checksum
    changelog = _write_items_changelog(spark, tmp_path)
    srv = _MiniNativeCH(list(_IN_SYNC), _SCHEMA, ["id"], 16)
    try:
        out = run_checksum(_cfg(tmp_path, srv.addr),
                           changelog_dir=changelog, buckets=16,
                           spark=spark)
        line = next(x for x in out if x.get("rule") == "app:items")
        assert line["transport"] == "native"
        assert line["in_sync"] is True
        assert line["rows_src"] == 2 and line["rows_sink"] == 2
        assert out[-1]["out_of_sync"] == []
        assert all("FORMAT" not in q for q in srv.queries)
    finally:
        srv.stop()


def test_cli_checksum_native_deep_repair_executes_native_blocks(
        spark, tmp_path):
    """Drifted sink over native TCP: --deep classifies row-level
    findings through the native read-back, --repair --execute applies
    the re-INSERT as a native Data block (typed values, decoded by
    the fake's independent decoders) and the extra row's ALTER DELETE
    as a statement."""
    from mysql_syncer_clickhouse_spark.__main__ import run_checksum
    changelog = _write_items_changelog(spark, tmp_path)
    drifted = [
        {"id": 1, "es_title": "STALE", "mydate": 86400,
         "op": "update", "seq": 3},
        {"id": 99, "es_title": "ghost", "mydate": 1,
         "op": "insert", "seq": 9},
    ]
    srv = _MiniNativeCH(drifted, _SCHEMA, ["id"], 16)
    try:
        out = run_checksum(_cfg(tmp_path, srv.addr),
                           changelog_dir=changelog, buckets=16,
                           deep=True, repair=True, execute=True,
                           spark=spark)
        line = next(x for x in out if x.get("rule") == "app:items")
        assert line["transport"] == "native"
        assert line["in_sync"] is False
        got = {(d["id"], d["status"]): d["differing_columns"]
               for d in line["diff"]}
        assert got[(1, "value_mismatch")] == ["es_title"]
        assert (2, "missing_in_sink") in got
        assert (99, "extra_in_sink") in got
        assert len(got) == 3
        assert line["repair_executed"] is True
        # BOTH repair rows landed in ONE native block over ONE
        # connection (typed values, decoded by the fake's independent
        # decoders)
        assert len(srv.inserts) == 1
        ins = {r[0]: r for r in srv.inserts[0][1]}
        assert len(ins) == 2
        assert ins[1][1] == "first-edited"     # value_mismatch fixed
        assert ins[2][1] is None                # missing row, null title
        assert any(w.startswith("ALTER TABLE `olap`.`items_sink` "
                                "DELETE WHERE `id` = 99")
                   for w in srv.writes)
    finally:
        srv.stop()


def test_cli_checksum_native_deep_handles_binary_columns(
        spark, tmp_path):
    """The native transport round-trips raw bytes (String is
    byte-transparent) -- drill-down over a binary column WORKS and
    classifies the drifted payload.  (The HTTP transport reaches the
    same verdict via hex read-back: test_syncverify.py's
    test_cli_checksum_deep_repairs_binary_over_http.)"""
    import os

    from mysql_syncer_clickhouse_spark.__main__ import run_checksum
    changelog = tmp_path / "changelog" / "app.items"
    os.makedirs(changelog)
    spark.createDataFrame(
        [(1, "insert", 1, bytearray(b"\x00\xffA")),
         (2, "insert", 2, bytearray(b"zz"))],
        "seq long, op string, id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(str(changelog))
    schema = [("id", "Int64"), ("op", "String"),
              ("payload", "Nullable(String)"), ("seq", "Int64")]
    # the native store holds RAW BYTES (ClickHouse String is
    # byte-transparent); pk 2's payload drifted
    rows = [{"id": 1, "op": "insert", "payload": b"\x00\xffA",
             "seq": 1},
            {"id": 2, "op": "insert", "payload": b"XX", "seq": 2}]
    srv = _MiniNativeCH(rows, schema, ["id"], 16)
    try:
        out = run_checksum(_cfg(tmp_path, srv.addr),
                           changelog_dir=str(tmp_path / "changelog"),
                           buckets=16, deep=True, spark=spark)
        line = next(x for x in out if x.get("rule") == "app:items")
        assert line["in_sync"] is False
        assert "deep_error" not in line
        got = {(d["id"], d["status"]): d["differing_columns"]
               for d in line["diff"]}
        assert got == {(2, "value_mismatch"): ["payload"]}
    finally:
        srv.stop()


# --------------------------- decoder properties (independent encode)


def test_native_decoder_roundtrip_property():
    """Hypothesis: values encoded by the TEST-side column encoders
    (written independently of the module) decode through the
    PRODUCTION column_decoder to the same values -- the two
    implementations of the public column format pin each other,
    the same strategy the binlog suite uses."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalar_types = {
        "Int8": st.integers(-128, 127),
        "Int64": st.integers(-(2**63), 2**63 - 1),
        "UInt16": st.integers(0, 2**16 - 1),
        "UInt64": st.integers(0, 2**64 - 1),
        "Float64": st.floats(allow_nan=False, width=64),
        "String": st.text(max_size=40),
        "UInt256": st.integers(0, 2**256 - 1),
    }

    @st.composite
    def column(draw):
        t = draw(st.sampled_from(sorted(scalar_types)))
        nullable = draw(st.booleans()) and t != "UInt256"
        vals = draw(st.lists(
            st.none() | scalar_types[t] if nullable
            else scalar_types[t], min_size=0, max_size=20))
        return (f"Nullable({t})" if nullable else t), vals

    @given(column())
    @settings(max_examples=200, deadline=None)
    def check(col):
        ch_type, vals = col
        blob = _enc_col(ch_type, vals)
        rd = N._BytesReader(blob)
        got = N.column_decoder(ch_type)(rd, len(vals))
        assert rd.buf[rd.pos:] == b"" if hasattr(rd, "pos") else True
        for orig, dec in zip(vals, got):
            if orig is None:
                assert dec is None
            elif isinstance(orig, str):
                assert dec == orig.encode()
            elif isinstance(orig, float):
                assert dec == orig or (dec != dec and orig != orig)
            else:
                assert dec == orig

    check()


def test_native_array_column_decodes_and_reads_back(spark):
    """Array columns round-trip through the native read-back (the
    drill-down's remaining type-surface gap closed in round 14):
    production decoder on test-encoded offsets+flat layout, then the
    distributed reader coerces to Spark arrays."""
    import struct as _s

    from pyspark.sql import types as T

    from mysql_syncer_clickhouse_spark.sinks.clickhouse_read import (
        read_clickhouse_native)

    # test-side Array(Int64) encode: cumulative UInt64 offsets + flat
    def enc_array_i64(arrs):
        offs, total = [], 0
        for a in arrs:
            total += len(a)
            offs.append(total)
        flat = [x for a in arrs for x in a]
        return (b"".join(_s.pack("<Q", o) for o in offs)
                + b"".join(_s.pack("<q", v) for v in flat))

    arrs = [[1, 2, 3], [], [42]]
    blob = enc_array_i64(arrs)
    got = N.column_decoder("Array(Int64)")(N._BytesReader(blob), 3)
    assert got == arrs

    class _ArrayCH(_MiniNativeCH):
        def _answer(self, sql, send, compressed):
            if "tags" in sql and sql.lstrip().startswith("SELECT"):
                body = bytearray(b"\x01\x00\x02\xff\xff\xff\xff\x00")
                body += _wr_varint(2) + _wr_varint(3)
                body += _wr_str("id") + _wr_str("Int64")
                body += _enc_col("Int64", [1, 2, 3])
                body += _wr_str("tags") + _wr_str("Array(Int64)")
                body += enc_array_i64(arrs)
                blk = bytes(body)
                if compressed:
                    blk = _wr_frame(blk)
                send(_wr_varint(1) + _wr_str("") + blk)
                return
            super()._answer(sql, send, compressed)

    srv = _ArrayCH([], [("id", "Int64"),
                        ("tags", "Array(Int64)")], ["id"], 4)
    try:
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.LongType()))])
        df = read_clickhouse_native(
            spark, srv.host, srv.port, "olap", "t", schema,
            split_expr="cityHash64(toString(`id`)) % 1", n_splits=1)
        rows = sorted((r["id"], list(r["tags"])) for r in df.collect())
        assert rows == [(1, [1, 2, 3]), (2, []), (3, [42])]
    finally:
        srv.stop()


def test_json_coercer_round_trips_spark_to_json(spark):
    """Repair rows ride as the drill-down's src_row JSON (Spark
    to_json); the native transport re-types them for the block
    encoders. Pin the coercion against Spark's ACTUAL rendering --
    dates, timestamps (session-UTC ISO with zone suffix), decimals,
    base64 binary, ints, bools, nulls."""
    import datetime
    import json as _json
    from decimal import Decimal

    from pyspark.sql import functions as F

    from mysql_syncer_clickhouse_spark.sinks.verify_transport import (
        _json_coercer)

    rows = [(1, datetime.date(2024, 1, 2),
             datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
             Decimal("12.30"), bytearray(b"\x00\xffA"), True, None)]
    df = spark.createDataFrame(
        rows, "id long, d date, ts timestamp, amt decimal(10,2), "
              "payload binary, flag boolean, missing string")
    from mysql_syncer_clickhouse_spark.operators.syncverify import (
        _JSON_OPTS)
    payload = df.select(F.to_json(
        F.struct(*df.columns), _JSON_OPTS).alias("j")).first()["j"]
    assert ".123456" in payload      # micros survive the rendering
    row = _json.loads(payload)
    got = {f.name: _json_coercer(f.dataType)(row[f.name])
           for f in df.schema.fields}
    assert got["id"] == 1
    assert got["d"] == datetime.date(2024, 1, 2)
    assert got["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert got["amt"] == Decimal("12.30")
    assert bytes(got["payload"]) == b"\x00\xffA"
    assert got["flag"] is True
    assert got["missing"] is None
    # and the values feed the native encoders without error
    cols = [("id", "Int64"), ("d", "Date"), ("ts", "DateTime64(6)"),
            ("amt", "Decimal(10,2)"), ("payload", "String"),
            ("flag", "Bool"), ("missing", "Nullable(String)")]
    blk = N.encode_block(cols, [tuple(got[n] for n, _ in cols)])
    assert isinstance(blk, bytes) and len(blk) > 40


def test_cli_retype_over_native_sink(spark, tmp_path):
    """--retype against a native-TCP sink_addr: the introspection
    rides the zero-row INSERT header (the same header adoption the
    write path uses -- no SELECT decoding needed there), and the
    MODIFY executes over the native wire. The HTTP twin lives in
    test_cli.py; this pins the native leg the CLI documents."""
    import os

    from mysql_syncer_clickhouse_spark.__main__ import run_retype
    from mysql_syncer_clickhouse_spark.config import EngineConfig
    from mysql_syncer_clickhouse_spark.sources.binlog_writer import (
        BinlogColumn, BinlogFileWriter)

    d = tmp_path / "binlogs"
    d.mkdir()
    w = BinlogFileWriter("app", "items", [BinlogColumn.bigint("id")])
    w.ddl("ALTER TABLE items ADD COLUMN price decimal(10,2)")
    (d / "mysql-bin.000001").write_bytes(w.to_bytes())

    schema = [("id", "Int64"), ("es_title", "Nullable(String)"),
              ("price", "Nullable(String)")]   # stuck at fallback
    srv = _MiniNativeCH([], schema, ["id"], 8)
    try:
        toml = os.path.join(os.path.dirname(__file__), "..", "etc",
                            "river.toml")
        cfg = EngineConfig.from_toml(toml)
        cfg.data_dir = str(tmp_path / "log")
        cfg.sink_addr = srv.addr
        out = run_retype(cfg, str(d), execute=True, spark=spark)
        [line] = [x for x in out if x.get("modify")]
        [m] = line["modify"]
        assert m["column"] == "price"
        assert m["target"] == "Nullable(Decimal(10,2))"
        assert any(q.startswith("ALTER TABLE `olap`.`items_sink` "
                                "MODIFY COLUMN `price`")
                   for q in srv.writes)
    finally:
        srv.stop()
