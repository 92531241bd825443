"""interop_selftest twin (VERDICT r10 ask #7): run the SAME test
bodies as tests/test_interop.py against the in-repo recording fake
servers, in the DEFAULT suite. The real-server interop tests skip
entirely without env vars, so their harness code -- address parsing,
the HTTP readback client, exception-path parse, the decode
assertions -- could rot unnoticed while waiting for a server; this
twin keeps every body executing. The fakes are the same independent
protocol implementations the unit suites trust (FakeMySQL,
_FakeNativeClickHouse); the one piece faked beyond them is a minimal
HTTP endpoint that serves the native fake's RECORDED inserts back in
TabSeparated, standing in for ClickHouse's HTTP interface."""

from __future__ import annotations

import datetime
import http.server
import struct
import threading
import urllib.parse
from decimal import Decimal

import pytest

import tests.test_interop as IT
from mysql_syncer_clickhouse_spark.sources import binlog as B
from tests.test_binlog import (Enc, e_blob, e_datetime2, e_decimal,
                               e_i64, e_u32, e_varchar)
from tests.test_clickhouse_native_sink import _FakeNativeClickHouse
from tests.test_mysql_repl import PASSWORD, USER, FakeMySQL

pytestmark = pytest.mark.interop_selftest

# ------------------------------------------------------------- MySQL

T_PROBE_COLS = [
    ("id", B.T_LONGLONG, b"", False),
    ("title", B.T_VARCHAR, struct.pack("<H", 80), False),
    ("qty", B.T_LONG, b"", True),                  # INT UNSIGNED
    ("price", B.T_NEWDECIMAL, bytes([12, 4]), False),
    ("ts", B.T_DATETIME2, bytes([6]), False),
    ("payload", B.T_BLOB, bytes([2]), False),
]


def _t_probe_binlog() -> bytes:
    """Exactly the change stream the interop body creates on a real
    server: insert 2 typed rows, update qty 7->8 on id=1, delete
    id=2 -- so the body's DECODE ASSERTIONS run verbatim."""
    row1 = [e_i64(1), e_varchar("quote's\\ttab"), e_u32(7),
            e_decimal("12.3456", 12, 4),
            e_datetime2(2024, 5, 6, 7, 8, 9, 123456, fsp=6),
            e_blob(b"\x00\xff\x10", size_bytes=2)]
    row1b = list(row1)
    row1b[2] = e_u32(8)                            # qty after UPDATE
    row2 = [e_i64(2), None, None, None, None, None]
    enc = Enc()
    enc.table_map(31, "msc_interop", "t_probe", T_PROBE_COLS)
    enc.rows(B.WRITE_ROWS_EVENT, 31, 6, [row1, row2])
    enc.xid(7001)
    enc.table_map(31, "msc_interop", "t_probe", T_PROBE_COLS)
    enc.rows(B.UPDATE_ROWS_EVENT, 31, 6, [row1, row1b])
    enc.xid(7002)
    enc.table_map(31, "msc_interop", "t_probe", T_PROBE_COLS)
    enc.rows(B.DELETE_ROWS_EVENT, 31, 6, [row2])
    enc.xid(7003)
    return enc.bytes()


@pytest.fixture()
def mysql_fake_env(monkeypatch):
    srv = FakeMySQL({"mysql-bin.000001": _t_probe_binlog()})
    srv.start()
    monkeypatch.setenv("MYSQL_ADDR", f"{srv.host}:{srv.port}")
    monkeypatch.setenv("MYSQL_USER", USER)
    monkeypatch.setenv("MYSQL_PASSWORD", PASSWORD)
    yield srv
    srv.stop()


def test_selftest_mysql_handshake_and_queries(mysql_fake_env):
    IT.test_mysql_full_handshake_and_queries()


def test_selftest_mysql_binlog_dump_decodes(mysql_fake_env):
    IT.test_mysql_binlog_dump_decodes_real_rows()


def test_selftest_exec_mysqldump(mysql_fake_env, monkeypatch,
                                 tmp_path_factory, tmp_path):
    import stat
    import sys
    golden = (
        "-- MySQL dump 10.13\n"
        "-- CHANGE MASTER TO MASTER_LOG_FILE='mysql-bin.000001', "
        "MASTER_LOG_POS=154;\n"
        "CREATE TABLE `t_probe` (\n"
        "  `id` bigint NOT NULL,\n"
        "  PRIMARY KEY (`id`)\n"
        ") ENGINE=InnoDB;\n"
        "INSERT INTO `t_probe` VALUES (1);\n")
    stub = tmp_path / "mysqldump"
    stub.write_text(f"#!{sys.executable}\n"
                    f"import sys\nsys.stdout.write({golden!r})\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("MYSQLDUMP_PATH", str(stub))
    IT.test_exec_mysqldump_against_real_server(tmp_path_factory)


# -------------------------------------------------------- ClickHouse

class _HttpReadback:
    """Stands in for ClickHouse's HTTP interface: answers the interop
    suite's readback SELECTs from the native fake's RECORDED inserts,
    TabSeparated with the real escaping rules; DDL is a no-op."""

    def __init__(self, native: _FakeNativeClickHouse):
        outer_native = native

        def fmt(v) -> str:
            if v is None:
                return "\\N"
            if isinstance(v, datetime.datetime):
                s = v.strftime("%Y-%m-%d %H:%M:%S.%f")
                return s
            if isinstance(v, str):
                return (v.replace("\\", "\\\\").replace("\t", "\\t")
                        .replace("\n", "\\n"))
            return str(v)

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):                      # noqa: N802
                qs = urllib.parse.parse_qs(
                    urllib.parse.urlparse(self.path).query)
                sql = (qs.get("query") or [""])[0].strip()
                body = b""
                if sql.upper().startswith("SELECT"):
                    table = sql.split("FROM", 1)[1].split()[0]
                    rows = []
                    for isql, irows in outer_native.inserts:
                        if table in isql:
                            rows.extend(irows)
                    rows.sort(key=lambda r: r[0])
                    body = "".join(
                        "\t".join(fmt(v) for v in r) + "\n"
                        for r in rows).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            do_POST = do_GET

            def log_message(self, *a):
                pass

        self._srv = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler)
        self.host, self.port = self._srv.server_address

    def start(self):
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


@pytest.fixture()
def ch_fake_env(monkeypatch):
    native = _FakeNativeClickHouse(
        fail_sql_containing="does_not_exist").start()
    http_srv = _HttpReadback(native).start()
    monkeypatch.setenv("CLICKHOUSE_ADDR",
                       f"{native.host}:{native.port}")
    monkeypatch.setenv("CLICKHOUSE_HTTP_ADDR",
                       f"{http_srv.host}:{http_srv.port}")
    yield native
    http_srv.stop()
    native.stop()


@pytest.mark.parametrize("compression", [False, True, "zstd"])
def test_selftest_ch_native_insert_readback(ch_fake_env, compression):
    IT.test_clickhouse_native_insert_readback(compression)


def test_selftest_ch_exception_surfaces(ch_fake_env):
    IT.test_clickhouse_server_exception_surfaces()


def test_selftest_ch_compressed_execute(monkeypatch):
    """The body now runs a REAL typed SELECT (round 14): the twin
    answers it from the evaluating native fake's machinery with the
    rows system.numbers would produce, encoded by the TEST-side
    column encoders -- so the production select_rows decode path
    executes in the default suite."""
    from tests.test_syncverify_native import _MiniNativeCH, _wr_block

    class _NumbersCH(_MiniNativeCH):
        def _answer(self, sql, send, compressed):
            if "system.numbers" in sql:
                cols = [("n", "UInt64"), ("s", "String"),
                        ("f", "Float64"), ("m", "Nullable(UInt64)")]
                rows = [(i, str(i), i / 2,
                         None if i % 2 == 0 else i) for i in range(5)]
                send(_wr_block(cols, rows, compressed))
                return
            super()._answer(sql, send, compressed)

    srv = _NumbersCH([], [], ["id"], 8)
    monkeypatch.setenv("CLICKHOUSE_ADDR", srv.addr)
    monkeypatch.delenv("CLICKHOUSE_USER", raising=False)
    monkeypatch.delenv("CLICKHOUSE_PASSWORD", raising=False)
    try:
        IT.test_clickhouse_compressed_select_readback_via_native()
        assert any("CREATE DATABASE" in q for q in srv.queries)
    finally:
        srv.stop()


def test_selftest_ch_native_tls(monkeypatch, tmp_path):
    import ssl

    from tests.test_mysql_repl import _self_signed_cert

    certfile, keyfile = _self_signed_cert(tmp_path)
    sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(certfile, keyfile)
    native = _FakeNativeClickHouse()
    native._srv.socket = sctx.wrap_socket(native._srv.socket,
                                          server_side=True)
    native.start()
    try:
        monkeypatch.setenv("CLICKHOUSE_SECURE_ADDR",
                           f"{native.host}:{native.port}")
        monkeypatch.setenv("CLICKHOUSE_CA", str(certfile))
        monkeypatch.setenv("CLICKHOUSE_TLS_INSECURE", "1")
        IT.test_clickhouse_native_tls_insert()
        assert any("tls_probe" in sql for sql, _ in native.inserts)
    finally:
        native.stop()


def test_selftest_ddl_replication(mysql_fake_env, ch_fake_env,
                                  tmp_path):
    """Twin of test_ddl_replication_mysql_to_clickhouse: the same
    decode -> parse -> typed-apply chain against the fakes. The real
    body's DESCRIBE readback needs a live server, so the twin asserts
    the ALTER the native fake RECEIVED instead -- every other line of
    harness code executes."""
    from mysql_syncer_clickhouse_spark.sinks.clickhouse_native import (
        ClickHouseNativeSink)
    from mysql_syncer_clickhouse_spark.sources import ddl as ddlmod
    from mysql_syncer_clickhouse_spark.sources.binlog import (
        decode_binlog_ddl)
    from mysql_syncer_clickhouse_spark.sources.mysql_repl import (
        ReplicationClient, tail_to_relay)
    import os as _os

    # the fake serves the t_probe stream; append a DDL-bearing file
    enc = Enc()
    enc.query("ALTER TABLE msc_interop.t_ddlrep ADD COLUMN price "
              "DECIMAL(10,2) NOT NULL AFTER title, ADD INDEX i (t)",
              schema="msc_interop")
    mysql_fake_env.files["mysql-bin.000002"] = enc.bytes()

    host, _, port = _os.environ["MYSQL_ADDR"].rpartition(":")
    tailer = ReplicationClient(host, int(port), user=USER,
                               password=PASSWORD)
    tailer.connect()
    relay = str(tmp_path / "relay")
    try:
        tail_to_relay(tailer, relay, "mysql-bin.000001", non_block=True)
    finally:
        tailer.close()
    ddls = []
    for f in sorted(_os.listdir(relay)):
        if "bin" in f:
            with open(_os.path.join(relay, f), "rb") as fh:
                ddls.extend(decode_binlog_ddl(f, fh.read()))
    stmts = [d for d in ddls if "t_ddlrep" in d["query"]]
    assert len(stmts) == 1
    actions = ddlmod.parse_mysql_ddl(stmts[0]["query"],
                                     default_schema=stmts[0]["db"])
    assert [a.kind for a in actions] == ["add_column", "ignored"]

    nat_host, _, nat_port = _os.environ["CLICKHOUSE_ADDR"].rpartition(":")
    sink = ClickHouseNativeSink(
        host=nat_host, port=int(nat_port), database="msc_interop",
        table="t_ddlrep",
        columns=[("id", "bigint", False), ("title", "varchar(64)", True)],
        pk=("id",))
    executed = ddlmod.apply_ddl_to_sink(sink, actions)
    assert executed == [
        "ALTER TABLE `msc_interop`.`t_ddlrep` ADD COLUMN IF NOT "
        "EXISTS `price` Decimal(10,2) AFTER `title`"]
    assert executed[0] in ch_fake_env.queries
    assert [c[0] for c in sink.columns] == ["id", "title", "price"]


def test_selftest_osc_migration_replay(mysql_fake_env, ch_fake_env,
                                       tmp_path):
    """Twin of test_osc_migration_replays_on_real_servers: the pt-osc
    shadow sequence (CREATE LIKE -> ALTER shadow -> RENAME swap)
    tailed from the fake MySQL, tracked by ShadowLedger, replayed onto
    the fake ClickHouse -- asserting the ALTER the native fake
    RECEIVED instead of the real body's DESCRIBE readback."""
    import os as _os

    from mysql_syncer_clickhouse_spark.plans.rules import Rule
    from mysql_syncer_clickhouse_spark.sinks.clickhouse_native import (
        ClickHouseNativeSink)
    from mysql_syncer_clickhouse_spark.sources import ddl as ddlmod
    from mysql_syncer_clickhouse_spark.sources.binlog import (
        decode_binlog_ddl)
    from mysql_syncer_clickhouse_spark.sources.mysql_repl import (
        ReplicationClient, tail_to_relay)

    enc = Enc()
    enc.query("CREATE TABLE msc_interop._t_osc_new "
              "LIKE msc_interop.t_osc", schema="msc_interop")
    enc.query("ALTER TABLE msc_interop._t_osc_new "
              "ADD COLUMN price DECIMAL(10,2) NOT NULL AFTER title",
              schema="msc_interop")
    enc.query("RENAME TABLE msc_interop.t_osc TO "
              "msc_interop._t_osc_old, msc_interop._t_osc_new "
              "TO msc_interop.t_osc", schema="msc_interop")
    mysql_fake_env.files["mysql-bin.000002"] = enc.bytes()

    host, _, port = _os.environ["MYSQL_ADDR"].rpartition(":")
    tailer = ReplicationClient(host, int(port), user=USER,
                               password=PASSWORD)
    tailer.connect()
    relay = str(tmp_path / "relay")
    try:
        tail_to_relay(tailer, relay, "mysql-bin.000001", non_block=True)
    finally:
        tailer.close()
    ddls = []
    for f in sorted(_os.listdir(relay)):
        if "bin" in f:
            with open(_os.path.join(relay, f), "rb") as fh:
                ddls.extend(decode_binlog_ddl(f, fh.read()))
    stmts = [d for d in ddls if "osc" in d["query"]]
    assert len(stmts) == 3

    rule = Rule(source_schema="msc_interop", source_table="t_osc",
                sink_schema="msc_interop", sink_table="t_osc",
                pk=("id",))
    ledger = ddlmod.ShadowLedger()
    replays = []
    for d in stmts:
        for a in ddlmod.parse_mysql_ddl(d["query"],
                                        default_schema=d["db"]):
            r, warns = ledger.observe(a, [rule])
            assert warns == [], warns
            replays.extend(r)
    assert len(replays) == 1
    _, acts = replays[0]

    nat_host, _, nat_port = _os.environ["CLICKHOUSE_ADDR"].rpartition(":")
    sink = ClickHouseNativeSink(
        host=nat_host, port=int(nat_port), database="msc_interop",
        table="t_osc",
        columns=[("id", "bigint", False),
                 ("title", "varchar(64)", True)],
        pk=("id",))
    executed = ddlmod.apply_ddl_to_sink(sink, acts, rule=rule)
    assert executed == [
        "ALTER TABLE `msc_interop`.`t_osc` ADD COLUMN IF NOT "
        "EXISTS `price` Decimal(10,2) AFTER `title`"]
    assert executed[0] in ch_fake_env.queries
    assert [c[0] for c in sink.columns] == ["id", "title", "price"]


# ------------------------------------------------ sync-verify checksum


class _ChecksumHTTPFake:
    """Twin of the real server for the checksum interop bodies: an
    HTTP endpoint that ACCEPTS the bodies' DDL/INSERT traffic and
    EVALUATES cityHash64 probes and the emitted digest aggregate with
    its own converters (epoch-micros for DateTime64, quantized
    Decimal rendering) -- an independent re-statement of the
    canonical-rendering contract, not a replay of the module's Spark
    expressions."""

    def __init__(self):
        self.rows: list[dict] = []
        self._lock = threading.Lock()
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):               # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                q = urllib.parse.parse_qs(
                    urllib.parse.urlparse(self.path).query)
                query = q.get("query", [""])[0]
                resp = outer._serve(query, body)
                self.send_response(200)
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

            def log_message(self, *a):
                pass

        self._httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler)
        self.addr = (f"127.0.0.1:{self._httpd.server_address[1]}")
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()

    # canonical rendering, independent implementation
    def _canon(self, r: dict) -> bytes:
        from tests.test_interop import CHECKSUM_T_COLUMNS
        parts = []
        for name, typ in CHECKSUM_T_COLUMNS:
            v = r.get(name)
            if v is None:
                parts.append("N")
                continue
            if typ.startswith("Nullable("):
                typ_i = typ[len("Nullable("):-1]
            else:
                typ_i = typ
            if typ_i.startswith("DateTime64"):
                dt_v = datetime.datetime.strptime(
                    v, "%Y-%m-%d %H:%M:%S.%f")
                epoch = datetime.datetime(1970, 1, 1)
                s = str(int((dt_v - epoch).total_seconds()) * 10**6
                        + dt_v.microsecond)
            elif typ_i.startswith("Decimal"):
                s = str(Decimal(v).quantize(Decimal("0.01")))
            elif typ_i.startswith("Float"):
                s = str(struct.unpack(
                    "<Q", struct.pack("<d", float(v)))[0])
            else:
                s = str(v)
            parts.append(f"{len(s.encode())}:{s}")
        return "".join(parts).encode()

    def _serve(self, query: str, body: bytes) -> bytes:
        import collections
        import json as _json
        import re

        from mysql_syncer_clickhouse_spark.sinks.cityhash102 import (
            cityhash64)
        with self._lock:
            m = re.match(r"SELECT cityHash64\(unhex\('([0-9a-f]*)'\)\)",
                         query)
            if m:
                return str(cityhash64(
                    bytes.fromhex(m.group(1)))).encode()
            if query.startswith("INSERT"):
                for line in body.decode().splitlines():
                    if line.strip():
                        self.rows.append(_json.loads(line))
                return b""
            if query.startswith(("CREATE", "DROP")):
                if query.startswith("DROP TABLE"):
                    self.rows.clear()
                return b""
            if "groupBitXor" in query:
                mm = re.search(r"%\s*(\d+)\s+AS bucket", query)
                n = int(mm.group(1))
                sm = re.search(r"WHERE bucket % (\d+) = (\d+)", query)
                sample = ((int(sm.group(1)), int(sm.group(2)))
                          if sm else None)
                agg = collections.defaultdict(lambda: [0, 0, 0])
                for r in self.rows:
                    fp = cityhash64(self._canon(r))
                    pk = str(r["id"])
                    b = cityhash64(
                        f"{len(pk)}:{pk}".encode()) % n
                    if sample and b % sample[0] != sample[1]:
                        continue
                    agg[b][0] += 1
                    agg[b][1] ^= fp
                    agg[b][2] += fp
                return "".join(
                    f"{b}\t{v[0]}\t{v[1]}\t{v[2]}\n"
                    for b, v in sorted(agg.items())).encode()
            return b""

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()


@pytest.fixture()
def checksum_fake_env(monkeypatch):
    srv = _ChecksumHTTPFake()
    monkeypatch.setenv("CLICKHOUSE_HTTP_ADDR", srv.addr)
    monkeypatch.delenv("CLICKHOUSE_USER", raising=False)
    monkeypatch.delenv("CLICKHOUSE_PASSWORD", raising=False)
    yield srv
    srv.stop()


def test_selftest_cityhash64_probe(checksum_fake_env):
    """Keeps the battery/probe plumbing executing. The fake answers
    with the pure-Python CityHash64, so this twin validates query
    construction and response parsing -- algorithm-level validation
    is only meaningful against a real server (the gated test)."""
    IT.test_cityhash64_matches_real_server()


def test_selftest_checksum_digest(checksum_fake_env, spark):
    """The full digest round-trip against the evaluating fake: the
    body's CREATE/INSERT traffic lands in the fake's row store, the
    emitted aggregate is EVALUATED with independent converters, and
    the Spark-side digest must agree (then disagree after the
    perturbing INSERT)."""
    IT.checksum_digest_roundtrip(spark)


def test_selftest_checksum_digest_native(spark):
    """The round-14 NATIVE digest round-trip against the evaluating
    native fake (test_syncverify_native._MiniNativeCH): insert_blocks
    lands typed rows in its store, the emitted aggregate is evaluated
    with its independent typed canonical renderer (float bits,
    fixed-scale decimals, epoch micros), and the typed-block decode
    of the result must agree with Spark's pushdown digest -- at a
    non-power-of-two bucket count."""
    from tests.test_interop import CHECKSUM_T_COLUMNS
    from tests.test_syncverify_native import _MiniNativeCH
    srv = _MiniNativeCH([], CHECKSUM_T_COLUMNS, ["id"], 1000)
    try:
        IT.checksum_digest_roundtrip_native(spark, srv.host, srv.port)
    finally:
        srv.stop()
