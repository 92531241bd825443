"""Replication-protocol client vs a fake MySQL server (real sockets,
no live MySQL in this sandbox). The fake implements the public v10
handshake server-side with an INDEPENDENT scramble check, records
every command, and streams the events of a binlog file built by the
test-side encoder from tests/test_binlog.py -- so the relay round
trip (wire -> relay files -> read_binlog_files -> changelog) is
checked end-to-end against bytes the module under test never
produced."""

from __future__ import annotations

import hashlib
import json
import socketserver
import struct
import threading

import pytest

from mysql_syncer_clickhouse_spark.sources import binlog as B
from mysql_syncer_clickhouse_spark.sources import mysql_repl as R
from tests.test_binlog import ROW_DDL, Enc, _items_file

NONCE = bytes(range(1, 21))                  # fixed 20-byte scramble
USER, PASSWORD = "repl", "s3cret"


def _indep_scramble(password: str, nonce: bytes) -> bytes:
    """Independent mysql_native_password (the public algorithm),
    written fresh here so a bug in the module can't self-verify."""
    s1 = hashlib.sha1(password.encode()).digest()
    s2 = hashlib.sha1(s1).digest()
    x = hashlib.sha1(nonce + s2).digest()
    return bytes(a ^ b for a, b in zip(s1, x))


def _events_of(file_bytes: bytes) -> list[bytes]:
    """Split a binlog file into raw event byte strings (independent
    framing: size field at header offset 9)."""
    out, pos = [], 4
    while pos + 19 <= len(file_bytes):
        size = struct.unpack_from("<I", file_bytes, pos + 9)[0]
        out.append(file_bytes[pos:pos + size])
        pos += size
    return out


def _artificial_rotate(next_file: str) -> bytes:
    """Server-style artificial ROTATE (ts=0, log_pos=0) with CRC32 --
    a checksumming server checksums fake rotates too."""
    import zlib
    body = struct.pack("<Q", 4) + next_file.encode()
    size = 19 + len(body) + 4
    hdr = struct.pack("<IBIIIH", 0, B.ROTATE_EVENT, 99, size, 0, 0x20)
    ev = hdr + body
    return ev + struct.pack("<I", zlib.crc32(ev))


class FakeMySQL:
    """v10 handshake + COM_QUERY(OK) + COM_REGISTER_SLAVE +
    COM_BINLOG_DUMP streaming scripted binlog files."""

    def __init__(self, binlog_files: dict[str, bytes]):
        self.files = dict(sorted(binlog_files.items()))
        self.commands: list[tuple[int, bytes]] = []
        self.auth_ok: list[bool] = []
        self.gtid_blobs: list[bytes] = []
        self.mysql84 = False        # 8.4: SHOW MASTER STATUS removed
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    outer._session(self.request)
                except (ConnectionError, OSError):
                    pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Server(("127.0.0.1", 0), Handler)
        self.host, self.port = self._srv.server_address

    # packet helpers (independent of the module under test). NB: must
    # BUFFER -- one recv() can return several protocol packets.
    class _Buf:
        def __init__(self, sock):
            self.sock, self.buf = sock, b""

        def read(self, n):
            while len(self.buf) < n:
                c = self.sock.recv(65536)
                if not c:
                    raise ConnectionError("closed")
                self.buf += c
            out, self.buf = self.buf[:n], self.buf[n:]
            return out

    @staticmethod
    def _read_pkt(r):
        hdr = r.read(4)
        n = hdr[0] | hdr[1] << 8 | hdr[2] << 16
        return hdr[3], r.read(n)

    @staticmethod
    def _send_pkt(sock, seq, payload):
        sock.sendall(len(payload).to_bytes(3, "little")
                     + bytes([seq & 0xFF]) + payload)

    def _session(self, sock) -> None:
        # v10 greeting: caps = PROTOCOL_41|SECURE_CONNECTION|PLUGIN_AUTH
        caps = 0x200 | 0x8000 | 0x80000 | 0x1 | 0x4
        greet = bytes([10]) + b"8.0.36-fake\x00"
        greet += struct.pack("<I", 7)               # thread id
        greet += NONCE[:8] + b"\x00"
        greet += struct.pack("<H", caps & 0xFFFF)
        greet += bytes([33])                        # charset
        greet += struct.pack("<H", 0x0002)          # status
        greet += struct.pack("<H", caps >> 16)
        greet += bytes([21])                        # auth data len
        greet += bytes(10)
        greet += NONCE[8:] + b"\x00"                # part2 + NUL
        greet += b"mysql_native_password\x00"
        self._send_pkt(sock, 0, greet)
        r = self._Buf(sock)
        seq, resp = self._read_pkt(r)
        # parse HandshakeResponse41: caps(4) maxpkt(4) charset(1) 23x0
        i = 4 + 4 + 1 + 23
        end = resp.index(b"\x00", i)
        user = resp[i:end].decode()
        i = end + 1
        alen = resp[i]
        auth = resp[i + 1:i + 1 + alen]
        ok = (user == USER and auth == _indep_scramble(PASSWORD, NONCE))
        with self._lock:
            self.auth_ok.append(ok)
        if not ok:
            self._send_pkt(sock, seq + 1,
                           b"\xff" + struct.pack("<H", 1045)
                           + b"#28000Access denied")
            return
        self._send_pkt(sock, seq + 1, b"\x00\x00\x00\x02\x00\x00\x00")
        while True:
            _, cmd = self._read_pkt(r)
            with self._lock:
                self.commands.append((cmd[0], cmd[1:]))
            if cmd[0] == R.COM_QUERY:
                sql = cmd[1:].decode().upper()
                if sql.startswith("SHOW MASTER STATUS"):
                    if self.mysql84:
                        # MySQL 8.4 removed the statement
                        self._send_pkt(
                            sock, 1, b"\xff" + struct.pack("<H", 1064)
                            + b"#42000You have an error in your SQL "
                              b"syntax")
                    else:
                        self._send_master_status(sock)
                elif sql.startswith("SHOW BINARY LOG STATUS"):
                    self._send_master_status(sock)
                else:
                    self._send_pkt(sock, 1,
                                   b"\x00\x00\x00\x02\x00\x00\x00")
            elif cmd[0] == R.COM_REGISTER_SLAVE:
                self._send_pkt(sock, 1, b"\x00\x00\x00\x02\x00\x00\x00")
            elif cmd[0] in (R.COM_BINLOG_DUMP, R.COM_BINLOG_DUMP_GTID):
                if cmd[0] == R.COM_BINLOG_DUMP:
                    start_file = cmd[11:].decode()
                else:
                    # flags(2) server_id(4) name_len(4) name pos(8)
                    # data_len(4) gtid blob -- record the blob for
                    # the test's independent parse; stream everything
                    nlen = struct.unpack_from("<I", cmd, 7)[0]
                    dlen_off = 11 + nlen + 8
                    dlen = struct.unpack_from("<I", cmd, dlen_off)[0]
                    with self._lock:
                        self.gtid_blobs.append(
                            cmd[dlen_off + 4:dlen_off + 4 + dlen])
                    start_file = ""
                seq = 1
                names = [n for n in self.files if n >= start_file]
                for k, name in enumerate(names):
                    self._send_pkt(sock, seq,
                                   b"\x00" + _artificial_rotate(name))
                    seq += 1
                    for ev in _events_of(self.files[name]):
                        self._send_pkt(sock, seq, b"\x00" + ev)
                        seq += 1
                # EOF (non-blocking dump end)
                self._send_pkt(sock, seq, b"\xfe\x00\x00\x02\x00")
                return
            else:
                self._send_pkt(sock, 1,
                               b"\xff" + struct.pack("<H", 1047)
                               + b"#08S01Unknown command")

    def _send_master_status(self, sock) -> None:
        """Classic TEXT resultset for SHOW MASTER STATUS, built
        independently: column count, 5 column defs, EOF, one row
        (current file, its byte size as position, '', '', NULL), EOF."""
        def lenenc_str(s: bytes) -> bytes:
            return bytes([len(s)]) + s

        names = [b"File", b"Position", b"Binlog_Do_DB",
                 b"Binlog_Ignore_DB", b"Executed_Gtid_Set"]
        seq = 1
        self._send_pkt(sock, seq, bytes([len(names)]))
        for nm in names:
            seq += 1
            # minimal column-def41 (catalog 'def', blanks, type blob)
            col = (lenenc_str(b"def") + lenenc_str(b"") * 3
                   + lenenc_str(nm) + lenenc_str(nm)
                   + bytes([0x0C]) + struct.pack("<HIBHB", 33, 255,
                                                 252, 0, 0)
                   + b"\x00\x00")
            self._send_pkt(sock, seq, col)
        seq += 1
        self._send_pkt(sock, seq, b"\xfe\x00\x00\x02\x00")
        last = max(self.files)
        row = (lenenc_str(last.encode())
               + lenenc_str(str(len(self.files[last])).encode())
               + lenenc_str(b"") + lenenc_str(b"") + b"\xfb")
        seq += 1
        self._send_pkt(sock, seq, row)
        seq += 1
        self._send_pkt(sock, seq, b"\xfe\x00\x00\x02\x00")

    def start(self):
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


@pytest.fixture()
def fake_mysql():
    files = {
        "mysql-bin.000001": _items_file(1, [
            ("insert", [(1, "first", 10), (2, "second", 20)]),
            ("update", [[(1, "first", 10), (1, "first-edited", 11)]]),
        ]),
        "mysql-bin.000002": _items_file(2, [
            ("delete", [(2, "second", 20)]),
            ("insert", [(3, "third", 30)]),
        ]),
    }
    srv = FakeMySQL(files).start()
    yield srv
    srv.stop()


def test_scramble_matches_independent_implementation():
    assert R.native_password_scramble(PASSWORD, NONCE) == \
        _indep_scramble(PASSWORD, NONCE)
    assert R.native_password_scramble("", NONCE) == b""


def test_handshake_register_dump_and_event_stream(fake_mysql):
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD,
                            server_id=1234)
    c.connect()
    assert fake_mysql.auth_ok == [True]
    assert c.server_version == "8.0.36-fake"
    c.query_ok("SET @master_binlog_checksum = 'CRC32'")
    c.register_and_dump("mysql-bin.000001", 4)
    evs = list(c.events())
    c.close()
    # the register packet carried our server_id
    reg = [p for op, p in fake_mysql.commands
           if op == R.COM_REGISTER_SLAVE][0]
    assert struct.unpack_from("<I", reg, 0)[0] == 1234
    dump = [p for op, p in fake_mysql.commands
            if op == R.COM_BINLOG_DUMP][0]
    assert struct.unpack_from("<I", dump, 0)[0] == 4       # start pos
    assert dump[10:].decode() == "mysql-bin.000001"
    # stream = 2 artificial rotates + both files' events; the decoder
    # consumes the raw event bytes directly (wire == disk form)
    rotates = [e for e in evs if e[4] == B.ROTATE_EVENT]
    assert len(rotates) == 2
    rows = []
    for ev in evs:
        if ev[4] in (B.WRITE_ROWS_EVENT, B.UPDATE_ROWS_EVENT,
                     B.DELETE_ROWS_EVENT):
            rows.append(ev)
    assert len(rows) == 4


def test_gtid_set_codec_golden_and_roundtrip():
    """SID-block encoding: hand-laid-out golden bytes + text
    round-trip through decode (independent of any server)."""
    text = "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5:7"
    blob = B.encode_gtid_set(text)
    # n_sids=1, sid, n_intervals=2, (1,6), (7,8) -- stop exclusive
    assert blob[:8] == struct.pack("<Q", 1)
    assert blob[8:24] == bytes.fromhex("3e11fa4771ca11e19e33c80aa9429562")
    assert blob[24:32] == struct.pack("<Q", 2)
    assert blob[32:48] == struct.pack("<QQ", 1, 6)
    assert blob[48:64] == struct.pack("<QQ", 7, 8)
    assert B.decode_gtid_set(blob) == text
    multi = ("3e11fa47-71ca-11e1-9e33-c80aa9429562:1-99,"
             "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee:3")
    assert B.decode_gtid_set(B.encode_gtid_set(multi)) == multi


def test_dump_gtid_sends_parseable_set_and_streams(fake_mysql):
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD,
                            server_id=77)
    c.connect()
    want = "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-21"
    c.register_and_dump_gtid(want)
    evs = list(c.events())
    c.close()
    assert len(fake_mysql.gtid_blobs) == 1
    assert B.decode_gtid_set(fake_mysql.gtid_blobs[0]) == want
    rows = [e for e in evs if e[4] in (B.WRITE_ROWS_EVENT,
                                       B.UPDATE_ROWS_EVENT,
                                       B.DELETE_ROWS_EVENT)]
    assert len(rows) == 4                    # both files streamed


def test_mariadb_gtid_dump_announces_session_state(fake_mysql):
    """flavor='mariadb': GTID position travels as session variables
    before a plain COM_BINLOG_DUMP with an empty file name."""
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    c.connect()
    c.register_and_dump_mariadb_gtid("0-1-42,1-2-7")
    evs = list(c.events())
    c.close()
    sets = [p.decode() for op, p in fake_mysql.commands
            if op == R.COM_QUERY]
    assert "SET @slave_connect_state = '0-1-42,1-2-7'" in sets
    assert "SET @mariadb_slave_capability = 4" in sets
    dump = [p for op, p in fake_mysql.commands
            if op == R.COM_BINLOG_DUMP][0]
    assert dump[10:] == b""                  # empty file name
    rows = [e for e in evs if e[4] in (B.WRITE_ROWS_EVENT,
                                       B.UPDATE_ROWS_EVENT,
                                       B.DELETE_ROWS_EVENT)]
    assert len(rows) == 4


def test_gtid_events_decoded_from_stream():
    """GTID_LOG_EVENT + PREVIOUS_GTIDS surface on BinlogEvent -- the
    checkpoint identities a GTID-mode tailer persists."""
    sid = bytes.fromhex("3e11fa4771ca11e19e33c80aa9429562")
    enc = Enc()
    enc._event(B.PREVIOUS_GTIDS_LOG_EVENT,
               B.encode_gtid_set(
                   "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-9"))
    enc._event(B.GTID_LOG_EVENT, bytes([1]) + sid
               + struct.pack("<Q", 10))
    evs = list(B.iter_binlog_events(enc.bytes()))
    assert evs[1].gtid_set == "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-9"
    assert evs[2].gtid == "3e11fa47-71ca-11e1-9e33-c80aa9429562:10"


def test_wrong_password_surfaces_server_error(fake_mysql):
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password="wrong")
    with pytest.raises(R.MySQLServerError, match=r"\[1045\].*denied"):
        c.connect()


def test_tail_to_relay_produces_real_binlog_files(fake_mysql, tmp_path):
    relay = tmp_path / "relay"
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    n = R.tail_to_relay(c, str(relay), "mysql-bin.000001")
    assert n >= 6                      # FDEs + row events + xids
    files = sorted(p.name for p in relay.iterdir())
    assert files == ["mysql-bin.000001", "mysql-bin.000002"]
    # each relay file IS a binlog file: magic + FDE + events, CRC ok
    for name in files:
        data = (relay / name).read_bytes()
        assert data[:4] == B.BINLOG_MAGIC
        evs = list(B.iter_binlog_events(data))
        assert evs[0].type_code == B.FORMAT_DESCRIPTION_EVENT


def test_cli_tail_mode_full_topology(fake_mysql, tmp_path, spark):
    """--tail: register on source_addr -> relay -> rules/apply drain,
    all from the reference's own river.toml fields."""
    import os

    from mysql_syncer_clickhouse_spark.__main__ import run_tail
    from mysql_syncer_clickhouse_spark.config import EngineConfig
    toml = os.path.join(os.path.dirname(__file__), "..", "etc",
                        "river.toml")
    cfg = EngineConfig.from_toml(toml)
    cfg.data_dir = str(tmp_path / "log")
    cfg.source_addr = f"{fake_mysql.host}:{fake_mysql.port}"
    cfg.source_user, cfg.source_pass = USER, PASSWORD
    cfg.server_id = 4242
    out = run_tail(cfg, "mysql-bin.000001", spark=spark)
    assert out[0]["mode"] == "tail" and out[0]["events_relayed"] >= 6
    assert out[1]["rule"] == "app:items"
    assert out[1]["ops"] == {"insert": 3, "update": 1, "delete": 1}
    reg = [p for op, p in fake_mysql.commands
           if op == R.COM_REGISTER_SLAVE][0]
    assert struct.unpack_from("<I", reg, 0)[0] == 4242
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    sink = spark.read.parquet(f"{cfg.data_dir}/olap.items_sink")
    final = {r["id"]: r["es_title"]
             for r in latest_state(sink, ["id"]).collect()}
    assert final == {1: "first-edited", 3: "third"}


def test_relay_through_spark_to_final_state(fake_mysql, tmp_path, spark):
    """The full topology: wire -> relay files -> distributed decode ->
    changelog -> upsert final state (the reference's river loop,
    river/sync.go:72-102, re-expressed as relay shipping)."""
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    relay = tmp_path / "relay"
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    R.tail_to_relay(c, str(relay), "mysql-bin.000001")
    env = B.read_binlog_files(spark, str(relay))
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    final = {r["id"]: (r["title"], r["qty"])
             for r in latest_state(cl, ["id"]).collect()}
    assert final == {1: ("first-edited", 11), 3: ("third", 30)}


def _indep_sha2_scramble(password: str, nonce: bytes) -> bytes:
    """Independent caching_sha2_password fast-auth scramble (public
    algorithm), written fresh so the module can't self-verify."""
    d1 = hashlib.sha256(password.encode()).digest()
    h = hashlib.sha256(hashlib.sha256(d1).digest() + nonce).digest()
    return bytes(a ^ b for a, b in zip(d1, h))


def _scripted_auth_server(script):
    """A one-connection server: sends the v10 greeting (plugin taken
    from the script), then drives `script(sock, buf, seq, auth_bytes)`
    after reading the HandshakeResponse."""
    import socketserver

    state = {}

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            try:
                greet = bytes([10]) + b"8.0.36-fake\x00"
                greet += struct.pack("<I", 7) + NONCE[:8] + b"\x00"
                caps = 0x200 | 0x8000 | 0x80000
                greet += struct.pack("<H", caps & 0xFFFF) + bytes([33])
                greet += struct.pack("<H", 0x0002)
                greet += struct.pack("<H", caps >> 16) + bytes([21])
                greet += bytes(10) + NONCE[8:] + b"\x00"
                greet += state["plugin"] + b"\x00"
                FakeMySQL._send_pkt(self.request, 0, greet)
                r = FakeMySQL._Buf(self.request)
                seq, resp = FakeMySQL._read_pkt(r)
                i = 4 + 4 + 1 + 23
                end = resp.index(b"\x00", i)
                alen = resp[end + 1]
                auth = resp[end + 2:end + 2 + alen]
                script(self.request, r, seq, auth)
            except (ConnectionError, OSError):
                pass

    class Srv(socketserver.ThreadingTCPServer):
        # threading + daemon: a handler blocked in recv (e.g. the
        # client refused before responding) must not deadlock shutdown
        allow_reuse_address = True
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, state


def _run_auth(plugin: bytes, script):
    srv, state = _scripted_auth_server(script)
    state["plugin"] = plugin
    c = R.ReplicationClient(*srv.server_address,
                            user=USER, password=PASSWORD)
    try:
        c.connect()
        return c
    except BaseException:
        if c.io is not None:
            c.io.sock.close()
        raise
    finally:
        srv.shutdown()
        srv.server_close()


def test_caching_sha2_fast_auth_succeeds():
    """Server advertises caching_sha2_password; the client's scramble
    verifies against an independent implementation; the server answers
    fast-auth-success (0x01 0x03) then OK."""
    seen = {}

    def script(sock, r, seq, auth):
        seen["auth"] = auth
        FakeMySQL._send_pkt(sock, seq + 1, b"\x01\x03")
        FakeMySQL._send_pkt(sock, seq + 2,
                            b"\x00\x00\x00\x02\x00\x00\x00")

    c = _run_auth(b"caching_sha2_password", script)
    assert seen["auth"] == _indep_sha2_scramble(PASSWORD, NONCE)
    assert c.io is not None
    c.close()


def test_caching_sha2_full_auth_refused_with_guidance():
    def script(sock, r, seq, auth):
        FakeMySQL._send_pkt(sock, seq + 1, b"\x01\x04")

    with pytest.raises(R.MySQLProtocolError,
                       match="full authentication"):
        _run_auth(b"caching_sha2_password", script)


def test_auth_switch_from_native_to_caching_sha2():
    """AuthSwitchRequest mid-auth: the client re-scrambles with the
    switched plugin's algorithm over the FRESH nonce."""
    fresh = bytes(range(40, 60))
    seen = {}

    def script(sock, r, seq, auth):
        seen["first"] = auth
        FakeMySQL._send_pkt(sock, seq + 1,
                            b"\xfe" + b"caching_sha2_password\x00"
                            + fresh + b"\x00")
        seq2, switched = FakeMySQL._read_pkt(r)
        seen["switched"] = switched
        FakeMySQL._send_pkt(sock, seq2 + 1, b"\x01\x03")
        FakeMySQL._send_pkt(sock, seq2 + 2,
                            b"\x00\x00\x00\x02\x00\x00\x00")

    c = _run_auth(b"mysql_native_password", script)
    assert seen["first"] == _indep_scramble(PASSWORD, NONCE)
    assert seen["switched"] == _indep_sha2_scramble(PASSWORD, fresh)
    c.close()


def test_auth_switch_to_unknown_plugin_errors():
    def script(sock, r, seq, auth):
        FakeMySQL._send_pkt(sock, seq + 1,
                            b"\xfe" + b"sha256_password\x00"
                            + NONCE + b"\x00")

    with pytest.raises(R.MySQLProtocolError,
                       match=r"switch to 'sha256_password'"):
        _run_auth(b"mysql_native_password", script)


def test_unknown_handshake_plugin_errors_before_sending_auth():
    def script(sock, r, seq, auth):  # pragma: no cover - never reached
        raise AssertionError("client should not have responded")

    with pytest.raises(R.MySQLProtocolError, match="not supported"):
        _run_auth(b"dialog", script)


def test_malformed_mariadb_gtid_list_rejected_before_any_io():
    c = R.ReplicationClient("127.0.0.1", 1, user=USER)
    with pytest.raises(R.MySQLProtocolError, match="malformed"):
        c.register_and_dump_mariadb_gtid("0-1-5'; DROP--")


def test_tail_to_relay_closes_socket_on_error(fake_mysql, tmp_path):
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password="wrong")
    with pytest.raises(R.MySQLServerError):
        R.tail_to_relay(c, str(tmp_path / "relay"), "mysql-bin.000001")
    assert c.io is not None and c.io.sock.fileno() == -1


def test_relay_writer_skips_heartbeats(tmp_path):
    """HEARTBEAT_LOG_EVENT is dump-stream keepalive: never written to
    relay files (an idle tail must not grow the relay)."""
    import zlib
    w = R.RelayWriter(str(tmp_path), checksummed=True)
    w.append(_artificial_rotate("mysql-bin.000009"))
    hb_body = b"mysql-bin.000009"
    size = 19 + len(hb_body) + 4
    hdr = struct.pack("<IBIIIH", 0, B.HEARTBEAT_LOG_EVENT, 99,
                      size, 0, 0)
    hb = hdr + hb_body
    hb += struct.pack("<I", zlib.crc32(hb))
    w.append(hb)
    data = (tmp_path / "mysql-bin.000009").read_bytes()
    assert data == B.BINLOG_MAGIC


def test_relay_carries_payload_and_partial_json_events(tmp_path, spark):
    """A MySQL 8 server with binlog_transaction_compression=ON and
    binlog_row_value_options=PARTIAL_JSON streams TRANSACTION_PAYLOAD
    envelopes and PARTIAL_UPDATE_ROWS events over the wire; the relay
    writer ships them verbatim and the distributed decode opens the
    envelope and replays the JSON diffs -- the whole round-8 decode
    surface composing with the tail topology."""
    from tests.test_binlog import (_PJ_COLS, _raw_frames, e_i32,
                                   e_json_diffs, e_json_obj,
                                   wrap_json_col)

    enc = Enc()
    inner = _raw_frames(lambda e: (
        e.table_map(9, "app", "j", _PJ_COLS),
        e.rows(B.WRITE_ROWS_EVENT, 9, 2,
               [[e_i32(1), wrap_json_col(e_json_obj(
                   {"a": 1, "tags": ["x"]}))]]),
        e.xid(7)))
    enc.payload(inner, usize=len(inner))
    enc.table_map(9, "app", "j", _PJ_COLS)
    before = [e_i32(1),
              wrap_json_col(e_json_obj({"a": 1, "tags": ["x"]}))]
    after = [e_i32(1), wrap_json_col(e_json_diffs(
        [(0, "$.a", 2), (1, "$.tags[1]", "y")]))]
    enc.rows_partial_update(9, 2, [(before, after, 1, bytes([1]))])
    file_bytes = enc.bytes()

    srv = FakeMySQL({"mysql-bin.000007": file_bytes}).start()
    try:
        c = R.ReplicationClient(srv.host, srv.port,
                                user=USER, password=PASSWORD)
        relay = tmp_path / "relay"
        R.tail_to_relay(c, str(relay), "mysql-bin.000007")
    finally:
        srv.stop()

    env = B.read_binlog_files(spark, str(relay))
    rows = {r["op"]: r for r in env.collect()}
    assert json.loads(rows["insert"]["after"])["doc"] == \
        {"a": 1, "tags": ["x"]}
    assert json.loads(rows["update"]["after"])["doc"] == \
        {"a": 2, "tags": ["x", "y"]}


def test_query_rows_and_master_status(fake_mysql):
    """TEXT resultset parsing against an independently-built resultset
    (column defs, lenenc string rows, 0xFB NULL, EOF framing)."""
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    c.connect()
    try:
        rows = c.query_rows("SHOW MASTER STATUS")
        assert len(rows) == 1
        assert rows[0][2] == "" and rows[0][4] is None   # NULL marker
        f, pos = c.master_status()
        assert f == "mysql-bin.000002" and pos > 4
        assert c.query_rows("SET @x = 1") == []          # OK: no rs
    finally:
        c.close()


def test_tail_without_checkpoint_starts_at_master_status(
        fake_mysql, tmp_path):
    """start_file=None: the tail resolves the server's CURRENT
    position via SHOW MASTER STATUS (canal's fresh-start bootstrap)
    and dumps from there -- only the last file's events arrive."""
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    n = R.tail_to_relay(c, str(tmp_path / "relay"), None)
    assert n > 0
    dumps = [d for (t, d) in fake_mysql.commands
             if t == R.COM_BINLOG_DUMP]
    assert len(dumps) == 1
    assert dumps[0][10:].decode() == "mysql-bin.000002"
    files = sorted(p.name for p in (tmp_path / "relay").iterdir())
    assert files == ["mysql-bin.000002"]


def test_cli_tail_mode_auto_position(fake_mysql, tmp_path, spark):
    """--tail with no START_FILE: the CLI resolves the server's
    current position (SHOW MASTER STATUS) and dumps from there."""
    import os

    from mysql_syncer_clickhouse_spark.__main__ import run_tail
    from mysql_syncer_clickhouse_spark.config import EngineConfig
    toml = os.path.join(os.path.dirname(__file__), "..", "etc",
                        "river.toml")
    cfg = EngineConfig.from_toml(toml)
    cfg.data_dir = str(tmp_path / "log")
    cfg.source_addr = f"{fake_mysql.host}:{fake_mysql.port}"
    cfg.source_user, cfg.source_pass = USER, PASSWORD
    out = run_tail(cfg, None, spark=spark)
    assert out[0]["mode"] == "tail" and out[0]["events_relayed"] > 0
    relay = tmp_path / "log" / "_relay"
    assert sorted(p.name for p in relay.iterdir()) == \
        ["mysql-bin.000002"]


def test_source_charset_reaches_the_handshake():
    """river.toml source_charset (reference river.go:107) becomes the
    HandshakeResponse41 charset byte (offset 8: caps(4) maxpkt(4))."""
    import socketserver

    seen = {}

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            try:
                greet = bytes([10]) + b"8.0.36-fake\x00"
                greet += struct.pack("<I", 7) + NONCE[:8] + b"\x00"
                caps = 0x200 | 0x8000 | 0x80000
                greet += struct.pack("<H", caps & 0xFFFF) + bytes([33])
                greet += struct.pack("<H", 0x0002)
                greet += struct.pack("<H", caps >> 16) + bytes([21])
                greet += bytes(10) + NONCE[8:] + b"\x00"
                greet += b"mysql_native_password\x00"
                FakeMySQL._send_pkt(self.request, 0, greet)
                r = FakeMySQL._Buf(self.request)
                seq, resp = FakeMySQL._read_pkt(r)
                seen["charset"] = resp[8]
                FakeMySQL._send_pkt(self.request, seq + 1,
                                    b"\x00\x00\x00\x02\x00\x00\x00")
            except (ConnectionError, OSError):
                pass

    class Srv(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = R.ReplicationClient(*srv.server_address, user=USER,
                                password=PASSWORD, charset="utf8mb4")
        c.connect()
        c.close()
    finally:
        srv.shutdown()
        srv.server_close()
    assert seen["charset"] == 45      # utf8mb4's collation id

    with pytest.raises(R.MySQLProtocolError, match="unknown charset"):
        R.ReplicationClient("127.0.0.1", 1, charset="klingon")


def test_master_status_falls_back_on_mysql_84(fake_mysql):
    """MySQL 8.4 removed SHOW MASTER STATUS (ER_PARSE_ERROR 1064);
    the client retries with SHOW BINARY LOG STATUS."""
    fake_mysql.mysql84 = True
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    c.connect()
    try:
        f, pos = c.master_status()
        assert f == "mysql-bin.000002" and pos > 4
    finally:
        c.close()


def test_relay_writer_rejects_corrupt_and_unsafe_events(tmp_path):
    """Wire events are server-controlled: short frames, size-field
    mismatches, and ROTATE names that would escape the relay
    directory all refuse loudly instead of writing garbage."""
    w = R.RelayWriter(str(tmp_path), checksummed=True)
    with pytest.raises(B.BinlogError, match="short wire event"):
        w.append(b"\x00\x01\x02")
    good = _artificial_rotate("mysql-bin.000001")
    bad_size = bytearray(good)
    bad_size[9] ^= 0x01
    with pytest.raises(B.BinlogError, match="size field"):
        w.append(bytes(bad_size))
    for evil in ("../escape", "a/b", "..", ""):
        ev = _artificial_rotate(evil)
        with pytest.raises(B.BinlogError, match="unsafe"):
            w.append(ev)
    assert list(tmp_path.iterdir()) == []   # nothing was written
