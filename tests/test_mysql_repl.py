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


def _artificial_rotate(next_file: str, checksummed: bool = True) -> bytes:
    """Server-style artificial ROTATE (ts=0, log_pos=0); a
    checksumming server checksums fake rotates too, a
    binlog_checksum=NONE server does not."""
    import zlib
    body = struct.pack("<Q", 4) + next_file.encode()
    size = 19 + len(body) + (4 if checksummed else 0)
    hdr = struct.pack("<IBIIIH", 0, B.ROTATE_EVENT, 99, size, 0, 0x20)
    ev = hdr + body
    if checksummed:
        ev += struct.pack("<I", zlib.crc32(ev))
    return ev


class FakeMySQL:
    """v10 handshake + COM_QUERY(OK) + COM_REGISTER_SLAVE +
    COM_BINLOG_DUMP streaming scripted binlog files."""

    def __init__(self, binlog_files: dict[str, bytes]):
        self.files = dict(sorted(binlog_files.items()))
        self.commands: list[tuple[int, bytes]] = []
        self.auth_ok: list[bool] = []
        self.gtid_blobs: list[bytes] = []
        self.mysql84 = False        # 8.4: SHOW MASTER STATUS removed
        self.binlog_checksum = "CRC32"   # what @@global reports
        # reconnect-test hook: drop_plan[k] = abruptly close the k-th
        # dump connection after that many event packets; connections
        # beyond the plan stream to completion
        self.drop_plan: list[int] = []
        self.dump_count = 0
        # full-auth mode: advertise caching_sha2_password and demand
        # perform-full-authentication via the RSA exchange (the cold
        # auth-cache first connect of a stock MySQL 8); set to an
        # (private_key, public_pem) pair from _rsa_keypair()
        self.full_auth_rsa = None
        # GTID-aware dump hook: fn(decoded_set_text) -> files dict to
        # stream for a COM_BINLOG_DUMP_GTID (a real server serves only
        # the transactions NOT in the announced set; tests script that
        # subset here). None = stream self.files (legacy behavior).
        self.gtid_files_fn = None
        # what SELECT @@GLOBAL.gtid_executed reports; None = a server
        # without GTID support (generic OK, no resultset)
        self.gtid_executed: str | None = None
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
        plugin = (b"caching_sha2_password" if self.full_auth_rsa
                  else b"mysql_native_password")
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
        greet += plugin + b"\x00"
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
        if self.full_auth_rsa is not None:
            # cold-cache caching_sha2: fast-auth scramble cannot
            # verify against a cache -> demand full authentication
            key, pem = self.full_auth_rsa
            ok = (user == USER
                  and auth == _indep_sha2_scramble(PASSWORD, NONCE))
            if ok:
                self._send_pkt(sock, seq + 1, b"\x01\x04")
                _, req = self._read_pkt(r)
                if req == b"\x02":          # public key requested
                    self._send_pkt(sock, seq + 3, b"\x01" + pem)
                    _, ct = self._read_pkt(r)
                else:
                    ct = req                # out-of-band key: payload
                pt = _oaep_sha1_decrypt(key, bytes(ct))
                want = bytes(c ^ NONCE[i % len(NONCE)] for i, c in
                             enumerate(PASSWORD.encode() + b"\x00"))
                ok = pt == want
        else:
            ok = (user == USER
                  and auth == _indep_scramble(PASSWORD, NONCE))
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
                elif sql.startswith("SELECT @@GLOBAL.BINLOG_CHECKSUM"):
                    self._send_resultset(
                        sock, [b"@@global.binlog_checksum"],
                        [self.binlog_checksum.encode()])
                elif sql.startswith("SELECT @@GLOBAL.GTID_EXECUTED") \
                        and self.gtid_executed is not None:
                    self._send_resultset(
                        sock, [b"@@GLOBAL.gtid_executed"],
                        [self.gtid_executed.encode()])
                elif sql.startswith("SELECT 1, NULL, 'X'"):
                    # the interop suite's probe row (selftest twin)
                    self._send_resultset(sock, [b"1", b"NULL", b"x"],
                                         [b"1", None, b"x"])
                else:
                    self._send_pkt(sock, 1,
                                   b"\x00\x00\x00\x02\x00\x00\x00")
            elif cmd[0] == R.COM_REGISTER_SLAVE:
                self._send_pkt(sock, 1, b"\x00\x00\x00\x02\x00\x00\x00")
            elif cmd[0] in (R.COM_BINLOG_DUMP, R.COM_BINLOG_DUMP_GTID):
                files = self.files
                if cmd[0] == R.COM_BINLOG_DUMP:
                    start_file = cmd[11:].decode()
                else:
                    # flags(2) server_id(4) name_len(4) name pos(8)
                    # data_len(4) gtid blob -- record the blob for
                    # the test's independent parse; stream everything
                    # (or what gtid_files_fn scripts for the set)
                    nlen = struct.unpack_from("<I", cmd, 7)[0]
                    dlen_off = 11 + nlen + 8
                    dlen = struct.unpack_from("<I", cmd, dlen_off)[0]
                    blob = cmd[dlen_off + 4:dlen_off + 4 + dlen]
                    with self._lock:
                        self.gtid_blobs.append(blob)
                    if self.gtid_files_fn is not None:
                        files = self.gtid_files_fn(
                            B.decode_gtid_set(blob))
                    start_file = ""
                with self._lock:
                    drop_after = (self.drop_plan[self.dump_count]
                                  if self.dump_count < len(self.drop_plan)
                                  else None)
                    self.dump_count += 1
                seq = 1
                sent = 0
                csum = self.binlog_checksum != "NONE"
                names = [n for n in files if n >= start_file]
                for k, name in enumerate(names):
                    self._send_pkt(sock, seq, b"\x00"
                                   + _artificial_rotate(name, csum))
                    seq += 1
                    for ev in _events_of(files[name]):
                        self._send_pkt(sock, seq, b"\x00" + ev)
                        seq += 1
                        sent += 1
                        if drop_after is not None and sent >= drop_after:
                            sock.close()    # simulated network blip
                            return
                # EOF (non-blocking dump end)
                self._send_pkt(sock, seq, b"\xfe\x00\x00\x02\x00")
                return
            else:
                self._send_pkt(sock, 1,
                               b"\xff" + struct.pack("<H", 1047)
                               + b"#08S01Unknown command")

    def _send_resultset(self, sock, names: list[bytes],
                        row: "list[bytes | None]") -> None:
        """Classic TEXT resultset, built independently: column count,
        column defs, EOF, one row of lenenc strings (None -> 0xFB),
        EOF."""
        def lenenc_str(s: bytes) -> bytes:
            return bytes([len(s)]) + s

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
        payload = b"".join(b"\xfb" if v is None else lenenc_str(v)
                           for v in row)
        seq += 1
        self._send_pkt(sock, seq, payload)
        seq += 1
        self._send_pkt(sock, seq, b"\xfe\x00\x00\x02\x00")

    def _send_master_status(self, sock) -> None:
        last = max(self.files)
        self._send_resultset(
            sock,
            [b"File", b"Position", b"Binlog_Do_DB",
             b"Binlog_Ignore_DB", b"Executed_Gtid_Set"],
            [last.encode(), str(len(self.files[last])).encode(),
             b"", b"", None])

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


def _run_auth(plugin: bytes, script, **client_kwargs):
    srv, state = _scripted_auth_server(script)
    state["plugin"] = plugin
    c = R.ReplicationClient(*srv.server_address,
                            user=USER, password=PASSWORD,
                            **client_kwargs)
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


# ---------------------------------------------------------------------------
# caching_sha2 FULL authentication (round 9): RSA exchange + TLS
# ---------------------------------------------------------------------------

def _rsa_keypair():
    """Test-side RSA keypair via the cryptography package (test
    dependency only -- the client under test is stdlib-only)."""
    cryptography = pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.public_key().public_bytes(
        serialization.Encoding.PEM,
        serialization.PublicFormat.SubjectPublicKeyInfo)
    return key, pem


def _oaep_sha1_decrypt(key, ct: bytes) -> bytes:
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding
    return key.decrypt(ct, padding.OAEP(
        mgf=padding.MGF1(algorithm=hashes.SHA1()),
        algorithm=hashes.SHA1(), label=None))


def test_rsa_pem_parse_matches_cryptography():
    key, pem = _rsa_keypair()
    n, e = R.rsa_public_key_from_pem(pem)
    nums = key.public_key().public_numbers()
    assert (n, e) == (nums.n, nums.e)
    # PKCS#1 form too (BEGIN RSA PUBLIC KEY)
    from cryptography.hazmat.primitives import serialization
    pem1 = key.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.PKCS1)
    assert R.rsa_public_key_from_pem(pem1) == (nums.n, nums.e)


def test_rsa_oaep_encrypt_decrypts_with_reference():
    """Our stdlib OAEP(SHA-1) ciphertext decrypts under the reference
    implementation, and the XOR obfuscation undoes to the
    NUL-terminated password -- the exact bytes libmysql expects."""
    key, pem = _rsa_keypair()
    n, e = R.rsa_public_key_from_pem(pem)
    msg = R.xor_password(PASSWORD, NONCE)
    ct = R.rsa_oaep_sha1_encrypt(msg, n, e)
    assert len(ct) == 256
    pt = _oaep_sha1_decrypt(key, ct)
    assert pt == msg
    assert bytes(c ^ NONCE[i % len(NONCE)]
                 for i, c in enumerate(pt)) == PASSWORD.encode() + b"\x00"


def test_rsa_oaep_rejects_oversized_message():
    key, pem = _rsa_keypair()
    n, e = R.rsa_public_key_from_pem(pem)
    with pytest.raises(R.MySQLProtocolError, match="too long"):
        R.rsa_oaep_sha1_encrypt(bytes(256 - 41), n, e)


def test_full_auth_rsa_with_public_key_retrieval():
    """perform-full-authentication without TLS: the client sends 0x02,
    receives the PEM key, and returns an RSA-OAEP ciphertext that the
    server-side reference decrypt verifies against XOR(password+NUL,
    nonce)."""
    key, pem = _rsa_keypair()
    seen = {}

    def script(sock, r, seq, auth):
        FakeMySQL._send_pkt(sock, seq + 1, b"\x01\x04")
        _, req = FakeMySQL._read_pkt(r)
        seen["req"] = req
        FakeMySQL._send_pkt(sock, seq + 3, b"\x01" + pem)
        _, ct = FakeMySQL._read_pkt(r)
        seen["pt"] = _oaep_sha1_decrypt(key, bytes(ct))
        FakeMySQL._send_pkt(sock, seq + 5,
                            b"\x00\x00\x00\x02\x00\x00\x00")

    c = _run_auth(b"caching_sha2_password", script,
                  allow_public_key_retrieval=True)
    c.close()
    assert seen["req"] == b"\x02"
    assert seen["pt"] == R.xor_password(PASSWORD, NONCE)


def test_full_auth_rsa_with_out_of_band_key():
    """server_public_key= (the secure option): no in-band key request
    -- the ciphertext is the very next packet after the 0x04."""
    key, pem = _rsa_keypair()
    seen = {}

    def script(sock, r, seq, auth):
        FakeMySQL._send_pkt(sock, seq + 1, b"\x01\x04")
        _, ct = FakeMySQL._read_pkt(r)
        seen["pt"] = _oaep_sha1_decrypt(key, bytes(ct))
        FakeMySQL._send_pkt(sock, seq + 3,
                            b"\x00\x00\x00\x02\x00\x00\x00")

    c = _run_auth(b"caching_sha2_password", script,
                  server_public_key=pem)
    c.close()
    assert seen["pt"] == R.xor_password(PASSWORD, NONCE)


def test_full_auth_after_auth_switch_uses_fresh_nonce():
    """AuthSwitchRequest to caching_sha2 followed by full auth: the
    RSA payload must XOR against the SWITCHED nonce, not the
    handshake's."""
    key, pem = _rsa_keypair()
    fresh = bytes(range(40, 60))
    seen = {}

    def script(sock, r, seq, auth):
        FakeMySQL._send_pkt(sock, seq + 1,
                            b"\xfe" + b"caching_sha2_password\x00"
                            + fresh + b"\x00")
        _, scr = FakeMySQL._read_pkt(r)
        seen["scramble"] = scr
        FakeMySQL._send_pkt(sock, seq + 3, b"\x01\x04")
        _, ct = FakeMySQL._read_pkt(r)
        seen["pt"] = _oaep_sha1_decrypt(key, bytes(ct))
        FakeMySQL._send_pkt(sock, seq + 5,
                            b"\x00\x00\x00\x02\x00\x00\x00")

    c = _run_auth(b"mysql_native_password", script,
                  server_public_key=pem)
    c.close()
    assert seen["scramble"] == _indep_sha2_scramble(PASSWORD, fresh)
    assert seen["pt"] == R.xor_password(PASSWORD, fresh)


def _recv_exact(sock, n: int) -> bytes:
    """Never over-reads -- safe to use right before a TLS upgrade."""
    b = b""
    while len(b) < n:
        c = sock.recv(n - len(b))
        if not c:
            raise ConnectionError("closed")
        b += c
    return b


def _self_signed_cert(tmp_path):
    import datetime

    cryptography = pytest.importorskip("cryptography")
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME,
                                         "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(days=1))
            .not_valid_after(now + datetime.timedelta(days=1))
            .add_extension(x509.SubjectAlternativeName(
                [x509.IPAddress(__import__("ipaddress")
                                .ip_address("127.0.0.1"))]),
                critical=False)
            .sign(key, hashes.SHA256()))
    certfile = tmp_path / "cert.pem"
    keyfile = tmp_path / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))
    return str(certfile), str(keyfile)


def test_full_auth_cleartext_inside_tls(tmp_path):
    """The TLS path end-to-end over real sockets: SSLRequest carries
    CLIENT_SSL, the tunnel is established (the client VERIFIES the
    server cert), the HandshakeResponse travels inside it, and
    perform-full-authentication is answered with the NUL-terminated
    password in the clear -- inside the tunnel only."""
    import socketserver
    import ssl

    certfile, keyfile = _self_signed_cert(tmp_path)
    seen = {}

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            try:
                sock = self.request
                greet = bytes([10]) + b"8.0.36-fake\x00"
                greet += struct.pack("<I", 7) + NONCE[:8] + b"\x00"
                caps = 0x200 | 0x800 | 0x8000 | 0x80000
                greet += struct.pack("<H", caps & 0xFFFF) + bytes([33])
                greet += struct.pack("<H", 0x0002)
                greet += struct.pack("<H", caps >> 16) + bytes([21])
                greet += bytes(10) + NONCE[8:] + b"\x00"
                greet += b"caching_sha2_password\x00"
                FakeMySQL._send_pkt(sock, 0, greet)
                # SSLRequest: exact reads only -- over-reading would
                # swallow the TLS ClientHello
                hdr = _recv_exact(sock, 4)
                n = hdr[0] | hdr[1] << 8 | hdr[2] << 16
                sslreq = _recv_exact(sock, n)
                seen["sslreq_caps"] = struct.unpack_from("<I", sslreq)[0]
                seen["sslreq_len"] = len(sslreq)
                sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
                sctx.load_cert_chain(certfile, keyfile)
                tls = sctx.wrap_socket(sock, server_side=True)
                r = FakeMySQL._Buf(tls)
                seq, resp = FakeMySQL._read_pkt(r)
                i = 4 + 4 + 1 + 23
                end = resp.index(b"\x00", i)
                seen["user"] = resp[i:end].decode()
                alen = resp[end + 1]
                seen["scramble"] = resp[end + 2:end + 2 + alen]
                FakeMySQL._send_pkt(tls, seq + 1, b"\x01\x04")
                _, pwd = FakeMySQL._read_pkt(r)
                seen["pwd"] = pwd
                FakeMySQL._send_pkt(tls, seq + 3,
                                    b"\x00\x00\x00\x02\x00\x00\x00")
                tls.unwrap()
            except (ConnectionError, OSError, ssl.SSLError):
                pass

    class Srv(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        import ssl as _ssl
        ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False          # IP SAN covers it; belt +
        ctx.verify_mode = _ssl.CERT_REQUIRED
        ctx.load_verify_locations(certfile)
        c = R.ReplicationClient(*srv.server_address, user=USER,
                                password=PASSWORD, ssl_context=ctx)
        c.connect()
        assert c.tls_active
        c.close()
    finally:
        srv.shutdown()
        srv.server_close()
    assert seen["sslreq_caps"] & 0x800      # CLIENT_SSL set
    assert seen["sslreq_len"] == 32         # header-only SSLRequest
    assert seen["user"] == USER
    assert seen["scramble"] == _indep_sha2_scramble(PASSWORD, NONCE)
    assert seen["pwd"] == PASSWORD.encode() + b"\x00"


def test_tls_refused_when_server_lacks_client_ssl():
    import ssl

    def script(sock, r, seq, auth):  # pragma: no cover - never reached
        pass

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    with pytest.raises(R.MySQLProtocolError, match="CLIENT_SSL"):
        _run_auth(b"caching_sha2_password", script, ssl_context=ctx)


# ---------------------------------------------------------------------------
# >=16MB packet splitting (round 9, ADVICE r8 medium)
# ---------------------------------------------------------------------------

def test_packet_split_reassembly_both_ways():
    """A payload >= 0xFFFFFF crosses the packet layer intact in both
    directions: send_packet splits into max-size chunks + a short (or
    empty) terminator; read_packet reassembles."""
    import socket as _socket

    a, b = _socket.socketpair()
    try:
        big = bytes(range(256)) * 65536 + b"tail"   # 16MB + 4
        wio = R._PacketIO(a)
        rio = R._PacketIO(b)
        t = threading.Thread(target=wio.send_packet, args=(big,),
                             kwargs={"seq": 0})
        t.start()
        got = rio.read_packet()
        t.join()
        assert got == big
        # exactly one max chunk: terminator must be the EMPTY packet
        a2, b2 = _socket.socketpair()
        try:
            w2, r2 = R._PacketIO(a2), R._PacketIO(b2)
            exact = bytes(0xFFFFFF)
            t = threading.Thread(target=w2.send_packet, args=(exact,),
                                 kwargs={"seq": 0})
            t.start()
            assert r2.read_packet() == exact
            t.join()
            assert w2.seq == 2              # max chunk + empty chunk
        finally:
            a2.close(); b2.close()
    finally:
        a.close(); b.close()


def test_small_packets_unchanged():
    import socket as _socket
    a, b = _socket.socketpair()
    try:
        w, r = R._PacketIO(a), R._PacketIO(b)
        w.send_packet(b"\x03SELECT 1", seq=0)
        assert r.read_packet() == b"\x03SELECT 1"
        assert r.seq == 1
    finally:
        a.close(); b.close()


# ---------------------------------------------------------------------------
# relay segments + checksum probe + auto-reconnect (round 9)
# ---------------------------------------------------------------------------

def test_repeated_tail_sessions_use_fresh_segments(fake_mysql, tmp_path):
    """ADVICE r8 (high): a second tail session must NOT append to
    relay files a previous session created (the Spark drain never
    re-reads a committed path). Each session gets its own rN- segment
    namespace; binlog_seq still keys on the trailing server suffix."""
    relay = tmp_path / "relay"
    for _ in range(2):
        c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                                user=USER, password=PASSWORD)
        R.tail_to_relay(c, str(relay), "mysql-bin.000001")
    names = sorted(p.name for p in relay.iterdir())
    assert names == ["mysql-bin.000001", "mysql-bin.000002",
                     "r1-mysql-bin.000001", "r1-mysql-bin.000002"]
    # session 1 files were not touched by session 2: byte-identical
    # to a fresh single-session tail
    solo = tmp_path / "solo"
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    R.tail_to_relay(c, str(solo), "mysql-bin.000001")
    for n in ("mysql-bin.000001", "mysql-bin.000002"):
        assert (relay / n).read_bytes() == (solo / n).read_bytes()
        assert (relay / f"r1-{n}").read_bytes() == \
            (solo / n).read_bytes()


def test_checksum_probe_respects_none_server(fake_mysql, tmp_path):
    """ADVICE r8 (low): against a binlog_checksum=NONE server the
    initial artificial ROTATE is unchecksummed; seeding `checksummed`
    from the client's own SET request would truncate the first relay
    file's name by 4 bytes. The probe reads @@global.binlog_checksum
    instead."""
    fake_mysql.binlog_checksum = "NONE"
    fake_mysql.files = {
        "mysql-bin.000001": _items_file_nocrc(1, [
            ("insert", [(1, "first", 10)]),
        ])}
    relay = tmp_path / "relay"
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    n = R.tail_to_relay(c, str(relay), "mysql-bin.000001")
    assert n >= 3
    assert sorted(p.name for p in relay.iterdir()) == \
        ["mysql-bin.000001"]               # NOT mysql-bin.0000 (-4)
    evs = list(B.iter_binlog_events(
        (relay / "mysql-bin.000001").read_bytes()))
    assert evs[0].type_code == B.FORMAT_DESCRIPTION_EVENT


def test_tail_resumable_survives_two_drops(fake_mysql, tmp_path, spark):
    """VERDICT r8 ask #3 e2e: the connection is killed mid-stream
    twice; tail_resumable reconnects, re-dumps from the relay's last
    complete position into fresh segments, and the decoded final
    state equals the uninterrupted run's -- no loss, no dup."""
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    fake_mysql.drop_plan = [3, 5]
    relay = tmp_path / "relay"
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                                   user=USER, password=PASSWORD)

    total = R.tail_resumable(factory, str(relay),
                             "mysql-bin.000001", 4,
                             retry_wait=0, sleep=lambda s: None)
    assert calls["n"] == 3                 # two drops + one clean run
    assert total > 0
    segs = sorted(p.name for p in relay.iterdir())
    assert any(s.startswith("r1-") for s in segs)
    assert any(s.startswith("r2-") for s in segs)
    env = B.read_binlog_files(spark, str(relay))
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    final = {r["id"]: (r["title"], r["qty"])
             for r in latest_state(cl, ["id"]).collect()}
    # identical to test_relay_through_spark_to_final_state's
    # uninterrupted topology
    assert final == {1: ("first-edited", 11), 3: ("third", 30)}


def test_tail_resumable_gives_up_without_progress(tmp_path):
    """A server that always refuses at the socket level exhausts
    max_reconnects instead of looping forever."""
    import socket as _socket
    # a listener that accepts and instantly closes
    lst = _socket.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(8)
    stop = threading.Event()

    def reaper():
        lst.settimeout(0.2)
        while not stop.is_set():
            try:
                s, _ = lst.accept()
                s.close()
            except OSError:
                continue

    t = threading.Thread(target=reaper, daemon=True)
    t.start()
    try:
        def factory():
            return R.ReplicationClient(*lst.getsockname(),
                                       user=USER, password=PASSWORD,
                                       timeout=2.0)
        with pytest.raises(R.MySQLProtocolError, match="gave up"):
            R.tail_resumable(factory, str(tmp_path / "relay"),
                             "mysql-bin.000001", 4,
                             max_reconnects=2, retry_wait=0,
                             sleep=lambda s: None)
    finally:
        stop.set()
        t.join()
        lst.close()


def _items_file_nocrc(file_no: int, rows_spec) -> bytes:
    """_items_file with checksum=NONE (a binlog_checksum=NONE
    server)."""
    enc = Enc(checksum=False)
    cols = [("id", B.T_LONGLONG, b"", False),
            ("title", B.T_VARCHAR, struct.pack("<H", 80), False),
            ("qty", B.T_LONG, b"", False)]
    enc.table_map(11, "app", "items", cols)
    from tests.test_binlog import e_i32, e_i64, e_varchar

    def img(id_, title, qty):
        return [e_i64(id_), e_varchar(title), e_i32(qty)]

    for op, rows in rows_spec:
        enc.rows(B.WRITE_ROWS_EVENT, 11, 3, [img(*r) for r in rows])
    enc.xid(1000 + file_no)
    return enc.bytes()


def test_relay_writer_tracks_resume_position(tmp_path):
    """server_file/next_pos follow the stream: the artificial ROTATE
    sets the file, each written event advances next_pos to its header
    log_pos (the next dump position)."""
    w = R.RelayWriter.for_new_session(str(tmp_path), checksummed=True)
    assert w.segment == 0
    w.append(_artificial_rotate("mysql-bin.000042"))
    assert w.server_file == "mysql-bin.000042" and w.next_pos == 4
    data = _items_file(42, [("insert", [(1, "a", 1)])])
    for ev in _events_of(data):
        w.append(ev)
    # last event's declared end position
    last_end = struct.unpack_from("<I", _events_of(data)[-1], 13)[0]
    assert w.next_pos == last_end > 4
    # a second writer in the same dir picks the next segment
    w2 = R.RelayWriter.for_new_session(str(tmp_path), checksummed=True)
    assert w2.segment == 1


# ---------------------------------------------------------------------------
# GTID auto-position composed end-to-end (round 9, VERDICT r8 ask #8)
# ---------------------------------------------------------------------------

def test_gtid_tail_composes_to_final_state(fake_mysql, tmp_path, spark):
    """GTID auto-position through the FULL topology: COM_BINLOG_DUMP_
    GTID (set announced as a parseable SID-block blob) -> relay ->
    distributed decode -> final state identical to the file+pos
    run's."""
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    relay = tmp_path / "relay"
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD)
    n = R.tail_to_relay(
        c, str(relay),
        gtid_set="3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5")
    assert n >= 6
    # the announced set reached the server as a decodable blob
    blob = fake_mysql.gtid_blobs[-1]
    assert B.decode_gtid_set(blob) == \
        "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5"
    env = B.read_binlog_files(spark, str(relay))
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    final = {r["id"]: (r["title"], r["qty"])
             for r in latest_state(cl, ["id"]).collect()}
    assert final == {1: ("first-edited", 11), 3: ("third", 30)}


def test_gtid_resume_with_drop_no_loss_no_dup(fake_mysql, tmp_path,
                                              spark):
    """VERDICT r8 stretch: a GTID-started tail whose connection drops
    mid-stream resumes and the final state shows no loss and no
    duplication. Round 10: the resume re-dumps BY GTID (the start set
    merged with every streamed GTID -- these fixture files carry
    none, so the set is unchanged) rather than per-server (file, pos);
    the overlap this re-streams dedups through the (pk, seq)
    idempotent apply, which is exactly what this test pins."""
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    fake_mysql.drop_plan = [4]
    relay = tmp_path / "relay"

    def factory():
        return R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                                   user=USER, password=PASSWORD)

    total = R.tail_resumable(
        factory, str(relay),
        gtid_set="3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5",
        retry_wait=0, sleep=lambda s: None)
    assert total > 0
    # both connections dump by GTID: the failover-portable coordinate
    dumps = [op for op, _ in fake_mysql.commands
             if op in (R.COM_BINLOG_DUMP, R.COM_BINLOG_DUMP_GTID)]
    assert dumps == [R.COM_BINLOG_DUMP_GTID, R.COM_BINLOG_DUMP_GTID]
    # the re-dump announced the same (unchanged) set as the start
    assert B.decode_gtid_set(fake_mysql.gtid_blobs[-1]) == \
        "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-5"
    env = B.read_binlog_files(spark, str(relay))
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    final = {r["id"]: (r["title"], r["qty"])
             for r in latest_state(cl, ["id"]).collect()}
    assert final == {1: ("first-edited", 11), 3: ("third", 30)}


# ---------------------------------------------------------------------------
# GTID-set checkpointing + server failover (round 10, VERDICT r9 ask #6)
# ---------------------------------------------------------------------------

SID_TEXT = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
SID = bytes.fromhex(SID_TEXT.replace("-", ""))


def _gtid_txn_file(file_no: int, txns) -> bytes:
    """A binlog file of GTID-framed transactions: per (gno, rows)
    entry, GTID_LOG_EVENT -> TABLE_MAP -> WRITE_ROWS -> XID."""
    enc = Enc()
    cols = [("id", B.T_LONGLONG, b"", False),
            ("title", B.T_VARCHAR, struct.pack("<H", 80), False),
            ("qty", B.T_LONG, b"", False)]
    from tests.test_binlog import e_i32, e_i64, e_varchar

    def img(id_, title, qty):
        return [e_i64(id_), e_varchar(title), e_i32(qty)]

    for gno, rows in txns:
        enc._event(B.GTID_LOG_EVENT,
                   bytes([1]) + SID + struct.pack("<q", gno))
        enc.table_map(11, "app", "items", cols)
        enc.rows(B.WRITE_ROWS_EVENT, 11, 3, [img(*r) for r in rows])
        enc.xid(9000 + gno)
    return enc.bytes()


def test_gtid_set_merge_and_canonical_text():
    s = R.GtidSet(f"{SID_TEXT}:1-3:7")
    s.add_gtid(f"{SID_TEXT}:5")
    assert s.text() == f"{SID_TEXT}:1-3:5:7"
    s.add_gtid(f"{SID_TEXT}:4")          # bridges 1-3 and 5
    assert s.text() == f"{SID_TEXT}:1-5:7"
    s.add_gtid(f"{SID_TEXT}:6")          # bridges to 7
    assert s.text() == f"{SID_TEXT}:1-7"
    s.add(SID_TEXT, 2, 4)                # fully contained: no-op
    assert s.text() == f"{SID_TEXT}:1-7"
    other = "11111111-2222-3333-4444-555555555555"
    s.add(other, 9)
    # uuid-sorted, round-trips through the wire codec
    assert s.text() == f"{other}:9,{SID_TEXT}:1-7"
    assert B.decode_gtid_set(B.encode_gtid_set(s.text())) == s.text()
    assert not R.GtidSet("")
    with pytest.raises(B.BinlogError):
        R.GtidSet("just-a-uuid-no-intervals")


def test_master_info_roundtrip_and_missing(tmp_path):
    path = str(tmp_path / "sub" / "master.info")
    fresh = R.MasterInfo.load(path)       # missing file -> empty info
    assert fresh.file is None and fresh.pos == 4 and not fresh.gtid_set
    fresh.file, fresh.pos = "mysql-bin.000042", 1543
    fresh.gtid_set = f"{SID_TEXT}:1-7"
    fresh.save()
    back = R.MasterInfo.load(path)
    assert (back.file, back.pos, back.gtid_set) == \
        ("mysql-bin.000042", 1543, f"{SID_TEXT}:1-7")


def test_relay_writer_feeds_gtid_tracker(tmp_path):
    w = R.RelayWriter.for_new_session(str(tmp_path), checksummed=True)
    w.gtid_tracker = R.GtidSet("")
    w.append(_artificial_rotate("mysql-bin.000001"))
    for ev in _events_of(_gtid_txn_file(1, [
            (1, [(1, "a", 1)]), (2, [(2, "b", 2)])])):
        w.append(ev)
    assert w.gtid_tracker.text() == f"{SID_TEXT}:1-2"


def test_mariadb_gtid_state_and_tracker(tmp_path):
    """The MariaDB half of master.info: latest (domain, server, seq)
    per domain, fed from MARIADB_GTID_EVENTs (seq u64 + domain u32
    body; server id from the common header)."""
    st = R.MariadbGtidState("0-1-42,1-2-7")
    st.update(0, 3, 50)          # higher seq replaces, server follows
    st.update(1, 2, 5)           # lower seq ignored
    assert st.text() == "0-3-50,1-2-7"
    assert R.MariadbGtidState(st.text()).text() == st.text()
    assert not R.MariadbGtidState("")

    w = R.RelayWriter.for_new_session(str(tmp_path), checksummed=True)
    w.mariadb_tracker = R.MariadbGtidState("")
    w.append(_artificial_rotate("mariadb-bin.000001"))
    enc = Enc()
    enc._event(B.MARIADB_GTID_EVENT, struct.pack("<QIB", 42, 0, 0))
    enc._event(B.MARIADB_GTID_EVENT, struct.pack("<QIB", 7, 1, 0))
    for ev in _events_of(enc.bytes()):
        w.append(ev)
    # Enc's common header stamps server_id 7
    assert w.mariadb_tracker.text() == "0-7-42,1-7-7"
    # round-trips through MasterInfo
    mi = R.MasterInfo(str(tmp_path / "mi.json"),
                      mariadb_gtid=w.mariadb_tracker.text())
    mi.save()
    assert R.MasterInfo.load(mi.path).mariadb_gtid == "0-7-42,1-7-7"


def test_gtid_failover_resume_across_servers(tmp_path, spark):
    """THE r9 ask-#6 done-criterion: a tail checkpointed by GTID set
    resumes against a SECOND server with entirely different binlog
    file names, no loss, no dup. Server A streams transactions 1-3;
    master.info persists the executed set; server B (files named
    b-bin.*) is scripted to serve exactly the NOT-in-set remainder
    (4-5) like a real auto-position master; the merged relay's final
    state carries all five transactions exactly once."""
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    relay = tmp_path / "relay"
    info_path = str(tmp_path / "master.info")

    srv_a = FakeMySQL({"a-bin.000001": _gtid_txn_file(1, [
        (1, [(1, "one", 10)]), (2, [(2, "two", 20)]),
        (3, [(3, "three", 30)])])})
    srv_a.start()
    info = R.MasterInfo.load(info_path)
    n1 = R.tail_resumable(
        lambda: R.ReplicationClient(srv_a.host, srv_a.port,
                                    user=USER, password=PASSWORD),
        str(relay), gtid_set="", non_block=True, master_info=info)
    srv_a.stop()
    assert n1 > 0
    saved = R.MasterInfo.load(info_path)
    assert saved.gtid_set == f"{SID_TEXT}:1-3"
    assert saved.file == "a-bin.000001"

    served_sets = []

    def files_for(set_text):
        served_sets.append(set_text)
        # a real master computes the complement of the announced set;
        # the script serves exactly what a 5-transaction B would
        return {"b-bin.000009": _gtid_txn_file(9, [
            (4, [(4, "four", 40)]), (5, [(5, "five", 50)])])}

    srv_b = FakeMySQL({})
    srv_b.gtid_files_fn = files_for
    srv_b.start()
    n2 = R.tail_resumable(
        lambda: R.ReplicationClient(srv_b.host, srv_b.port,
                                    user=USER, password=PASSWORD),
        str(relay), non_block=True,
        master_info=R.MasterInfo.load(info_path),
        resume_from_info=True)
    srv_b.stop()
    assert n2 > 0
    # B was asked for the complement of exactly what A delivered
    assert served_sets == [f"{SID_TEXT}:1-3"]
    # and the info now carries the union
    assert R.MasterInfo.load(info_path).gtid_set == f"{SID_TEXT}:1-5"

    env = B.read_binlog_files(spark, str(relay))
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    final = {r["id"]: (r["title"], r["qty"])
             for r in latest_state(cl, ["id"]).collect()}
    assert final == {1: ("one", 10), 2: ("two", 20), 3: ("three", 30),
                     4: ("four", 40), 5: ("five", 50)}
    # no dup: the changelog holds each insert exactly once
    assert cl.count() == 5


def test_gtid_reconnect_re_dumps_by_updated_set(tmp_path):
    """A GTID-mode tail that drops mid-stream reconnects with the
    UPDATED executed set (start set + streamed GTIDs) -- the
    failover-portable coordinate -- instead of falling back to the
    per-server (file, pos)."""
    srv = FakeMySQL({"mysql-bin.000001": _gtid_txn_file(1, [
        (1, [(1, "a", 1)]), (2, [(2, "b", 2)]), (3, [(3, "c", 3)])])})
    sets_seen = []

    def files_for(set_text):
        sets_seen.append(set_text)
        return srv.files
    srv.gtid_files_fn = files_for
    srv.drop_plan = [5]      # right after txn 1's XID
    srv.start()
    total = R.tail_resumable(
        lambda: R.ReplicationClient(srv.host, srv.port,
                                    user=USER, password=PASSWORD),
        str(tmp_path / "relay"), gtid_set="", non_block=True,
        retry_wait=0, sleep=lambda s: None)
    srv.stop()
    assert total > 0
    assert sets_seen[0] == ""
    # txn 1 completed before the drop; the re-dump announces it
    assert f"{SID_TEXT}:1" in sets_seen[1]
    dumps = [op for op, _ in srv.commands
             if op in (R.COM_BINLOG_DUMP, R.COM_BINLOG_DUMP_GTID)]
    assert dumps == [R.COM_BINLOG_DUMP_GTID, R.COM_BINLOG_DUMP_GTID]


def test_tail_through_cold_cache_full_auth(fake_mysql, tmp_path):
    """VERDICT r8 ask #2's literal done-criterion: the e2e tail runs
    THROUGH caching_sha2 full authentication -- the fake server
    advertises caching_sha2, rejects fast auth (cold cache), demands
    the RSA exchange, verifies the OAEP payload server-side with the
    reference decrypt, and only then serves the dump; the relay holds
    the same files as the native-auth run."""
    key, pem = _rsa_keypair()
    fake_mysql.full_auth_rsa = (key, pem)
    relay = tmp_path / "relay"
    c = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                            user=USER, password=PASSWORD,
                            allow_public_key_retrieval=True)
    n = R.tail_to_relay(c, str(relay), "mysql-bin.000001")
    assert n >= 6
    assert fake_mysql.auth_ok[-1] is True
    names = sorted(p.name for p in relay.iterdir())
    assert names == ["mysql-bin.000001", "mysql-bin.000002"]
    evs = list(B.iter_binlog_events(
        (relay / "mysql-bin.000001").read_bytes()))
    assert evs[0].type_code == B.FORMAT_DESCRIPTION_EVENT

    # out-of-band key variant (no 0x02 round trip)
    relay2 = tmp_path / "relay2"
    c2 = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                             user=USER, password=PASSWORD,
                             server_public_key=pem)
    assert R.tail_to_relay(c2, str(relay2), "mysql-bin.000001") == n

    # and a wrong password still fails loudly through the same path
    c3 = R.ReplicationClient(fake_mysql.host, fake_mysql.port,
                             user=USER, password="wrong",
                             allow_public_key_retrieval=True)
    with pytest.raises(R.MySQLServerError, match="denied"):
        c3.connect()


def test_file_pos_tail_does_not_persist_partial_gtid_set(tmp_path):
    """ADVICE r10 medium: a (file, pos)-mode tail's GTID tracker
    starts EMPTY and accumulates only GTIDs streamed since the tail
    began -- partial by construction. Persisting it would make a
    later `@info` resume auto-position from an incomplete executed
    set (the server re-sends the entire retained history). The
    master.info must carry file/pos ONLY; the gtid_set is persisted
    when the run STARTED in GTID mode (complete seed)."""
    srv = FakeMySQL({"mysql-bin.000001": _gtid_txn_file(1, [
        (1, [(1, "a", 1)]), (2, [(2, "b", 2)])])})
    srv.start()
    info_path = str(tmp_path / "master.info")
    info = R.MasterInfo.load(info_path)
    n = R.tail_resumable(
        lambda: R.ReplicationClient(srv.host, srv.port,
                                    user=USER, password=PASSWORD),
        str(tmp_path / "relay"), "mysql-bin.000001", non_block=True,
        master_info=info)
    srv.stop()
    assert n > 0
    saved = R.MasterInfo.load(info_path)
    assert saved.file == "mysql-bin.000001" and saved.pos > 4
    assert saved.gtid_set == ""          # partial set NOT persisted


def test_dump_exec_seeded_gtid_failover_e2e(tmp_path, spark):
    """VERDICT r10 ask #1's done-criterion: `--dump-exec` (stub
    mysqldump emitting gtid_purged + the 8.2+ CHANGE REPLICATION
    SOURCE comment) seeds <data_dir>/_master.info with the dump's
    COMPLETE executed set; `--tail @info` then resumes against a
    SECOND server with disjoint binlog file names -- GTID
    auto-position announces exactly the dump's set, the server serves
    the complement, and the final sink state carries every
    transaction exactly once (zero loss, zero dup)."""
    import os
    import stat
    import sys

    from mysql_syncer_clickhouse_spark.__main__ import (run_dump_exec,
                                                        run_tail)
    from mysql_syncer_clickhouse_spark.config import EngineConfig
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state

    toml = os.path.join(os.path.dirname(__file__), "..", "etc",
                        "river.toml")
    dump_text = (
        "-- MySQL dump 10.13  Distrib 8.2.0\n"
        f"SET @@GLOBAL.GTID_PURGED=/*!80000 '+'*/ '{SID_TEXT}:1-3';\n"
        "-- CHANGE REPLICATION SOURCE TO SOURCE_LOG_FILE="
        "'a-bin.000001', SOURCE_LOG_POS=1543;\n"
        "CREATE TABLE `items` (\n"
        "  `id` bigint NOT NULL,\n"
        "  `title` varchar(80) DEFAULT NULL,\n"
        "  `qty` bigint DEFAULT NULL,\n"
        "  PRIMARY KEY (`id`)\n"
        ") ENGINE=InnoDB;\n"
        "INSERT INTO `items` VALUES (1,'one',10),(2,'two',20),"
        "(3,'three',30);\n")
    golden = tmp_path / "golden.sql"
    golden.write_text(dump_text)
    stub = tmp_path / "mysqldump"
    stub.write_text(f"#!{sys.executable}\n"
                    "import sys\n"
                    f"sys.stdout.write(open({str(golden)!r}).read())\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    cfg = EngineConfig.from_toml(toml)
    cfg.data_dir = str(tmp_path / "log")
    out = run_dump_exec(cfg, str(stub), spark=spark)
    assert out[0]["gtid_set"] == f"{SID_TEXT}:1-3"
    assert out[1]["rows"] == 3
    seeded = R.MasterInfo.load(
        os.path.join(cfg.data_dir, "_master.info"))
    assert seeded.gtid_set == f"{SID_TEXT}:1-3"

    served_sets = []

    def files_for(set_text):
        served_sets.append(set_text)
        # a real promoted master serves the complement of the
        # announced set; B's files are named nothing like A's
        return {"b-bin.000009": _gtid_txn_file(9, [
            (4, [(4, "four", 40)]), (5, [(5, "five", 50)])])}

    srv_b = FakeMySQL({})
    srv_b.gtid_files_fn = files_for
    srv_b.start()
    cfg.source_addr = f"{srv_b.host}:{srv_b.port}"
    cfg.source_user, cfg.source_pass = USER, PASSWORD
    out = run_tail(cfg, "@info", spark=spark)
    srv_b.stop()
    assert out[0]["events_relayed"] > 0
    # auto-position announced EXACTLY the dump's executed set
    assert served_sets == [f"{SID_TEXT}:1-3"]
    # info now carries the union -- the next @info resume skips 1-5
    assert R.MasterInfo.load(
        os.path.join(cfg.data_dir, "_master.info")).gtid_set == \
        f"{SID_TEXT}:1-5"
    sink = spark.read.parquet(f"{cfg.data_dir}/olap.items_sink")
    final = {r["id"]: (r["es_title"], r["qty"])
             for r in latest_state(sink, ["id"]).collect()}
    assert final == {1: ("one", 10), 2: ("two", 20), 3: ("three", 30),
                     4: ("four", 40), 5: ("five", 50)}
    # zero dup: snapshot rows once (seq=-1), binlog rows once
    assert sink.count() == 5


def test_cli_tail_follow_continuous_loop(tmp_path, spark):
    """--tail --follow: the reference's continuous main loop. The
    catch-up drains file 1; the relay drain keeps running as a live
    streaming query; the next tail CYCLE re-dumps from the persisted
    master.info and finds a binlog file the server produced AFTER the
    catch-up -- its events land in a fresh relay segment the file
    source picks up. Final state carries both files' changes exactly
    once (overlap re-streamed by the file/pos re-dump dedups via
    seq)."""
    import os

    from mysql_syncer_clickhouse_spark.__main__ import run_tail
    from mysql_syncer_clickhouse_spark.config import EngineConfig
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state

    srv = FakeMySQL({
        "mysql-bin.000001": _items_file(1, [
            ("insert", [(1, "first", 10), (2, "second", 20)]),
        ]),
    })
    srv.start()
    toml = os.path.join(os.path.dirname(__file__), "..", "etc",
                        "river.toml")
    cfg = EngineConfig.from_toml(toml)
    cfg.data_dir = str(tmp_path / "log")
    cfg.source_addr = f"{srv.host}:{srv.port}"
    cfg.source_user, cfg.source_pass = USER, PASSWORD

    def on_sleep(_s):
        # "the server produced more binlog" between cycles
        with srv._lock:
            srv.files["mysql-bin.000002"] = _items_file(2, [
                ("insert", [(3, "third", 30)]),
                ("update", [[(1, "first", 10),
                             (1, "first-edited", 11)]]),
            ])

    try:
        out = run_tail(cfg, "mysql-bin.000001", follow=True,
                       max_cycles=1, sleep=on_sleep, spark=spark)
    finally:
        srv.stop()
    assert out[0]["cycles"] == 1
    assert any(line.get("mode") == "following" for line in out[1:])
    # drain everything the loop relayed, then stop the live queries
    for q in spark.streams.active:
        q.processAllAvailable()
        q.stop()
    sink = spark.read.parquet(f"{cfg.data_dir}/olap.items_sink")
    final = {r["id"]: r["es_title"]
             for r in latest_state(sink, ["id"]).collect()}
    assert final == {1: "first-edited", 2: "second", 3: "third"}
    # the cycle re-streamed file 1 (file/pos re-dump), so the RAW sink
    # may hold physical copies -- at-least-once relay; logical
    # exactly-once means every distinct (seq, op, id) appears, each
    # re-play byte-identical (seq derives from (file, pos, row))
    assert sink.select("seq", "op", "id").distinct().count() == 4


def test_file_pos_tail_seeds_complete_gtid_set_and_fails_over(
        tmp_path, spark):
    """VERDICT r11 ask #2's done-criterion: the two-server failover
    e2e with the FIRST tail starting in (file, pos) mode. The tail
    seeds its tracker from the server's @@GLOBAL.gtid_executed at
    register time, so master.info ends up with a COMPLETE executed
    set; `--tail @info` then resumes against a second server with
    disjoint binlog names in GTID auto-position mode -- the server
    serves exactly the complement, zero loss, zero dup."""
    from mysql_syncer_clickhouse_spark.operators.upsert import latest_state
    relay = tmp_path / "relay"
    info_path = str(tmp_path / "master.info")

    srv_a = FakeMySQL({"a-bin.000001": _gtid_txn_file(1, [
        (1, [(1, "one", 10)]), (2, [(2, "two", 20)]),
        (3, [(3, "three", 30)])])})
    srv_a.gtid_executed = f"{SID_TEXT}:1-3"
    srv_a.start()
    info = R.MasterInfo.load(info_path)
    n1 = R.tail_resumable(
        lambda: R.ReplicationClient(srv_a.host, srv_a.port,
                                    user=USER, password=PASSWORD),
        str(relay), "a-bin.000001", non_block=True, master_info=info)
    srv_a.stop()
    assert n1 > 0
    # the dump itself ran in file/pos mode...
    dumps = [op for op, _ in srv_a.commands
             if op in (R.COM_BINLOG_DUMP, R.COM_BINLOG_DUMP_GTID)]
    assert dumps == [R.COM_BINLOG_DUMP]
    # ...yet the info carries the COMPLETE seeded set
    saved = R.MasterInfo.load(info_path)
    assert saved.gtid_set == f"{SID_TEXT}:1-3"
    assert saved.file == "a-bin.000001"

    served_sets = []

    def files_for(set_text):
        served_sets.append(set_text)
        return {"b-bin.000009": _gtid_txn_file(9, [
            (4, [(4, "four", 40)]), (5, [(5, "five", 50)])])}

    srv_b = FakeMySQL({})
    srv_b.gtid_files_fn = files_for
    srv_b.start()
    n2 = R.tail_resumable(
        lambda: R.ReplicationClient(srv_b.host, srv_b.port,
                                    user=USER, password=PASSWORD),
        str(relay), non_block=True,
        master_info=R.MasterInfo.load(info_path),
        resume_from_info=True)
    srv_b.stop()
    assert n2 > 0
    assert served_sets == [f"{SID_TEXT}:1-3"]
    assert R.MasterInfo.load(info_path).gtid_set == f"{SID_TEXT}:1-5"

    env = B.read_binlog_files(spark, str(relay))
    cl = B.binlog_to_changelog(env, ROW_DDL, db="app", table="items")
    final = {r["id"]: (r["title"], r["qty"])
             for r in latest_state(cl, ["id"]).collect()}
    assert final == {1: ("one", 10), 2: ("two", 20), 3: ("three", 30),
                     4: ("four", 40), 5: ("five", 50)}
    assert cl.count() == 5


def test_seeded_set_not_persisted_before_catching_up(tmp_path):
    """The seed-gate safety half of r11 ask #2: the executed set read
    at register time is AHEAD of the relay until the tail catches up
    to the tip observed at the seed read. A tail cut short of that
    tip must NOT persist the set -- a crash + `@info` auto-position
    resume would skip the unapplied remainder."""
    srv = FakeMySQL({"mysql-bin.000001": _gtid_txn_file(1, [
        (1, [(1, "a", 1)]), (2, [(2, "b", 2)]), (3, [(3, "c", 3)])])})
    srv.gtid_executed = f"{SID_TEXT}:1-3"
    srv.start()
    info_path = str(tmp_path / "master.info")
    n = R.tail_resumable(
        lambda: R.ReplicationClient(srv.host, srv.port,
                                    user=USER, password=PASSWORD),
        str(tmp_path / "relay"), "mysql-bin.000001", non_block=True,
        max_events=3,                    # stops inside txn 1
        master_info=R.MasterInfo.load(info_path))
    srv.stop()
    assert n == 3
    saved = R.MasterInfo.load(info_path)
    assert saved.gtid_set == ""          # ahead-of-relay set withheld
    assert saved.file == "mysql-bin.000001" and saved.pos > 4


def test_cli_tail_apply_ddl_reaches_sink(tmp_path, spark):
    """--tail --apply-ddl: DDL QUERY events ride the relay like any
    other event; the typed ALTER lands on the ClickHouse sink before
    the drain (rule-mapped: title -> es_title)."""
    import os

    from mysql_syncer_clickhouse_spark.__main__ import run_tail
    from mysql_syncer_clickhouse_spark.config import EngineConfig
    from tests.test_binlog import e_i32, e_i64, e_varchar
    from tests.test_clickhouse_sink import _FakeClickHouse

    enc = Enc()
    cols = [("id", B.T_LONGLONG, b"", False),
            ("title", B.T_VARCHAR, struct.pack("<H", 80), False),
            ("qty", B.T_LONG, b"", False)]
    enc.table_map(11, "app", "items", cols)
    enc.rows(B.WRITE_ROWS_EVENT, 11, 3,
             [[e_i64(1), e_varchar("first"), e_i32(10)]])
    enc.xid(1)
    enc.query("ALTER TABLE items ADD COLUMN price decimal(10,2) "
              "NOT NULL AFTER title", schema="app")
    srv = FakeMySQL({"mysql-bin.000001": enc.bytes()}).start()
    ch = _FakeClickHouse().start()
    try:
        toml = os.path.join(os.path.dirname(__file__), "..", "etc",
                            "river.toml")
        cfg = EngineConfig.from_toml(toml)
        cfg.data_dir = str(tmp_path / "log")
        cfg.source_addr = f"{srv.host}:{srv.port}"
        cfg.source_user, cfg.source_pass = USER, PASSWORD
        cfg.sink_addr = ch.url
        out = run_tail(cfg, "mysql-bin.000001", spark=spark,
                       apply_ddl=True)
        assert out[0]["mode"] == "tail"
        alters = [q for q, _ in ch.requests if q.startswith("ALTER")]
        assert alters == [
            "ALTER TABLE `olap`.`items_sink` ADD COLUMN IF NOT EXISTS "
            "`price` Decimal(10,2) AFTER `es_title`"]
        # ALTER precedes the CREATE/INSERT drain requests that follow
        idx_alter = next(i for i, (q, _) in enumerate(ch.requests)
                         if q.startswith("ALTER"))
        idx_insert = next(i for i, (q, _) in enumerate(ch.requests)
                          if q.startswith("INSERT"))
        assert idx_alter < idx_insert
    finally:
        ch.stop()
        srv.stop()
