"""RFC 6455 client (S10): handshake, masking, control frames, the
fetch_since adapter, and the full in-engine path — a live WS server
feeding spark.readStream.format("odin_rest") with exactly-once rows."""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
import threading

import pytest

from odin_rs_spark.streaming.websocket import (
    OP_CLOSE,
    OP_PING,
    OP_TEXT,
    WebSocketClient,
    accept_token,
    decode_frame,
    encode_frame,
    ws_fetch_since,
)


class _Server:
    """In-process WS server: handshake per spec, snapshot-on-connect
    replay of `records`, optional ping before the data. Accepts many
    sequential connections (one per AvailableNow run)."""

    def __init__(self, records, ping_first=False, require_subscribe=None):
        self.records = records
        self.ping_first = ping_first
        self.require_subscribe = require_subscribe
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self.url = f"ws://127.0.0.1:{self.port}/feed"
        self.masked_ok = True
        self.stop = threading.Event()
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        self.sock.settimeout(0.2)
        while not self.stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except TimeoutError:
                continue
            except OSError:  # listener closed during shutdown
                break
            # accepted sockets inherit the listener's 0.2s accept-poll
            # timeout — reset before the handshake reads
            conn.settimeout(10.0)
            try:
                self._handle(conn)
            except OSError:
                pass

    def _handle(self, conn):
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        key = next(
            ln.split(b":", 1)[1].strip().decode()
            for ln in req.split(b"\r\n")
            if ln.lower().startswith(b"sec-websocket-key")
        )
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept_token(key)}\r\n\r\n"
            ).encode()
        )
        if self.require_subscribe is not None:
            op, payload = decode_frame(conn)
            # spec §5.3: client frames MUST be masked — decode_frame
            # unmasks; record whether the mask bit was actually set
            assert op == OP_TEXT
            if payload.decode() != self.require_subscribe:
                conn.close()
                return
        if self.ping_first:
            conn.sendall(encode_frame(OP_PING, b"hb", mask=False))
        for r in list(self.records):
            conn.sendall(encode_frame(OP_TEXT, json.dumps(r).encode(), mask=False))
        # leave open; client drains with a timeout

    def close(self):
        self.stop.set()
        self.sock.close()


def _recs(lo, hi):
    return [{"id": i, "value": i * 0.5} for i in range(lo, hi + 1)]


def test_handshake_and_frames():
    srv = _Server(_recs(1, 5))
    try:
        c = WebSocketClient(srv.url)
        got = [json.loads(c.recv()) for _ in range(5)]
        assert [g["id"] for g in got] == [1, 2, 3, 4, 5]
        c.close()
    finally:
        srv.close()


def test_client_frames_are_masked():
    """Capture the client's subscribe frame server-side and check the
    mask bit (RFC 6455 §5.3 requires client→server masking)."""
    seen = {}

    class Probe(_Server):
        def _handle(self, conn):
            req = b""
            while b"\r\n\r\n" not in req:
                req += conn.recv(4096)
            key = next(
                ln.split(b":", 1)[1].strip().decode()
                for ln in req.split(b"\r\n")
                if ln.lower().startswith(b"sec-websocket-key")
            )
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept_token(key)}\r\n\r\n"
                ).encode()
            )
            b0, b1 = conn.recv(2)
            seen["mask_bit"] = bool(b1 & 0x80)
            conn.close()

    srv = Probe([])
    try:
        c = WebSocketClient(srv.url)
        c.send_text("hello")
        import time

        time.sleep(0.3)
        assert seen.get("mask_bit") is True
    finally:
        srv.close()


def test_ping_answered_and_payloads_flow():
    srv = _Server(_recs(1, 3), ping_first=True)
    try:
        c = WebSocketClient(srv.url)
        got = [json.loads(c.recv()) for _ in range(3)]  # ping handled inline
        assert [g["id"] for g in got] == [1, 2, 3]
    finally:
        srv.close()


def test_bad_accept_token_rejected():
    class Liar(_Server):
        def _handle(self, conn):
            req = b""
            while b"\r\n\r\n" not in req:
                req += conn.recv(4096)
            conn.sendall(
                b"HTTP/1.1 101 Switching Protocols\r\n"
                b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                b"Sec-WebSocket-Accept: bogus\r\n\r\n"
            )

    srv = Liar([])
    try:
        with pytest.raises(ConnectionError, match="accept token mismatch"):
            WebSocketClient(srv.url)
    finally:
        srv.close()


def test_large_frame_lengths():
    """16-bit extended length path (>=126-byte payload)."""
    big = [{"id": 1, "blob": "x" * 500}]
    srv = _Server(big)
    try:
        c = WebSocketClient(srv.url)
        assert json.loads(c.recv())["blob"] == "x" * 500
    finally:
        srv.close()


def test_fetch_since_cursor_and_subscribe():
    srv = _Server(_recs(1, 10), require_subscribe="SUB feed")
    try:
        fetch = ws_fetch_since(srv.url, subscribe="SUB feed")
        first = fetch(None)
        assert [r["id"] for r in first] == list(range(1, 11))
        assert [r["id"] for r in fetch(7)] == [8, 9, 10]
    finally:
        srv.close()


def test_ws_feed_through_spark_source(spark, tmp_path):
    """End-to-end S10: live WS server → lazily-connecting fetch_since
    cloudpickled into the odin_rest source → Spark streaming query →
    exactly-once rows (snapshot-on-connect replay + cursor filter
    across two AvailableNow runs)."""
    from odin_rs_spark.streaming.datasource import (
        drain_polling_source,
        register_rest_source,
    )

    srv = _Server(_recs(1, 40))
    root = str(tmp_path)
    try:
        token = register_rest_source(spark, fetch_since=ws_fetch_since(srv.url))

        def start_run():
            return (
                spark.readStream.format("odin_rest")
                .schema("id BIGINT, value DOUBLE")
                .option("fetcher", token)
                .option("batch_limit", "25")
                .load()
                .writeStream.format("parquet")
                .option("path", root + "/out")
                .option("checkpointLocation", root + "/ckpt")
                .trigger(availableNow=True)
                .start()
            )

        total = drain_polling_source(start_run)
        assert total == 40
        # "live" records arrive while the query is down
        srv.records.extend(_recs(41, 55))
        total2 = drain_polling_source(start_run)
        assert total2 == 15
        out = spark.read.parquet(root + "/out")
        assert out.count() == 55
        assert out.select("id").distinct().count() == 55
    finally:
        srv.close()


class _ClosingServer(_Server):
    """Handshake, then immediately send a close frame."""

    def _handle(self, conn):
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        key = next(
            ln.split(b":", 1)[1].strip().decode()
            for ln in req.split(b"\r\n")
            if ln.lower().startswith(b"sec-websocket-key")
        )
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept_token(key)}\r\n\r\n"
            ).encode()
        )
        conn.sendall(encode_frame(OP_CLOSE, b"", mask=False))


def test_close_raises_connection_error_subclass():
    """Peer close must surface as a ConnectionError subclass — never
    StopIteration, which PEP 479 turns into RuntimeError inside
    generators (ADVICE r4)."""
    from odin_rs_spark.streaming.websocket import WebSocketClosed

    assert issubclass(WebSocketClosed, ConnectionError)

    srv = _ClosingServer([])
    try:
        c = WebSocketClient(srv.url)
        with pytest.raises(WebSocketClosed):
            c.recv()
        # a generator wrapping recv must NOT die with RuntimeError
        def gen():
            while True:
                try:
                    yield c2.recv()
                except ConnectionError:
                    return

        c2 = WebSocketClient(srv.url)
        assert list(gen()) == []
    finally:
        srv.close()


def test_wss_scheme_accepted_plain_rejected():
    """The wss path exists (TLS wrap); unknown schemes still rejected."""
    with pytest.raises(ValueError, match="unsupported websocket scheme"):
        WebSocketClient("http://localhost:1/")


def test_ws_fetcher_unpickles_without_repo_on_sys_path(tmp_path):
    """Regression (VERDICT r9 #1): a ws_fetch_since fetcher must
    cloudpickle BY VALUE — the Python Data Source source-runner does
    not inherit the driver's sys.path, so a by-reference pickle of the
    websocket module dies with ModuleNotFoundError off-path. Pickle the
    fetcher here, then unpickle it in a subprocess whose sys.path has
    the repo stripped out."""
    import subprocess
    import sys

    from pyspark import cloudpickle

    from odin_rs_spark.streaming.websocket import ws_fetch_since

    fetch = ws_fetch_since("ws://localhost:1/feed", id_field="id")
    blob = tmp_path / "fetcher.pkl"
    blob.write_bytes(cloudpickle.dumps(fetch))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = (
        "import sys, pickle\n"
        f"sys.path = [p for p in sys.path if not p.startswith({repo!r})]\n"
        "sys.modules.pop('odin_rs_spark', None)\n"
        f"f = pickle.loads(open({str(blob)!r}, 'rb').read())\n"
        "assert f(None) == []  # connect refused -> empty poll, not ImportError\n"
        "print('OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
