"""Minimal RFC 6455 WebSocket client on the stdlib socket module
(SURVEY §2.1 S10; parity: the reference's sentinel websocket importer,
odin_sentinel/src/ws.rs:1-170 — connect, subscribe, drain record
frames into the update loop).

No websocket library ships in this container, but the protocol itself
is public and small: an HTTP/1.1 Upgrade handshake (Sec-WebSocket-Key →
SHA-1/base64 accept token) followed by length-prefixed frames with
client-side masking. ~120 lines of stdlib turn S10 from "bridge pattern
only" into a real wire client, tested against an in-process server over
loopback (tests/test_websocket.py).

Engine integration is the S9 seam: `ws_fetch_since(url)` returns a
`fetch_since(last_id)` callable that drains currently-buffered frames —
plug it into `streaming.datasource.register_rest_source` (in-engine
offsets) or `streaming.poller.RestPoller` (bronze-file bridge). TLS
(wss://) wraps the socket with stdlib `ssl` at deployment; frames
larger than 2^63 and continuation fragmentation are out of scope.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
from urllib.parse import urlparse

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10


def accept_token(key: str) -> str:
    """Server-side Sec-WebSocket-Accept for a client key (shared by the
    test server; spec §4.2.2)."""
    return base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()
    ).decode()


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


def encode_frame(opcode: int, payload: bytes, mask: bool) -> bytes:
    """One unfragmented frame (FIN=1). Clients MUST mask (spec §5.3)."""
    head = bytes([0x80 | opcode])
    ln = len(payload)
    mbit = 0x80 if mask else 0
    if ln < 126:
        head += bytes([mbit | ln])
    elif ln < (1 << 16):
        head += bytes([mbit | 126]) + struct.pack(">H", ln)
    else:
        head += bytes([mbit | 127]) + struct.pack(">Q", ln)
    if mask:
        mk = os.urandom(4)
        masked = bytes(b ^ mk[i % 4] for i, b in enumerate(payload))
        return head + mk + masked
    return head + payload


def decode_frame(sock: socket.socket) -> tuple[int, bytes]:
    """Read one frame → (opcode, payload); unmasks if masked."""
    b0, b1 = _recv_exact(sock, 2)
    opcode = b0 & 0x0F
    if not b0 & 0x80:
        raise ValueError("fragmented websocket frames unsupported")
    masked = bool(b1 & 0x80)
    ln = b1 & 0x7F
    if ln == 126:
        (ln,) = struct.unpack(">H", _recv_exact(sock, 2))
    elif ln == 127:
        (ln,) = struct.unpack(">Q", _recv_exact(sock, 8))
    mk = _recv_exact(sock, 4) if masked else b""
    payload = _recv_exact(sock, ln)
    if masked:
        payload = bytes(b ^ mk[i % 4] for i, b in enumerate(payload))
    return opcode, payload


class WebSocketClosed(ConnectionError):
    """Peer sent a close frame. A ConnectionError subclass — NOT
    StopIteration, which PEP 479 would convert to RuntimeError if
    recv() were ever called from inside a generator, silently breaking
    the caller's handling — so every existing ConnectionError retry
    path (ws_fetch_since) catches it unchanged."""


class WebSocketClient:
    """Blocking client: connect → handshake → recv()/send_text().
    Control frames are handled inline (ping → pong, close → raises
    WebSocketClosed to end the drain loop). wss:// wraps the socket in
    a default-verifying TLS context (stdlib ssl) — live endpoints need
    a reachable network, so the wss path is covered by an opt-in test
    (`ODIN_WSS_URL`) rather than the in-process loopback server."""

    def __init__(self, url: str, timeout_sec: float = 10.0):
        u = urlparse(url)
        if u.scheme not in ("ws", "wss"):
            raise ValueError(f"unsupported websocket scheme {u.scheme!r}")
        default_port = 443 if u.scheme == "wss" else 80
        self.sock = socket.create_connection(
            (u.hostname, u.port or default_port), timeout=timeout_sec
        )
        if u.scheme == "wss":
            import ssl

            ctx = ssl.create_default_context()
            self.sock = ctx.wrap_socket(self.sock, server_hostname=u.hostname)
        key = base64.b64encode(os.urandom(16)).decode()
        path = u.path or "/"
        if u.query:
            path += "?" + u.query
        req = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {u.hostname}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("websocket handshake refused")
            resp += chunk
        head_b, rest = resp.split(b"\r\n\r\n", 1)
        # bytes already read past the handshake are the first frames —
        # they MUST be buffered, not discarded (a fast server pushes
        # its snapshot immediately behind the 101)
        self._buf = rest
        head = head_b.decode("latin-1")
        if "101" not in head.split("\r\n")[0]:
            raise ConnectionError(f"websocket upgrade failed: {head.splitlines()[0]}")
        want = accept_token(key)
        got = [
            ln.split(":", 1)[1].strip()
            for ln in head.split("\r\n")
            if ln.lower().startswith("sec-websocket-accept")
        ]
        if not got or got[0] != want:
            raise ConnectionError("websocket accept token mismatch")

    def _read_exact(self, n: int) -> bytes:
        """Like _recv_exact but consumes the handshake spill-over first;
        on timeout, everything read so far goes BACK into the buffer so
        the stream never desyncs."""
        take = min(n, len(self._buf))
        buf, self._buf = bytearray(self._buf[:take]), self._buf[take:]
        while len(buf) < n:
            try:
                chunk = self.sock.recv(n - len(buf))
            except (TimeoutError, socket.timeout):
                self._buf = bytes(buf) + self._buf
                raise
            if not chunk:
                raise ConnectionError("websocket peer closed mid-frame")
            buf += chunk
        return bytes(buf)

    def _decode_frame(self) -> tuple[int, bytes]:
        """One frame, ATOMIC under the drain timeout: a timeout anywhere
        mid-frame pushes every consumed byte back so the next call
        re-reads from the frame boundary."""
        consumed = bytearray()

        def rd(n: int) -> bytes:
            b = self._read_exact(n)
            consumed.extend(b)
            return b

        try:
            b0, b1 = rd(2)
            opcode = b0 & 0x0F
            if not b0 & 0x80:
                raise ValueError("fragmented websocket frames unsupported")
            masked = bool(b1 & 0x80)
            ln = b1 & 0x7F
            if ln == 126:
                (ln,) = struct.unpack(">H", rd(2))
            elif ln == 127:
                (ln,) = struct.unpack(">Q", rd(8))
            mk = rd(4) if masked else b""
            payload = rd(ln)
        except (TimeoutError, socket.timeout):
            self._buf = bytes(consumed) + self._buf
            raise
        if masked:
            payload = bytes(b ^ mk[i % 4] for i, b in enumerate(payload))
        return opcode, payload

    def send_text(self, text: str) -> None:
        self.sock.sendall(encode_frame(OP_TEXT, text.encode(), mask=True))

    def recv(self) -> str:
        """Next text/binary payload as str; answers pings transparently."""
        while True:
            opcode, payload = self._decode_frame()
            if opcode == OP_PING:
                self.sock.sendall(encode_frame(OP_PONG, payload, mask=True))
            elif opcode == OP_CLOSE:
                self.sock.sendall(encode_frame(OP_CLOSE, b"", mask=True))
                raise WebSocketClosed("websocket closed by peer")
            elif opcode in (OP_TEXT, OP_BINARY):
                return payload.decode("utf-8")

    def close(self) -> None:
        try:
            self.sock.sendall(encode_frame(OP_CLOSE, b"", mask=True))
        except OSError:
            pass
        self.sock.close()


def ws_fetch_since(
    url: str,
    id_field: str = "id",
    subscribe: str | None = None,
    drain_timeout: float = 0.2,
):
    """S10 → S9 adapter: drain every currently-available JSON record
    frame per poll, filter by the records-since-id cursor. The returned
    callable is exactly the `fetch_since` contract of
    `register_rest_source` / `RestPoller`, so a push feed enters the
    engine through the same checkpointed offset path as a poll feed
    (the reference runs its sentinel WS importer through the same
    update loop as the HTTP pollers, odin_sentinel/src/lib.rs).

    The connection is LAZY — the closure captures only strings until
    the first call — so the callable cloudpickles into Spark's Python
    source-runner process (the `register_rest_source(fetch_since=...)`
    path); the socket then lives where the polls run. A dropped
    connection reconnects on the next poll (T8), relying on the
    server's snapshot-on-connect replay + the cursor filter for
    exactly-once — the same recovery contract as the HTTP fetcher.

    Buffer hygiene: records at-or-below the caller's cursor are PRUNED
    each poll (the cursor is Spark's committed offset, so nothing below
    it is ever re-asked), and the retained window dedupes by id — a
    reconnect's snapshot replay therefore cannot double-deliver into
    one batch, and memory is O(records past the committed offset), not
    O(feed history). Cross-type ids order via the same tagged key as
    the source (`datasource._order_key`). A malformed (non-UTF-8 /
    non-JSON) frame is treated as a protocol error: drop the
    connection and rely on the reconnect replay.
    """
    import sys

    from pyspark import cloudpickle

    from odin_rs_spark.streaming import datasource as _ds
    from odin_rs_spark.streaming.datasource import _order_key

    # The returned closure references THIS module's globals
    # (WebSocketClient, encode_frame, …) and datasource._order_key.
    # cloudpickle serializes the nested function by value, but its
    # referenced module-level names by REFERENCE unless their modules
    # are registered — and Spark's Python Data Source source-runner
    # process does not inherit the driver's sys.path, so a by-reference
    # pickle dies with ModuleNotFoundError off-path. Register both
    # modules by value here so the fetcher is self-contained no matter
    # which cwd the driver runs from (same discipline as
    # register_rest_source, datasource.py).
    for _mod in (sys.modules[ws_fetch_since.__module__], _ds):
        try:
            cloudpickle.register_pickle_by_value(_mod)
        except Exception:
            pass  # older cloudpickle: by-reference (same-path runners)

    state: dict = {"client": None, "buffered": []}

    def _drop_client() -> None:
        c = state["client"]
        state["client"] = None
        if c is not None:
            try:
                c.close()
            except OSError:
                pass

    def fetch(last_id):
        if state["client"] is None:
            try:
                c = WebSocketClient(url)
                if subscribe is not None:
                    c.send_text(subscribe)
                state["client"] = c
            except OSError:
                return []  # connect failure → empty poll, retry (T8)
        c = state["client"]
        c.sock.settimeout(drain_timeout)
        try:
            while True:
                state["buffered"].append(json.loads(c.recv()))
        except (TimeoutError, socket.timeout):
            pass  # drained everything currently available
        except (ConnectionError, OSError):  # incl. WebSocketClosed
            _drop_client()  # reconnect on next poll
        except ValueError:  # UnicodeDecodeError / JSONDecodeError
            _drop_client()  # protocol error → resync via snapshot replay
        # prune + dedupe the retained window (see docstring)
        seen: set = set()
        kept = []
        skey = None if last_id is None else _order_key(last_id)
        for r in state["buffered"]:
            k = _order_key(r[id_field])
            if skey is not None and not (k > skey):
                continue
            if k in seen:
                continue
            seen.add(k)
            kept.append(r)
        state["buffered"] = kept
        return list(kept)

    return fetch
