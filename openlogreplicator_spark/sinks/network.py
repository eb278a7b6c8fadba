"""Network stream writer (W3) — the reference's client-driven TCP protocol.

Reference parity (/root/reference/src/WriterStream.cpp:69-220,
StreamNetwork.cpp:120-170): a client connects and drives the session with
protobuf ``RedoRequest`` messages; the server answers ``RedoResponse``:

    INFO    -> READY (not started) | STARTED + scn (resume point)
    START   -> resolve start position (scn | seq | tms | tm_rel),
               STARTED + scn, or ALREADY_STARTED on a live session,
               INVALID_DATABASE / FAILED_START on errors
    REDO    -> STREAMING, then the server pushes PAYLOAD responses
    CONFIRM -> advance the confirmed-scn watermark; confirmed messages
               leave the in-flight queue (Writer.cpp:76-180 confirm heap)

Framing (StreamNetwork.cpp:120-170): every message is prefixed with a
32-bit little-endian length; lengths >= 0xFFFFFFFF escape to a 64-bit
length (never hit by request traffic).

Exactly-once resume: a reconnecting client sees INFO -> STARTED + the
confirmed scn and, after REDO, receives every UNCONFIRMED message again —
at-least-once delivery with client-side dedup by scn, identical to the
reference's confirm contract.

Scale note: a TCP endpoint is inherently a single-consumer funnel — the
reference is a single process and so is this writer (messages drain
through the driver via ``toLocalIterator``; nothing is collected up
front). The horizontally-scaled paths are the Kafka contract
(sinks/kafka.py) and the file/lake sinks; this module exists for protocol
parity with reference deployments that tail the socket.

Transport descope: the reference also serves this SAME request/response
protocol over a ZeroMQ REP socket (StreamZeroMQ.cpp, selected by the
"type": "zeromq" writer config, OpenLogReplicator.cpp:779-794) — the
message grammar, framing payloads, and confirm semantics are identical;
only the socket layer differs. This sandbox has no pyzmq, so the ZeroMQ
transport is a documented descope: a deployment adds it by driving the
same ``parse_request`` -> ``_session`` dispatch from a ``zmq.REP``
recv/send loop (the length-prefix framing drops away; ZeroMQ frames
messages itself).
"""

from __future__ import annotations

import select
import socket
import struct
import threading

from openlogreplicator_spark.sinks.protobuf_stream import (
    _ld,
    _varint,
    _vint,
)

# enums from OraProtoBuf.proto
REQ_INFO, REQ_START, REQ_REDO, REQ_CONFIRM = 0, 1, 2, 3
(RESP_READY, RESP_FAILED_START, RESP_STARTED, RESP_ALREADY_STARTED,
 RESP_STREAMING, RESP_PAYLOAD, RESP_INVALID_DATABASE,
 RESP_INVALID_COMMAND) = range(8)


# ----------------------------------------------------------------- framing

def send_framed(sock: socket.socket, payload: bytes) -> None:
    """32-bit LE length prefix; 64-bit escape for giant messages
    (StreamNetwork::sendMessage)."""
    n = len(payload)
    if n < 0xFFFFFFFF:
        sock.sendall(struct.pack("<I", n) + payload)
    else:  # pragma: no cover - giant-message escape, protocol parity
        sock.sendall(struct.pack("<I", 0xFFFFFFFF) + struct.pack("<Q", n)
                     + payload)


def recv_framed(sock: socket.socket) -> bytes | None:
    """None on clean EOF; raises socket.timeout when no message arrives."""
    hdr = _recv_exact(sock, 4)
    if hdr is None:
        return None
    n = struct.unpack("<I", hdr)[0]
    if n == 0xFFFFFFFF:  # pragma: no cover - 64-bit escape
        ext = _recv_exact(sock, 8)
        if ext is None:
            return None
        n = struct.unpack("<Q", ext)[0]
    body = _recv_exact(sock, n)
    return body


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


# ----------------------------------------------- request decode (proto3)

def _rd_varint(b: bytes, i: int):
    n, shift = 0, 0
    while True:
        x = b[i]
        i += 1
        n |= (x & 0x7F) << shift
        if not x & 0x80:
            return n, i
        shift += 7


def parse_request(b: bytes) -> dict:
    """Decode a RedoRequest (code=1, database_name=2, scn=3, seq=4, tms=5,
    tm_rel=6). Unknown fields are skipped (proto3 contract)."""
    i, out = 0, {"code": REQ_INFO}
    names = {1: "code", 2: "database_name", 3: "scn", 4: "seq", 5: "tms",
             6: "tm_rel"}
    while i < len(b):
        key, i = _rd_varint(b, i)
        f, w = key >> 3, key & 7
        if w == 0:
            v, i = _rd_varint(b, i)
        elif w == 2:
            ln, i = _rd_varint(b, i)
            v = b[i:i + ln]
            i += ln
        elif w == 1:
            v, i = b[i:i + 8], i + 8
        elif w == 5:
            v, i = b[i:i + 4], i + 4
        else:
            raise ValueError(f"bad wire type {w}")
        if f in names:
            out[names[f]] = v.decode() if f in (2, 5) else v
    return out


def encode_request(code: int, database_name: str, scn: int | None = None,
                   seq: int | None = None, tms: str | None = None,
                   tm_rel: int | None = None) -> bytes:
    """Client-side RedoRequest encoder (for tests and python consumers)."""
    out = b"" if code == 0 else _vint(1, code)
    out += _ld(2, database_name.encode())
    if scn is not None:
        out += _vint(3, scn)
    if seq is not None:
        out += _vint(4, seq)
    if tms is not None:
        out += _ld(5, tms.encode())
    if tm_rel is not None:
        out += _vint(6, tm_rel)
    return out


def _status_response(code: int, scn: int | None = None) -> bytes:
    # RedoResponse.scn sits inside oneof scn_val (OraProtoBuf.proto:139):
    # explicit presence — scn 0 is a legitimate resume point and must be
    # distinguishable from "no scn", so only None is suppressed. Negative
    # sentinel values (-1 = nothing confirmed yet) stay unset.
    out = b"" if code == 0 else _vint(1, code)
    if scn is not None and scn >= 0:
        out += _vint(2, scn)
    return out


# ------------------------------------------------------------------ server

class NetworkWriter:
    """Single-client change-stream server over a message source.

    ``messages``: iterable of (scn, payload_bytes) in ascending scn order —
    typically ``protobuf_stream_messages(...).orderBy("commit_scn")`` via
    ``rows_from_dataframe``. The writer holds only UNCONFIRMED messages in
    memory (queue-size analog of the reference's confirm heap).
    """

    def __init__(self, messages, database: str = "OLR",
                 start_scn: int = -1, position_resolver=None):
        self._source = iter(messages)
        self.database = database
        self.started_scn: int | None = (None if start_scn < 0
                                        else int(start_scn))
        self.confirmed_scn = -1
        self._queue: list[tuple[int, bytes]] = []  # unconfirmed, scn asc
        # START with seq/tms/tm_rel needs an engine-side mapping onto an
        # scn (the reference resolves via OracleAnalyzerOnline): callers
        # pass ``position_resolver(request_dict) -> scn | None``; without
        # one, non-scn starts answer FAILED_START instead of silently
        # replaying from scn 0
        self._position_resolver = position_resolver
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self.port: int | None = None
        self._stop = threading.Event()

    # -- lifecycle

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(1)
        self._sock.settimeout(0.2)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._sock is not None:
            self._sock.close()

    # -- internals

    def _resolve_start(self, req: dict):
        """scn requests resolve directly; seq/tms/tm_rel need the caller's
        ``position_resolver`` (WriterStream::processStart -> startReader
        resolution). None = cannot resolve -> FAILED_START."""
        if "scn" in req:
            return int(req["scn"])
        if self._position_resolver is not None:
            return self._position_resolver(req)
        return None

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                self._session(conn)
            except (ConnectionError, socket.timeout, OSError):
                pass  # client vanished -> wait for reconnect (reference
                # WriterStream::readCheckpoint loop)
            finally:
                conn.close()

    def _session(self, conn: socket.socket) -> None:
        conn.settimeout(0.2)
        streaming = False
        while not self._stop.is_set():
            try:
                raw = recv_framed(conn)
            except socket.timeout:
                continue
            if raw is None:
                return  # clean disconnect
            req = parse_request(raw)
            code = req.get("code", REQ_INFO)
            if req.get("database_name") != self.database:
                send_framed(conn, _status_response(RESP_INVALID_DATABASE))
                continue
            if code == REQ_INFO:
                if self.started_scn is not None:
                    send_framed(conn, _status_response(
                        RESP_STARTED, max(self.confirmed_scn,
                                          self.started_scn)))
                else:
                    send_framed(conn, _status_response(RESP_READY))
                streaming = False
            elif code == REQ_START:
                if self.started_scn is not None:
                    send_framed(conn, _status_response(
                        RESP_ALREADY_STARTED, self.started_scn))
                elif not any(k in req for k in ("scn", "seq", "tms",
                                                "tm_rel")):
                    send_framed(conn, _status_response(RESP_INVALID_COMMAND))
                else:
                    scn = self._resolve_start(req)
                    if scn is None:
                        # seq/tms/tm_rel with no resolver: refuse rather
                        # than silently replaying from the beginning
                        send_framed(conn,
                                    _status_response(RESP_FAILED_START))
                    else:
                        self.started_scn = int(scn)
                        send_framed(conn, _status_response(
                            RESP_STARTED, self.started_scn))
            elif code == REQ_REDO:
                send_framed(conn, _status_response(RESP_STREAMING))
                streaming = True
                self._stream(conn)
                streaming = False  # client broke the stream with INFO
            elif code == REQ_CONFIRM:
                self._confirm(int(req.get("scn", -1)))
            else:
                send_framed(conn, _status_response(RESP_INVALID_COMMAND))
        del streaming

    def _confirm(self, scn: int) -> None:
        """Drop every queued message at or below the confirmed scn
        (WriterStream::processConfirm)."""
        if scn > self.confirmed_scn:
            self.confirmed_scn = scn
        while self._queue and self._queue[0][0] <= self.confirmed_scn:
            self._queue.pop(0)

    def _stream(self, conn: socket.socket) -> None:
        """Push unconfirmed payloads, polling for CONFIRM between sends
        (the reference interleaves pollQueue with the send loop).

        Source draining is LAZY: queued-but-unconfirmed messages from a
        previous session are re-delivered first, then new messages are
        pulled from the source one at a time — sent immediately and held
        in the queue only until confirmed. Nothing is materialized up
        front, so time-to-first-byte and driver memory are O(unconfirmed),
        not O(stream)."""
        start = self.started_scn or 0
        sent_idx = 0
        while not self._stop.is_set():
            if sent_idx < len(self._queue):
                scn, payload = self._queue[sent_idx]
                sent_idx += 1
                if scn < start or scn <= self.confirmed_scn:
                    continue
            else:
                nxt = next(self._source, None)
                if nxt is None:
                    return  # source drained; session loop keeps polling
                scn, payload = int(nxt[0]), bytes(nxt[1])
                if scn <= self.confirmed_scn or scn < start:
                    continue  # pre-start / already-confirmed: never queued
                self._queue.append((scn, payload))
                sent_idx = len(self._queue)
            send_framed(conn, payload)
            # zero-wait confirm poll (select, not a blocking recv — a
            # quiet client must not throttle the send loop); a CONFIRM
            # may shrink the queue under us, so re-anchor the cursor by
            # scn afterwards
            readable, _, _ = select.select([conn], [], [], 0)
            if not readable:
                continue
            raw = recv_framed(conn)
            if raw is None:
                raise ConnectionError("client disconnected mid-stream")
            req = parse_request(raw)
            if req.get("code") == REQ_CONFIRM and \
                    req.get("database_name") == self.database:
                self._confirm(int(req.get("scn", -1)))
                sent_idx = self._next_idx_after(scn)
            elif req.get("code") == REQ_INFO:
                # INFO during streaming ends the redo stream
                # (WriterStream.cpp:160-165)
                if self.started_scn is not None:
                    send_framed(conn, _status_response(
                        RESP_STARTED, max(self.confirmed_scn,
                                          self.started_scn)))
                else:
                    send_framed(conn, _status_response(RESP_READY))
                return

    def _next_idx_after(self, scn: int) -> int:
        for i, (s, _) in enumerate(self._queue):
            if s > scn:
                return i
        return len(self._queue)


def rows_from_dataframe(messages_df):
    """(scn, payload) iterator off a protobuf message DataFrame — drains
    through the driver incrementally (toLocalIterator), never collected."""
    it = (messages_df.orderBy("commit_scn")
          .select("commit_scn", "value").toLocalIterator())
    for r in it:
        yield int(r["commit_scn"]), bytes(r["value"])


def serve_change_stream(messages_df, database: str = "OLR",
                        port: int = 0,
                        position_resolver=None) -> NetworkWriter:
    """Convenience: start a NetworkWriter over a protobuf message
    DataFrame (see sinks/protobuf_stream.py). Pass ``position_resolver``
    to honor START-by-seq/tms/tm_rel (e.g. wrap
    openlogreplicator_spark.operators.decode.resolve_start_position over
    the feed)."""
    w = NetworkWriter(rows_from_dataframe(messages_df), database=database,
                      position_resolver=position_resolver)
    w.start(port=port)
    return w
