"""Network stream writer (W3): client-driven protocol + confirm resume.

Mirrors the reference session flow (WriterStream.cpp:69-220): INFO/START/
REDO handshake, PAYLOAD streaming, CONFIRM watermark, and the reconnect
contract — every unconfirmed message is re-delivered, nothing confirmed
ever is.
"""

import socket
import time

import pytest

from openlogreplicator_spark.sinks.network import (
    NetworkWriter,
    REQ_CONFIRM,
    REQ_INFO,
    REQ_REDO,
    REQ_START,
    RESP_ALREADY_STARTED,
    RESP_INVALID_COMMAND,
    RESP_INVALID_DATABASE,
    RESP_READY,
    RESP_STARTED,
    RESP_STREAMING,
    encode_request,
    recv_framed,
    send_framed,
    serve_change_stream,
)


def _rd_varint(b, i):
    n, shift = 0, 0
    while True:
        x = b[i]
        i += 1
        n |= (x & 0x7F) << shift
        if not x & 0x80:
            return n, i
        shift += 7


def _parse_response(b):
    """RedoResponse status fields: code=1, scn=2 (varints)."""
    i, out = 0, {"code": 0}
    while i < len(b):
        key, i = _rd_varint(b, i)
        f, w = key >> 3, key & 7
        if w == 0:
            v, i = _rd_varint(b, i)
        elif w == 2:
            ln, i = _rd_varint(b, i)
            v = b[i:i + ln]
            i += ln
        else:
            raise AssertionError(f"wire {w}")
        if f == 1:
            out["code"] = v
        elif f == 2:
            out["scn"] = v
        elif f == 8:
            out.setdefault("payload", []).append(v)
    return out


class _Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=5)

    def ask(self, code, db="OLR", **kw):
        send_framed(self.sock, encode_request(code, db, **kw))
        return _parse_response(recv_framed(self.sock))

    def confirm(self, scn, db="OLR"):
        send_framed(self.sock, encode_request(REQ_CONFIRM, db, scn=scn))

    def recv(self):
        return recv_framed(self.sock)

    def close(self):
        self.sock.close()


MSGS = [(10, b"m-ten"), (20, b"m-twenty"), (30, b"m-thirty"),
        (40, b"m-forty"), (50, b"m-fifty")]


def _drain(client, n):
    out = []
    for _ in range(n):
        out.append(client.recv())
    return out


def test_protocol_handshake_stream_confirm_resume():
    w = NetworkWriter(list(MSGS))
    port = w.start()
    try:
        c = _Client(port)
        # INFO before start -> READY, no scn
        r = c.ask(REQ_INFO)
        assert r["code"] == RESP_READY and "scn" not in r
        # wrong database -> INVALID_DATABASE
        assert c.ask(REQ_INFO, db="OTHER")["code"] == RESP_INVALID_DATABASE
        # START without any position -> INVALID_COMMAND
        assert c.ask(REQ_START)["code"] == RESP_INVALID_COMMAND
        # START at scn -> STARTED
        r = c.ask(REQ_START, scn=10)
        assert r["code"] == RESP_STARTED and r["scn"] == 10
        # second START -> ALREADY_STARTED
        assert c.ask(REQ_START, scn=10)["code"] == RESP_ALREADY_STARTED
        # REDO -> STREAMING then payloads flow
        assert c.ask(REQ_REDO)["code"] == RESP_STREAMING
        got = _drain(c, 3)
        assert got == [b"m-ten", b"m-twenty", b"m-thirty"]
        # confirm through scn 20, then drop the connection mid-stream
        c.confirm(20)
        time.sleep(0.3)  # let the confirm poll land before the disconnect
        c.close()

        # reconnect: INFO reports STARTED at the confirmed watermark;
        # REDO re-delivers every unconfirmed message (30 again, 40, 50)
        c2 = _Client(port)
        r = c2.ask(REQ_INFO)
        assert r["code"] == RESP_STARTED and r["scn"] == 20
        assert c2.ask(REQ_REDO)["code"] == RESP_STREAMING
        got = _drain(c2, 3)
        assert got == [b"m-thirty", b"m-forty", b"m-fifty"]
        c2.confirm(50)
        time.sleep(0.3)
        assert w.confirmed_scn == 50
        assert w._queue == []  # confirm heap fully drained
        c2.close()
    finally:
        w.stop()


def test_start_scn_skips_older_messages():
    w = NetworkWriter(list(MSGS))
    port = w.start()
    try:
        c = _Client(port)
        assert c.ask(REQ_START, scn=30)["code"] == RESP_STARTED
        assert c.ask(REQ_REDO)["code"] == RESP_STREAMING
        assert _drain(c, 3) == [b"m-thirty", b"m-forty", b"m-fifty"]
        c.close()
    finally:
        w.stop()


def test_info_during_streaming_breaks_stream():
    """INFO mid-stream ends REDO mode (WriterStream.cpp:160-165) and
    answers with the session status."""
    w = NetworkWriter(list(MSGS))
    port = w.start()
    try:
        c = _Client(port)
        c.ask(REQ_START, scn=0)
        c.ask(REQ_REDO)
        first = c.recv()
        assert first == b"m-ten"
        # interleave an INFO: the stream stops, the INFO answer arrives
        # (possibly after in-flight payloads)
        send_framed(c.sock, encode_request(REQ_INFO, "OLR"))
        seen = []
        while True:
            m = c.recv()
            try:
                p = _parse_response(m)
            except Exception:
                p = {}  # an opaque payload frame, not a status response
            if p.get("code") == RESP_STARTED and "payload" not in p:
                break
            seen.append(m)
        assert len(seen) <= len(MSGS) - 1
        c.close()
    finally:
        w.stop()


def test_serve_spark_protobuf_stream(spark):
    """End-to-end: assembled transactions -> protobuf messages -> TCP
    server -> client receives byte-identical messages in commit order."""
    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.feed import generate_change_events
    from openlogreplicator_spark.operators.assembly import (
        assemble_transactions_sql,
    )
    from openlogreplicator_spark.operators.decode import decode_events
    from openlogreplicator_spark.sinks.protobuf_stream import (
        protobuf_stream_messages,
    )

    cfg = EngineConfig()
    events = decode_events(
        generate_change_events(spark, n_txs=5, n_convs=3, seed=53), cfg)
    msgs = protobuf_stream_messages(assemble_transactions_sql(events, cfg),
                                    cfg)
    want = [(r["commit_scn"], bytes(r["value"]))
            for r in msgs.orderBy("commit_scn").collect()]

    w = serve_change_stream(msgs)
    try:
        c = _Client(w.port)
        assert c.ask(REQ_START, scn=0)["code"] == RESP_STARTED
        assert c.ask(REQ_REDO)["code"] == RESP_STREAMING
        got = _drain(c, len(want))
        assert got == [v for _, v in want]
        c.confirm(want[-1][0])
        c.close()
    finally:
        w.stop()


def test_start_non_scn_without_resolver_fails_honestly():
    """START by tms/seq/tm_rel with no position resolver answers
    FAILED_START — never a silent replay from scn 0."""
    from openlogreplicator_spark.sinks.network import RESP_FAILED_START

    w = NetworkWriter(list(MSGS))
    port = w.start()
    try:
        c = _Client(port)
        r = c.ask(REQ_START, tms="2026-08-17 10:00:00")
        assert r["code"] == RESP_FAILED_START
        assert w.started_scn is None  # session NOT started

        # with a resolver, the same request resolves and starts
        w._position_resolver = lambda req: 30
        r = c.ask(REQ_START, tms="2026-08-17 10:00:00")
        assert r["code"] == RESP_STARTED and r["scn"] == 30
        assert c.ask(REQ_REDO)["code"] == RESP_STREAMING
        assert _drain(c, 3) == [b"m-thirty", b"m-forty", b"m-fifty"]
        c.close()
    finally:
        w.stop()
