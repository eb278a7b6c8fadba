"""Protobuf change-stream sink (O2): wire-format correctness.

The test ships its own minimal proto3 decoder (varint + length-delimited)
so the encoder is verified against the FORMAT, not against itself; a
pinned golden digest guards byte-stability. Field numbers under test are
the reference's OraProtoBuf.proto (RedoResponse/Payload/Schema/Value).
"""

import hashlib
import os
import struct

import pytest

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.operators.assembly import assemble_transactions_sql
from openlogreplicator_spark.operators.decode import decode_events
from openlogreplicator_spark.sinks.protobuf_stream import (
    protobuf_stream_messages,
    protobuf_stream_ops,
    write_protobuf_stream,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


# --------------------------------------------------- minimal proto3 decoder

def _rd_varint(b: bytes, i: int):
    n, shift = 0, 0
    while True:
        x = b[i]
        i += 1
        n |= (x & 0x7F) << shift
        if not x & 0x80:
            return n, i
        shift += 7


def _parse(b: bytes) -> dict:
    """field number -> list of raw values (int for varint, bytes for
    length-delimited / fixed)."""
    i, out = 0, {}
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
            v = b[i:i + 8]
            i += 8
        elif w == 5:
            v = b[i:i + 4]
            i += 4
        else:  # pragma: no cover
            raise AssertionError(f"bad wire type {w}")
        out.setdefault(f, []).append(v)
    return out


def _values(raw_list):
    """Decode repeated Value messages -> {name: (kind, value)}."""
    out = {}
    for raw in raw_list:
        m = _parse(raw)
        name = m[1][0].decode()
        if 2 in m:
            out[name] = ("int", m[2][0])
        elif 4 in m:
            out[name] = ("double", struct.unpack("<d", m[4][0])[0])
        elif 5 in m:
            out[name] = ("string", m[5][0].decode())
        elif 6 in m:
            out[name] = ("bytes", m[6][0])
        else:
            out[name] = ("null", None)
    return out


def _assembled(spark, n_txs=5):
    cfg = EngineConfig()
    events = decode_events(
        generate_change_events(spark, n_txs=n_txs, n_convs=3, seed=53), cfg
    )
    return assemble_transactions_sql(events, cfg), cfg


def test_per_op_wire_format(spark):
    assembled, cfg = _assembled(spark)
    rows = (protobuf_stream_ops(assembled, cfg)
            .orderBy("commit_scn", "scn").collect())
    assert rows
    src = {(r["commit_scn"], r["scn"]): r for r in
           assembled.orderBy("commit_scn", "scn").collect()}
    for r in rows:
        m = _parse(bytes(r["value"]))
        assert m[1] == [5]                              # code=PAYLOAD
        assert m[2] == [r["commit_scn"]]                # scn
        assert m[6][0].decode() == r["xid"]             # xid
        assert len(m[8]) == 1                           # one payload per op
        p = _parse(m[8][0])
        want = src[(r["commit_scn"], r["scn"])]
        op_enum = {"I": 2, "U": 3, "D": 4}[want["op"]]
        assert p.get(1, [0])[0] == op_enum
        sch = _parse(p[2][0])
        assert sch[1][0].decode() == "OLR"
        assert sch[2][0].decode() == "transcripts"
        if want["op"] == "D":
            # delete: key rides as before-image, no after values
            vals = _values(p[4])
            assert 5 not in p
        else:
            vals = _values(p[5])
            assert 4 not in p
            # every column named in cols_set is present
            for c in want["cols_set"] or []:
                assert c in vals
        assert vals["conv_id"] == ("string", want["conv_id"])
        # int64 turn_idx rides value_int — oneof member, so 0 is EMITTED
        # (explicit presence; round-4 fix of the wrong zero suppression)
        assert vals["turn_idx"] == ("int", want["turn_idx"])


def test_per_tx_begin_commit_bracketing(spark):
    assembled, cfg = _assembled(spark)
    rows = protobuf_stream_messages(assembled, cfg).collect()
    n_ops_total = assembled.count()
    got_ops = 0
    for r in rows:
        m = _parse(bytes(r["value"]))
        payloads = [_parse(p) for p in m[8]]
        # first payload BEGIN (op field absent = enum 0), last COMMIT (1)
        assert 1 not in payloads[0] and 2 not in payloads[0]
        assert payloads[-1].get(1) == [1] and 2 not in payloads[-1]
        dml = payloads[1:-1]
        assert len(dml) == r["n_ops"]
        got_ops += len(dml)
        # ops are scn-ordered within the message
        scns = []
        for p in dml:
            assert p.get(1, [0])[0] in (2, 3, 4)
            assert 2 in p  # schema present on DML payloads
        assert r["msg_seq"] == 0 and r["n_msgs"] == 1
    assert got_ops == n_ops_total


def test_per_tx_split_continuations(spark):
    """M1 force-split: BEGIN rides the first chunk, COMMIT the last."""
    assembled, cfg = _assembled(spark, n_txs=8)
    cap = 3
    rows = (protobuf_stream_messages(assembled, cfg, max_ops_per_message=cap)
            .orderBy("commit_scn", "xid", "msg_seq").collect())
    by_tx = {}
    for r in rows:
        by_tx.setdefault((r["commit_scn"], r["xid"]), []).append(r)
    assert any(len(v) > 1 for v in by_tx.values()), "need a split tx"
    for (cs, xid), msgs in by_tx.items():
        assert [m["msg_seq"] for m in msgs] == list(range(len(msgs)))
        assert all(m["n_msgs"] == len(msgs) for m in msgs)
        for i, r in enumerate(msgs):
            m = _parse(bytes(r["value"]))
            payloads = [_parse(p) for p in m[8]]
            has_begin = 1 not in payloads[0] and 2 not in payloads[0]
            has_commit = payloads[-1].get(1) == [1] and 2 not in payloads[-1]
            assert has_begin == (i == 0)
            assert has_commit == (i == len(msgs) - 1)
            n_dml = len(payloads) - int(has_begin) - int(has_commit)
            assert n_dml == r["n_ops"] <= cap


def test_golden_digest_and_file_sink(spark, tmp_path):
    """Byte-stability: md5 over the scn-ordered message stream is pinned;
    the parquet file sink round-trips the binary values exactly."""
    assembled, cfg = _assembled(spark)
    msgs = protobuf_stream_messages(assembled, cfg)
    vals = [bytes(r["value"]) for r in
            msgs.orderBy("commit_scn", "xid").select("value").collect()]
    digest = hashlib.md5(b"\x00".join(vals)).hexdigest()
    golden_path = os.path.join(GOLDEN, "protobuf_stream.md5")
    if not os.path.exists(golden_path):  # pragma: no cover - first generation
        os.makedirs(GOLDEN, exist_ok=True)
        with open(golden_path, "w") as f:
            f.write(digest + "\n")
        pytest.skip("golden digest generated; re-run to compare")
    assert digest == open(golden_path).read().strip()

    out = str(tmp_path / "pb")
    write_protobuf_stream(msgs, out)
    back = [bytes(r["value"]) for r in
            spark.read.parquet(out).orderBy("commit_scn", "xid").collect()]
    assert back == vals


def test_decoded_ops_roundtrip_across_splits(spark):
    """The consumer-side reference decoder (decoded_ops) recovers every DML
    op — including across M1 split continuations — with key/text/op intact
    and bracket verification enforced."""
    from openlogreplicator_spark.sinks.protobuf_stream import decoded_ops

    assembled, cfg = _assembled(spark, n_txs=8)
    msgs = protobuf_stream_messages(assembled, cfg, max_ops_per_message=3)
    got = decoded_ops(msgs)
    want = assembled.orderBy("commit_scn", "xid", "scn", "seq").collect()
    rows = got.orderBy("commit_scn", "xid", "pos").collect()
    assert len(rows) == len(want)
    for g, w in zip(rows, want):
        assert (g["commit_scn"], g["xid"], g["op"]) == \
            (w["commit_scn"], w["xid"], w["op"])
        assert (g["conv_id"], g["turn_idx"]) == \
            (w["conv_id"], w["turn_idx"])
        if w["op"] != "D" and "text" in (w["cols_set"] or []):
            assert g["text"] == w["after"]["text"]


def test_oneof_explicit_presence_zero_vs_null():
    """oneof members keep explicit presence: a set 0 / "" / b"" is on the
    wire and distinguishable from an unset datum (NULL column); scn=0 is a
    legitimate resume point in RedoResponse.scn_val (ADVICE round-3)."""
    from openlogreplicator_spark.sinks.protobuf_stream import _response, _value

    m = _parse(_response(0, "x", []))
    assert m[2] == [0]  # scn=0 emitted, not collapsed to "no scn"
    vals = _values([_value("a", 0), _value("b", None),
                    _value("c", ""), _value("d", b"")])
    assert vals["a"] == ("int", 0)
    assert vals["b"] == ("null", None)
    assert vals["c"] == ("string", "")
    assert vals["d"] == ("bytes", b"")


def test_varint_edge_values():
    """Encoder unit edges: 0, 127/128 boundary, int64 max, negative int64
    (two's-complement 10-byte form — protobuf WriteVarint64 parity)."""
    from openlogreplicator_spark.sinks.protobuf_stream import _varint

    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(127) == b"\x7f"
    assert _varint(128) == b"\x80\x01"
    assert _varint(300) == b"\xac\x02"
    assert _rd_varint(_varint(2 ** 63 - 1), 0)[0] == 2 ** 63 - 1
    n, _ = _rd_varint(_varint(-1), 0)
    assert n == (1 << 64) - 1  # -1 as uint64, 10 bytes on the wire
    assert len(_varint(-1)) == 10


def test_varint_roundtrip_property():
    """Any int64 round-trips through the hand-rolled varint (negatives in
    the two's-complement 10-byte form protobuf uses)."""
    from hypothesis import given, settings, strategies as st

    from openlogreplicator_spark.sinks.protobuf_stream import _varint

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-2 ** 63, max_value=2 ** 63 - 1))
    def check(n):
        raw = _varint(n)
        got, consumed = _rd_varint(raw, 0)
        assert consumed == len(raw)
        assert got == (n if n >= 0 else n + (1 << 64))

    check()


def test_value_message_roundtrip_property():
    """Value messages survive arbitrary unicode names/strings and int64
    payloads through the independent decoder."""
    from hypothesis import given, settings, strategies as st

    from openlogreplicator_spark.sinks.protobuf_stream import _value

    @settings(max_examples=200, deadline=None)
    @given(
        name=st.text(min_size=1, max_size=30),
        val=st.one_of(
            st.none(),
            st.integers(min_value=-2 ** 63, max_value=2 ** 63 - 1),
            st.text(max_size=80),
            st.binary(max_size=40),
        ),
    )
    def check(name, val):
        decoded = _values([_value(name, val)])
        assert name in decoded
        kind, got = decoded[name]
        if val is None:
            assert kind == "null"  # only a true NULL column is name-only
        elif isinstance(val, int):
            # oneof member: explicit presence — 0 is on the wire
            assert kind == "int"
            assert got == (val if val >= 0 else val + (1 << 64))
        elif isinstance(val, bytes):
            assert (kind, got) == ("bytes", val)  # b"" emitted (oneof)
        else:
            assert (kind, got) == ("string", val)  # "" emitted (oneof)

    check()
