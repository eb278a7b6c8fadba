"""Kernel probe for the protobuf byte-packing hot path (round-4 verdict
item 7): events/s of the pure-Python encoder that runs inside the
mapInPandas Arrow batches of sinks/protobuf_stream.py — the one
Python-throughput-bound sink if a 100 TB deployment streamed the full
change volume through the protobuf side-channel.

No Spark: this times exactly the per-row work the executor's Python worker
does between Arrow batches (same shape as tools/probe_state_kernel.py).
Scenarios mirror the state-kernel probe: 200 and 1000 ops/tx, per-op and
per-transaction message modes.

Run: python tools/probe_protobuf_pack.py [--events 200000] [--repeats 3]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openlogreplicator_spark.sinks.protobuf_stream import (  # noqa: E402
    _OP_ENUM,
    _hdr_kwargs,
    _op_payload,
    _payload_msg,
    _response,
)


def _mk_ops(n_events: int, seed: int = 7):
    """Deterministic synthetic ops in the shape the encoder sees after the
    Arrow hand-off: (op, key dict, after dict, cols_set)."""
    import random

    rng = random.Random(seed)
    ops = []
    for i in range(n_events):
        op = ("I", "U", "D")[rng.randrange(3)]
        key = {"conv_id": f"c{i % 997}", "turn_idx": i % 61}
        after = {
            "role": ("user", "assistant")[i % 2],
            "text": f"turn c{i % 997}/{i % 61} v{i} " + "x" * (i % 40),
            "ts": "2023-11-14 10:00:00",
        }
        cols_set = ["role", "text", "ts"][: 1 + (i % 3)]
        ops.append((op, key, after, cols_set))
    return ops


def _encode_all(ops, ops_per_tx: int, per_tx: bool) -> bytes:
    """Encode every event; return a digest so repeats can assert identical
    bytes across kernel changes (the golden-stability check)."""
    h = hashlib.sha256()
    if not per_tx:
        for i, (op, key, after, cols_set) in enumerate(ops):
            payload = _op_payload(op, "OLR", "transcripts", key, after,
                                  cols_set)
            h.update(_response(1000 + i, f"x{i % 100}", [payload]))
        return h.digest()
    for t0 in range(0, len(ops), ops_per_tx):
        chunk = ops[t0:t0 + ops_per_tx]
        payloads = [_payload_msg(_OP_ENUM["BEGIN"], None)]
        for op, key, after, cols_set in chunk:
            payloads.append(_op_payload(op, "OLR", "transcripts", key,
                                        after, cols_set))
        payloads.append(_payload_msg(_OP_ENUM["COMMIT"], None))
        h.update(_response(1000 + t0, f"x{t0 % 100}", payloads))
    return h.digest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    ops = _mk_ops(args.events)
    print(f"protobuf packing kernel probe: {args.events} events, "
          f"best of {args.repeats}")
    for ops_per_tx, per_tx, label in (
        (1, False, "per-op mode"),
        (200, True, "per-tx, 200 ops/tx"),
        (1000, True, "per-tx, 1000 ops/tx"),
    ):
        best, dig = None, None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            d = _encode_all(ops, ops_per_tx, per_tx)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            assert dig is None or dig == d
            dig = d
        print(f"  {label:22s}  {args.events / best:>10,.0f} ev/s  "
              f"({best:.3f}s)  digest={dig.hex()[:12]}")


if __name__ == "__main__":
    main()
