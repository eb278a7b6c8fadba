"""Measure streaming state-store bytes per open transaction: round-2
encoding (each buffered event wrapped in an outer ``json.dumps``, so every
quote of the already-JSON payload string is re-escaped) vs the round-3
parallel-flat-array encoding (payload strings stored verbatim in an
``array<string>`` column). Both are rendered to the wire form Spark's
HDFSBackedStateStore serializes (UnsafeRow bytes approximated by UTF-8
payload bytes + fixed per-field overhead), so the ratio — not the absolute
bytes — is the result. Appends a row to BENCH.md by hand (see docstring in
streaming/native_state.py:30-46 for the design trade).

Usage: python tools/probe_state_size.py [n_events_per_tx] [n_txs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def synth_buffer(n_events: int, tx: int) -> list[list]:
    """A buffered transaction exactly as make_assembler holds it:
    [scn, seq, op, conv_id, turn_idx, payload-json-string] per event."""
    rows = []
    for i in range(n_events):
        payload = json.dumps({
            "conv_id": f"conv-{tx % 97}",
            "turn_idx": i,
            "role": "assistant" if i % 2 else "user",
            "text": (
                'He said "quote-heavy" text with \\ escapes and unicode '
                "éü " + "tok " * 40
            ),
            "ts": "2026-08-17T12:00:00.123456",
            "meta": None,
        }, separators=(",", ":"))
        rows.append([8000 + tx * 1000 + i, i, "I", f"conv-{tx % 97}", i,
                     payload])
    return rows


def round2_bytes(buf: list[list]) -> int:
    # round-2 _STATE_SCHEMA: "rows array<string>, has_begin boolean" with
    # rows = [json.dumps(r) for r in sorted(buf)]
    return sum(len(json.dumps(r).encode()) for r in buf) + 1


def round3_bytes(buf: list[list]) -> int:
    # round-3: six parallel flat arrays; payload strings verbatim
    b = 0
    for r in buf:
        b += 8 + 8 + len(r[2].encode()) + len(r[3].encode()) + 8
        b += len(r[5].encode())
    return b + 1


def slim_bytes(buf: list[list]) -> int:
    # keys-only form (streaming_assembly_slim): five flat arrays, NO
    # payload — the feed's own files are the payload store, re-joined
    # scn-bounded after emission (rejoin_payload)
    b = 0
    for r in buf:
        b += 8 + 8 + len(r[2].encode()) + len(r[3].encode()) + 8
    return b + 1


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_txs = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    tot2 = tot3 = tots = 0
    t2 = t3 = 0.0
    for tx in range(n_txs):
        buf = synth_buffer(n_events, tx)
        t0 = time.perf_counter()
        tot2 += round2_bytes(buf)
        t2 += time.perf_counter() - t0
        t0 = time.perf_counter()
        tot3 += round3_bytes(buf)
        t3 += time.perf_counter() - t0
        tots += slim_bytes(buf)

    per2 = tot2 / n_txs
    per3 = tot3 / n_txs
    pers = tots / n_txs
    print(json.dumps({
        "n_txs": n_txs, "events_per_tx": n_events,
        "round2_state_bytes_per_tx": round(per2),
        "round3_state_bytes_per_tx": round(per3),
        "slim_state_bytes_per_tx": round(pers),
        "ratio_r2_vs_r3": round(per2 / per3, 3),
        "ratio_r3_vs_slim": round(per3 / pers, 3),
        "round2_encode_s": round(t2, 3), "round3_encode_s": round(t3, 3),
    }))


if __name__ == "__main__":
    main()
