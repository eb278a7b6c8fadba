"""Probe: Python time of the state-store assembly kernel per microbatch
(verdict round-3 item 4 'done' criterion — before/after the vectorized
terminator walk).

Drives ``make_assembler``'s per-xid kernel directly (no Spark): one xid
whose microbatch carries K transactions of N events each (B, dml..., C),
measuring wall time per assemble() call and derived events/sec. The
round-3 kernel walked every buffered event in a Python ``itertuples``
loop; the round-4 form segments the sorted batch at terminator positions
with numpy and appends DML spans as column chunks.

Usage: python tools/probe_state_kernel.py [tx_size ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from openlogreplicator_spark.config import EngineConfig  # noqa: E402
from openlogreplicator_spark.streaming.native_state import (  # noqa: E402
    make_assembler,
)


class FakeState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True

    def remove(self):
        self._v, self.exists = None, False


def batch(tx_size: int, n_txs: int, slim: bool) -> pd.DataFrame:
    rows = []
    scn = 0
    for t in range(n_txs):
        rows.append((scn, 0, "B", None, None)); scn += 1
        for i in range(tx_size):
            rows.append((scn, 0, "U", f"conv{i % 50}", i % 200)); scn += 1
        # one partial rollback per tx keeps the PR path hot
        rows.append((scn, 0, "PR", None, None)); scn += 1
        rows.append((scn, 0, "C", None, None)); scn += 1
    pdf = pd.DataFrame(rows, columns=["scn", "seq", "op", "conv_id",
                                      "turn_idx"])
    if not slim:
        pdf["payload"] = np.where(
            pdf["op"].isin(["U"]), '{"after":{"text":"x"}}', None)
    return pdf


def run(tx_size: int, slim: bool, total_events: int = 200_000) -> float:
    n_txs = max(1, 2000 // (tx_size + 3))
    pdf = batch(tx_size, n_txs, slim)
    asm = make_assembler(EngineConfig(), slim=slim)
    reps = max(1, total_events // len(pdf))
    t0 = time.perf_counter()
    n_out = 0
    for _ in range(reps):
        st = FakeState()
        for out in asm(("xid0",), [pdf], st):
            n_out += len(out)
    dt = time.perf_counter() - t0
    evps = reps * len(pdf) / dt
    print(f"  tx_size={tx_size:>5} slim={int(slim)} batch={len(pdf):>6} "
          f"reps={reps:>4} out_rows={n_out:>8} {dt:6.2f}s "
          f"{evps:>12,.0f} ev/s")
    return evps


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20, 200, 1000]
    print("state-kernel Python throughput (higher is better)")
    for slim in (False, True):
        for s in sizes:
            run(s, slim)


if __name__ == "__main__":
    main()
