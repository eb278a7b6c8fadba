"""Property-based assembly semantics: the vectorized prefix-sum/suffix-min
survivor selection must equal a direct stack-machine interpretation of the
reference's transaction buffer (TransactionBuffer.cpp:124-183: append DML,
PR pops the latest unpopped entry, R discards, C flushes in order) — for
ANY op sequence, across ANY microbatch split (state round-trips through
the same flat-array encoding the state store uses).

Pure pandas kernel under test (make_assembler via a fake GroupState) — no
JVM, so hypothesis can explore hundreds of interleavings cheaply.
"""

import pandas as pd
from hypothesis import given, settings, strategies as st

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.streaming.native_state import make_assembler

CFG = EngineConfig()  # require_begin=True


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None


def _stack_oracle(events, require_begin=True):
    """Direct reference semantics: ordered buffer + PR pop + R discard +
    C flush. Returns [(scn, op)] of every emitted surviving DML with its
    commit scn, in emission order."""
    buf, has_begin, out = [], False, []
    for scn, op in events:
        if op == "B":
            has_begin = True
        elif op == "R":
            buf, has_begin = [], False
        elif op == "C":
            if (has_begin or not require_begin) and buf:
                out += [(s, o, scn) for s, o in buf]
            buf, has_begin = [], False
        elif op == "PR":
            if buf:
                buf.pop()  # retract latest unpopped DML
        else:  # DML
            buf.append((scn, op))
    return out


def _run_kernel_batches(events, cuts):
    """Feed the kernel the events split at the given batch boundaries,
    round-tripping state between batches (exactly the state-store flow)."""
    fn = make_assembler(CFG)
    state = _FakeState()
    emitted = []
    bounds = [0] + sorted(cuts) + [len(events)]
    for i in range(len(bounds) - 1):
        chunk = events[bounds[i]:bounds[i + 1]]
        pdf = pd.DataFrame(
            [("x1", scn, 0, op, "c", 1, "{}") for scn, op in chunk],
            columns=["xid", "scn", "seq", "op", "conv_id", "turn_idx",
                     "payload"],
        )
        for f in fn(("x1",), [pdf], state):
            if len(f):
                emitted.append(f)
    if emitted:
        allf = pd.concat(emitted, ignore_index=True)
        return [(int(r.scn), r.op, int(r.commit_scn))
                for r in allf.itertuples()]
    return []


_op = st.sampled_from(["B", "C", "R", "PR", "I", "U", "D", "I", "U"])


@settings(max_examples=120, deadline=None)
@given(
    ops=st.lists(_op, min_size=1, max_size=40),
    cut_seed=st.integers(min_value=0, max_value=10 ** 9),
)
def test_kernel_equals_stack_oracle_any_sequence_any_split(ops, cut_seed):
    events = [(i + 1, op) for i, op in enumerate(ops)]
    want = _stack_oracle(events)

    # batch boundaries derived deterministically from the seed: 0-3 cuts
    n = len(events)
    cuts = sorted({(cut_seed // (13 ** k)) % (n + 1)
                   for k in range(cut_seed % 4)} - {0, n})
    got = _run_kernel_batches(events, list(cuts))

    # emission order within a transaction is buffer order; compare exactly
    assert got == want


@settings(max_examples=60, deadline=None)
@given(ops=st.lists(_op, min_size=1, max_size=40))
def test_kernel_single_batch_equals_per_event_batches(ops):
    """Extreme split (every event its own microbatch) == one batch —
    state round-tripping is invisible to the semantics."""
    events = [(i + 1, op) for i, op in enumerate(ops)]
    one = _run_kernel_batches(events, [])
    per_event = _run_kernel_batches(events, list(range(1, len(events))))
    assert one == per_event
