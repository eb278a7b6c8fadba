"""Streaming-native transaction assembly: per-xid open-transaction state in
Spark's STATE STORE via ``applyInPandasWithState``.

This is the second implementation of the G1 stateful core (OLR's in-memory
transaction map, OracleAnalyzer.h:111-112 / RedoLog.cpp:768-902):

  * the default engine path (streaming/pipeline.py) re-delivers raw open
    rows from a deterministic PendingStore into the next microbatch and
    reuses the vectorized batch assembler — state is recomputed, the store
    is plain parquet, and crash recovery is trivial to reason about;
  * THIS path keeps the open-transaction buffer keyed by xid inside the
    streaming state store, checkpointed atomically with the source offsets —
    Spark-native exactly-once state, no re-delivery, no recompute. It is
    the architecture the reference itself uses (a live per-XID buffer).

``transformWithStateInPandas`` (Spark 4's richer API) requires the python
``protobuf`` package for its control channel, which this environment lacks —
``applyInPandasWithState`` has no such dependency and covers the semantics.

Semantics per xid (mirrors operators/assembly.py exactly):
  * B marks begin; R discards the buffer; PR retracts the latest unpopped
    DML (TransactionBuffer.cpp:159-183) — PRs are BUFFERED so a PR arriving
    a batch after its DML still pops it;
  * C with begin seen (or require_begin=False) emits the surviving DML
    annotated with commit_scn — survivors computed with the same
    prefix-sum + suffix-min trick, vectorized numpy over the buffered
    transaction (no per-row Python);
  * unterminated buffers persist in the state store across batches.

Scale notes: state is per-transaction and bounded by open-transaction size
(OLR's memory governor bounds the same buffer); the shuffle key is xid, so
skew equals transaction size, not conversation heat. The wide payload
crosses the state boundary as one JSON string per event, held in PARALLEL
FLAT ARRAYS in the state row (round-3): the payload string is serialized
once JVM-side (to_json) and stored verbatim — the round-2 form wrapped
each buffered row in an outer ``json.dumps``, re-escaping every quote of
the payload JSON and re-serializing the whole buffer in Python per batch
(2x state bytes on quote-heavy payloads, O(buffer) Python work per
microbatch even when nothing changed). The true keys-only slim-verdict
form EXISTS as of round 3 (``streaming_assembly_slim`` +
``rejoin_payload``): state = (scn, seq, op, conv_id, turn_idx) only —
measured ~11.6x smaller state rows than the flat-array form
(tools/probe_state_size.py) — with the feed's own immutable scn-ordered
files as the payload store; the re-join reads them with a DYNAMIC
scn-bounded filter computed from the emitted batch (pushed to the parquet
scan, so footer min/max stats prune all files outside the open-tx window).
The payload-carrying form remains the default for sinks that cannot run a
batch-side join (pure writeStream to Kafka); pipelines that apply to the
lake in foreachBatch should prefer slim.
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from openlogreplicator_spark.config import EngineConfig

# payload carried through state as one JSON string per event. The JSON
# timestamp format MUST carry microseconds: Spark's default to_json renders
# milliseconds only, silently truncating .123456 -> .123 on the round-trip
# (verified on this pyspark build) — which would break the per-turn
# equality contract for microsecond feeds.
_PAYLOAD_SCHEMA = (
    "struct<after:struct<role:string,text:string,tool:string,"
    "ts:timestamp,meta:string>,cols_set:array<string>,"
    "rows:array<struct<conv_id:string,turn_idx:bigint,"
    "after:struct<role:string,text:string,tool:string,"
    "ts:timestamp,meta:string>,cols_set:array<string>>>>"
)
_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"}

OUT_SCHEMA = (
    "xid string, scn long, seq long, op string, conv_id string, "
    "turn_idx long, payload string, commit_scn long"
)
OUT_SCHEMA_SLIM = (
    "xid string, scn long, seq long, op string, conv_id string, "
    "turn_idx long, commit_scn long"
)
_STATE_SCHEMA = (
    "scns array<long>, seqs array<long>, ops array<string>, "
    "convs array<string>, turns array<long>, payloads array<string>, "
    "has_begin boolean"
)
_STATE_SCHEMA_SLIM = (
    "scns array<long>, seqs array<long>, ops array<string>, "
    "convs array<string>, turns array<long>, has_begin boolean"
)

# MI/MD buffer as ONE entry each (whole-vector partial-rollback unit);
# they unnest after emission (operators/decode.py unnest_multirow)
DML = ("I", "U", "D", "MI", "MD")


def _emit(chunks: list[tuple], commit_scn: int, xid: str,
          slim: bool = False) -> pd.DataFrame:
    """Vectorized survivor selection over one terminated transaction's
    buffer. ``chunks`` is a list of column-array tuples (scn, seq, op,
    conv, turn[, payload]) — each internally (scn, seq)-sorted; the
    concatenation is lexsorted once here."""
    cols = [np.concatenate([c[i] for c in chunks])
            for i in range(len(chunks[0]))]
    order = np.lexsort((cols[1], cols[0]))  # by (scn, seq)
    cols = [c[order] for c in cols]
    op = cols[2]
    is_dml = np.isin(op, DML)
    delta = np.where(op == "PR", -1, np.where(is_dml, 1, 0))
    running = np.cumsum(delta)
    suffix_min = np.minimum.accumulate(running[::-1])[::-1]
    keep = is_dml & (suffix_min >= running)
    cols = [c[keep] for c in cols]
    n = len(cols[0])
    out = {
        "xid": np.full(n, xid, dtype=object),
        "scn": cols[0],
        "seq": cols[1],
        "op": cols[2],
        "conv_id": cols[3],
        "turn_idx": pd.array(cols[4], dtype="Int64"),
    }
    if not slim:
        out["payload"] = cols[5]
    out["commit_scn"] = np.full(n, commit_scn, dtype=np.int64)
    return pd.DataFrame(out)


def make_assembler(cfg: EngineConfig, slim: bool = False):
    require_begin = cfg.require_begin
    width = 5 if slim else 6

    def assemble(key, pdfs, state: GroupState):
        xid = key[0]
        # buffer = list of column-array CHUNKS (appended per batch span,
        # concatenated + lexsorted only at emit/save) — the round-3 form
        # walked every buffered event in a per-row Python loop per batch
        if state.exists:
            cols = state.get
            has_begin = cols[-1]
            buf = [(
                np.asarray(cols[0], dtype=np.int64),
                np.asarray(cols[1], dtype=np.int64),
                *(np.asarray(c, dtype=object) for c in cols[2:width]),
            )] if len(cols[0]) else []
        else:
            buf, has_begin = [], False

        parts = [p for p in pdfs if len(p)]
        emitted = False
        if parts:
            new = pd.concat(parts, ignore_index=True)
            new = new.sort_values(["scn", "seq"], kind="mergesort")
            ops = new["op"].to_numpy(dtype=object)
            # turn_idx arrives float64 when the batch carries MI/MD rows
            # (their turn is NULL) — normalize to int objects/None so the
            # state round-trip through `turns array<long>` stays lossless
            tv = new["turn_idx"].to_numpy()
            tmask = pd.notna(tv)
            tobj = np.empty(len(tv), dtype=object)
            tobj[~tmask] = None
            if tmask.any():
                tobj[tmask] = tv[tmask].astype(np.int64)
            arrs = [
                new["scn"].to_numpy(dtype=np.int64),
                new["seq"].to_numpy(dtype=np.int64),
                ops,
                new["conv_id"].to_numpy(dtype=object),
                tobj,
            ]
            if not slim:
                arrs.append(new["payload"].to_numpy(dtype=object))
            # terminators must be honored IN ORDER: an R mid-batch discards
            # the buffer before a later B/DML/C of a reused xid builds the
            # next transaction. Vectorized: drop rows that are neither
            # terminators nor buffered ops (preserves relative order), then
            # segment at terminator positions — DML/PR spans append as
            # whole column slices, Python touches only the terminators.
            is_term = (ops == "B") | (ops == "R") | (ops == "C")
            wanted = is_term | np.isin(ops, DML) | (ops == "PR")
            if not wanted.all():
                sel = np.flatnonzero(wanted)
                arrs = [a[sel] for a in arrs]
                ops = arrs[2]
                is_term = (ops == "B") | (ops == "R") | (ops == "C")
            start = 0
            for ti in np.flatnonzero(is_term):
                ti = int(ti)
                if ti > start:
                    buf.append(tuple(a[start:ti] for a in arrs))
                o = ops[ti]
                if o == "B":
                    has_begin = True
                elif o == "R":
                    buf, has_begin = [], False
                else:  # C
                    if (has_begin or not require_begin) and buf:
                        yield _emit(buf, int(arrs[0][ti]), xid, slim=slim)
                        emitted = True
                    buf, has_begin = [], False
                start = ti + 1
            if start < len(ops):
                buf.append(tuple(a[start:] for a in arrs))

        if buf or has_begin:
            cat = [np.concatenate([c[i] for c in buf])
                   for i in range(width)] if buf else \
                  [np.array([], dtype=np.int64)] * 2 + \
                  [np.array([], dtype=object)] * (width - 2)
            order = np.lexsort((cat[1], cat[0]))
            # .tolist() converts numpy scalars to plain python for the
            # state row; runs only on the UNTERMINATED remainder
            state.update(tuple(c[order].tolist() for c in cat)
                         + (has_begin,))
        elif state.exists:
            state.remove()
        if not emitted:
            cols = ["xid", "scn", "seq", "op", "conv_id", "turn_idx"]
            if not slim:
                cols.append("payload")
            yield pd.DataFrame(columns=cols + ["commit_scn"])

    return assemble


def streaming_assembly_slim(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Keys-only state-store assembly (the slim-verdict form of
    ``streaming_assembly``): the wide text payload NEVER crosses the state
    boundary — state rows hold only (scn, seq, op, conv_id, turn_idx) per
    buffered event, shrinking checkpointed state by the payload fraction
    (measured ~11.6x on ~330 B payloads, tools/probe_state_size.py). The
    emitted stream is keys-only too; ``rejoin_payload`` recovers the full
    change image batch-side from the feed's own immutable files with an
    scn-bounded pruned read (the feed IS the payload store — its files are
    scn-ordered, so parquet min/max footer stats skip everything outside
    the emitted range; the dynamic lower bound the module doc calls out).
    """
    slim = events.select("xid", "scn", "seq", "op", "conv_id", "turn_idx")
    return slim.groupBy("xid").applyInPandasWithState(
        make_assembler(cfg, slim=True),
        OUT_SCHEMA_SLIM,
        _STATE_SCHEMA_SLIM,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# cached slim frames awaiting release, KEYED BY FEED DIR (one streaming
# pipeline = one feed dir): rejoin_payload is called once per microbatch
# from foreachBatch; each call drains ITS OWN pipeline's previous frame, so
# accumulation is bounded at one batch's (keys-only, small) cache per
# pipeline, and two pipelines sharing a driver can no longer unpersist each
# other's in-flight frame mid-batch (round-4 ADVICE). Lock-guarded: the
# registry mutates from whichever thread runs the microbatch.
_REJOIN_CACHED: dict = {}
_REJOIN_LOCK = threading.Lock()


def release_rejoin_cache(feed_dir: "str | None" = None) -> None:
    """Unpersist the slim frame cached for ``feed_dir`` (or ALL cached
    frames when None) once its results have been consumed."""
    with _REJOIN_LOCK:
        if feed_dir is None:
            frames = list(_REJOIN_CACHED.values())
            _REJOIN_CACHED.clear()
        else:
            f = _REJOIN_CACHED.pop(feed_dir, None)
            frames = [f] if f is not None else []
    for f in frames:
        try:
            f.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass


def rejoin_payload(spark, slim_committed: DataFrame, feed_dir: str,
                   bounds: "tuple[int, int] | None" = None) -> DataFrame:
    """Recover payloads for a batch of slim committed rows: read the feed
    scn-bounded (files pruned via parquet min/max stats — the feed's seq
    files are scn-ordered), join on the event identity (xid, scn, seq),
    then unnest packed multi-row events.

    ``bounds``: (scn_lo, scn_hi) of the slim batch, when the caller
    already knows it — the streaming pipeline tracks per-batch scn ranges
    in its lineage, so passing them keeps this a SINGLE traversal of the
    slim plan. Without bounds, the slim side is persisted for the
    duration of the call (it is keys-only, so the cache is small) so the
    min/max pre-pass does not recompute the upstream plan twice; the
    cached handle is tracked per feed dir and drained on THIS pipeline's
    next call (or via ``release_rejoin_cache``), so per-microbatch use from
    foreachBatch never accumulates cached partitions across batches
    (round-3 ADVICE) and concurrent pipelines never drain each other
    (round-4 ADVICE)."""
    from openlogreplicator_spark.operators.decode import unnest_multirow

    release_rejoin_cache(feed_dir)
    if bounds is None:
        slim_committed = slim_committed.persist()
        with _REJOIN_LOCK:
            _REJOIN_CACHED[feed_dir] = slim_committed
        lohi = slim_committed.agg(
            F.min("scn").alias("lo"), F.max("scn").alias("hi")).first()
        bounds = (lohi["lo"], lohi["hi"])
    rng = (F.lit(False) if bounds[0] is None
           else F.col("scn").between(int(bounds[0]), int(bounds[1])))
    feed = (
        spark.read.parquet(feed_dir)
        .where(rng)
        .select("xid", "scn", "seq", "after", "cols_set", "rows")
    )
    joined = slim_committed.join(feed, ["xid", "scn", "seq"], "inner")
    return unnest_multirow(joined)


def streaming_assembly(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Stateful streaming assembly: CHANGE_EVENT stream -> committed
    surviving DML stream annotated with commit_scn, with open transactions
    held in the Spark state store across microbatches.

    Returns rows with the `after`/`cols_set` payload re-expanded JVM-side.
    """
    slim = events.select(
        "xid", "scn", "seq", "op", "conv_id", "turn_idx",
        F.to_json(
            F.struct(
                "after", "cols_set",
                *( ["rows"] if "rows" in events.columns else [] ),
            ),
            _JSON_OPTS,
        ).alias("payload"),
    )
    out = slim.groupBy("xid").applyInPandasWithState(
        make_assembler(cfg),
        OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    parsed = out.withColumn(
        "p", F.from_json("payload", _PAYLOAD_SCHEMA, _JSON_OPTS)
    )
    from openlogreplicator_spark.operators.decode import unnest_multirow

    out2 = parsed.select(
        "xid", "scn", "seq", "op", "conv_id", "turn_idx", "commit_scn",
        F.col("p.after").alias("after"), F.col("p.cols_set").alias("cols_set"),
        F.col("p.rows").alias("rows"),
    )
    return unnest_multirow(out2)
