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


def _emit(rows: list[list], commit_scn: int, xid: str,
          slim: bool = False) -> pd.DataFrame:
    """Vectorized survivor selection over one terminated transaction's
    buffer (ordered rows: [scn, seq, op, conv, turn(, payload)])."""
    op = np.array([r[2] for r in rows])
    is_dml = np.isin(op, DML)
    delta = np.where(op == "PR", -1, np.where(is_dml, 1, 0))
    running = np.cumsum(delta)
    suffix_min = np.minimum.accumulate(running[::-1])[::-1]
    keep = is_dml & (suffix_min >= running)
    kept = [r for r, k in zip(rows, keep) if k]
    out = {
        "xid": [xid] * len(kept),
        "scn": pd.array([r[0] for r in kept], dtype="int64"),
        "seq": pd.array([r[1] for r in kept], dtype="int64"),
        "op": [r[2] for r in kept],
        "conv_id": [r[3] for r in kept],
        "turn_idx": pd.array([r[4] for r in kept], dtype="Int64"),
    }
    if not slim:
        out["payload"] = [r[5] for r in kept]
    out["commit_scn"] = pd.array([commit_scn] * len(kept), dtype="int64")
    return pd.DataFrame(out)


def make_assembler(cfg: EngineConfig, slim: bool = False):
    require_begin = cfg.require_begin
    width = 5 if slim else 6

    def assemble(key, pdfs, state: GroupState):
        xid = key[0]
        if state.exists:
            cols = state.get
            has_begin = cols[-1]
            buf = [list(r) for r in zip(*cols[:-1])]
        else:
            buf, has_begin = [], False

        parts = [p for p in pdfs if len(p)]
        emitted = False
        if parts:
            new = pd.concat(parts, ignore_index=True)
            new = new.sort_values(["scn", "seq"], kind="mergesort")
            # process terminators IN ORDER: an R mid-batch must discard the
            # buffer before a later B/DML/C of a reused xid builds the next
            # transaction (honoring only the last terminator would resurrect
            # rolled-back DML and drop post-terminator events)
            for r in new.itertuples(index=False):
                if r.op == "B":
                    has_begin = True
                elif r.op == "R":
                    buf, has_begin = [], False
                elif r.op == "C":
                    if (has_begin or not require_begin) and buf:
                        yield _emit(sorted(buf), int(r.scn), xid, slim=slim)
                        emitted = True
                    buf, has_begin = [], False
                elif r.op in DML or r.op == "PR":
                    row = [
                        int(r.scn), int(r.seq), r.op, r.conv_id,
                        None if pd.isna(r.turn_idx) else int(r.turn_idx),
                    ]
                    if not slim:
                        row.append(r.payload)
                    buf.append(row)

        if buf or has_begin:
            b = sorted(buf)
            state.update(tuple(
                [r[i] for r in b] for i in range(width)
            ) + (has_begin,))
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
    min/max pre-pass does not recompute the upstream plan twice."""
    from openlogreplicator_spark.operators.decode import unnest_multirow

    if bounds is None:
        slim_committed = slim_committed.persist()
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
