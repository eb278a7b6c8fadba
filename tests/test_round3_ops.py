"""Round-3 new operators:

  * SCD Type-2 history (operators/scd2.py) — versioned state with
    [valid_from, valid_to) ranges, update-trim carry-forward, delete-epoch
    isolation;
  * conversation reconstruction (functions/transcripts.py);
  * CDC-incremental SimHash near-dup (functions/dedup.py) — equals the full
    self-join restricted to delta-touching pairs;
  * token-budget sharding (functions/packing.py) — deterministic and
    append-stable.
"""

import datetime as dt

import pytest

from pyspark.sql import Row, functions as F

from openlogreplicator_spark.functions import dedup as D
from openlogreplicator_spark.functions.packing import token_chunk_assign
from openlogreplicator_spark.functions.transcripts import (
    reconstruct_conversations,
)
from openlogreplicator_spark.operators.scd2 import scd2_history


TS = dt.datetime(2026, 8, 17, 12, 0, 0)


def _ev(scn, commit_scn, op, key, cols_set, role=None, text=None):
    after = {"role": role, "text": text, "ts": TS} if op != "D" else None
    return Row(
        conv_id=key[0], turn_idx=key[1], op=op, scn=scn,
        commit_scn=commit_scn, seq=scn, after=after, cols_set=cols_set,
    )


_SCHEMA = (
    "conv_id string, turn_idx long, op string, scn long, commit_scn long, "
    "seq long, after struct<role:string,text:string,ts:timestamp>, "
    "cols_set array<string>"
)


def test_scd2_versions_carry_and_epochs(spark):
    """I -> trimmed U (carries role) -> D (closes, emits nothing) ->
    re-insert (fresh epoch: pre-delete values must NOT leak)."""
    k = ("c1", 0)
    rows = [
        _ev(1, 10, "I", k, ["role", "text"], role="user", text="a"),
        _ev(2, 20, "U", k, ["text"], role=None, text="b"),  # trim: role unset
        _ev(3, 30, "D", k, []),
        _ev(4, 40, "I", k, ["text"], role=None, text="c"),  # no role this epoch
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = scd2_history(
        df, ["conv_id", "turn_idx"], ["role", "text"],
        ord_expr=F.col("commit_scn"),
    ).orderBy("valid_from").collect()

    assert [r["valid_from"] for r in out] == [10, 20, 40]
    assert [r["valid_to"] for r in out] == [20, 30, None]
    assert [r["is_current"] for r in out] == [False, False, True]
    # v2 carries role from v1 (update trim); v3 is a fresh epoch — role gone
    assert [(r["role"], r["text"]) for r in out] == [
        ("user", "a"), ("user", "b"), (None, "c"),
    ]


def test_scd2_set_null_preserved(spark):
    """A column explicitly SET to NULL overrides the carried value (the
    struct-wrap trick: 'set to null' != 'not set')."""
    k = ("c2", 1)
    rows = [
        _ev(1, 10, "I", k, ["role", "text"], role="user", text="a"),
        _ev(2, 20, "U", k, ["role"], role=None, text=None),  # role := NULL
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = scd2_history(
        df, ["conv_id", "turn_idx"], ["role", "text"],
        ord_expr=F.col("commit_scn"),
    ).orderBy("valid_from").collect()
    assert (out[1]["role"], out[1]["text"]) == (None, "a")


def test_reconstruct_conversations_orders_turns(spark):
    state = spark.createDataFrame(
        [
            ("c1", 2, "user", "three"),
            ("c1", 0, "user", "one"),
            ("c1", 1, None, "two"),
            ("c2", 5, "assistant", None),
        ],
        "conv_id string, turn_idx long, role string, text string",
    )
    out = {
        r["conv_id"]: r
        for r in reconstruct_conversations(state, sep="|").collect()
    }
    c1 = out["c1"]
    assert c1["n_turns"] == 3 and (c1["first_turn"], c1["last_turn"]) == (0, 2)
    assert c1["roles"] == "user,,user"
    assert c1["full_text"] == "one|two|three"
    assert c1["n_chars"] == len("one") + len("two") + len("three")
    c2 = out["c2"]
    assert c2["n_turns"] == 1 and c2["full_text"] == "" and c2["n_chars"] == 0


def test_incremental_neardup_equals_filtered_full(spark):
    """delta x (corpus + delta) banding finds exactly the full self-join's
    pairs that touch the delta — same pigeonhole completeness."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    delta = docs.where(F.col("doc_id") % 2 == 1)
    inc = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_neardup_incremental(
            corpus, delta, bits=32, radius=3, bands=4
        ).collect()
    )
    full = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_neardup_pairs(
            docs, bits=32, radius=3, bands=4
        ).collect()
        if r["doc_a"] % 2 == 1 or r["doc_b"] % 2 == 1
    )
    assert inc == full and len(inc) > 0


def test_token_chunks_deterministic_and_append_stable(spark):
    docs = spark.createDataFrame(
        [
            (0, "en", "a b c d"),     # 4 tokens -> chunk 0 @ 0
            (2, "en", "e f g"),       # 3 tokens -> chunk 0 @ 4
            (4, "en", "h i j k l"),   # starts at 7 -> chunk 1 @ 2
            (6, "en", "m"),           # starts at 12 -> chunk 2 @ 2
            (1, "fr", "x y z"),       # fr restarts at 0
            (3, "fr", "w v"),         # starts at 3 -> chunk 0 @ 3
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"], r["n_tokens"])
        for r in token_chunk_assign(docs, capacity_tokens=5).collect()
    }
    assert out == {
        0: (0, 0, 4), 2: (0, 4, 3), 4: (1, 2, 5), 6: (2, 2, 1),
        1: (0, 0, 3), 3: (0, 3, 2),
    }
    # append stability: adding doc 8 never moves existing assignments
    more = docs.union(
        spark.createDataFrame([(8, "en", "n o")],
                              "doc_id long, lang string, text string")
    )
    out2 = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"], r["n_tokens"])
        for r in token_chunk_assign(more, capacity_tokens=5).collect()
    }
    assert {k: v for k, v in out2.items() if k != 8} == out
    assert out2[8] == (2, 3, 2)


def test_session_window_boundary_semantics(spark):
    """Pins the native boundary: session_window's merge test is INCLUSIVE —
    an event at EXACTLY prev + gap stays in the session (so both the native
    and the lag-form (diff > gap) operators agree at the boundary, and the
    shared driver oracle is honest)."""
    from openlogreplicator_spark.functions.temporal import (
        session_stats, session_stats_native,
    )

    base = dt.datetime(2026, 8, 17, 10, 0, 0)
    rows = [
        ("u1", base, 1),
        ("u1", base + dt.timedelta(seconds=1800), 2),   # exactly gap later
        ("u1", base + dt.timedelta(seconds=5000), 3),   # clearly new
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    native = session_stats_native(ev, gap_seconds=1800).collect()
    manual = session_stats(ev, gap_seconds=1800).collect()
    assert sorted(r["n_events"] for r in native) == [1, 2]
    assert sorted(r["n_events"] for r in manual) == [1, 2]
    # native window end = last event of the session + gap
    first = min(native, key=lambda r: r["session_start"])
    assert first["n_events"] == 2
    assert (first["session_end"] - first["session_start"]).total_seconds() \
        == 1800 + 1800


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Structured Streaming session aggregation (watermark + session_window
    state) over a file feed equals the batch operator on the same events —
    the streaming form of session_stats_native."""
    import os

    from openlogreplicator_spark.functions.temporal import (
        session_stats_native,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 40)
        # watermarks need TIMESTAMP; the parquet ts is NTZ (identity cast
        # under the engine's UTC session contract)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    src_dir = str(tmp_path / "ev")
    # sentinel event far past every real session: append mode only emits
    # sessions the watermark has passed, and the sentinel drags the
    # watermark beyond all of them (availableNow runs the no-data flush
    # batch after the watermark advances)
    mx = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(999_999, mx + dt.timedelta(days=10))],
        "user_id bigint, ts timestamp",
    )
    ev.unionByName(sentinel).coalesce(2).write.parquet(src_dir)

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", "1800 seconds").alias("_w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        stream.writeStream.format("memory").queryName("sess_stream")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM sess_stream WHERE user_id != 999999"
        ).collect()
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_stats_native(ev, gap_seconds=1800).collect()
    )
    assert got == want and len(got) > 10


def test_cluster_chain_converges_with_shortcut(spark):
    """A 300-node chain (diameter 299) labels correctly within the default
    max_iter thanks to pointer jumping; pure hash-min capped at the same
    rounds silently mislabels the chain's tail — the robustness hole the
    shortcut closes."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "doc_a long, doc_b long"
    )
    out = D.neardup_clusters(pairs, max_iter=12, shortcut=True).collect()
    assert len(out) == 300
    assert all(r["cluster_id"] == 0 for r in out)
    bad = D.neardup_clusters(pairs, max_iter=12, shortcut=False).collect()
    assert any(r["cluster_id"] != 0 for r in bad)
