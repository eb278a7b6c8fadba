"""Optimistic-concurrency commits (Iceberg commit-validation analog).

The deployment reality at scale: ONE streaming writer plus external
maintenance jobs (compaction, expire, rebucket) racing it. The lake's
commit is a compare-and-swap under a lock-file — a losing writer gets
CommitConflict and retries against the fresh state — so concurrent
commits can never silently orphan each other's files (the pre-round-3
pointer swap was last-wins).
"""

import threading

import pandas as pd
import pytest
from pyspark.sql.types import LongType, StringType, StructType

from openlogreplicator_spark.lake import CommitConflict, LakeTable

SCHEMA = StructType().add("k", LongType()).add("v", StringType())
UPD = "k long, v string, op string, cols_set array<string>"


def _mk(spark, path, mode="mor"):
    t = LakeTable.create(str(path), SCHEMA, ["k"], num_buckets=4,
                         write_mode=mode)
    rows = [(k, f"v{k}", "I", ["v"]) for k in range(200)]
    t.merge(spark, spark.createDataFrame(rows, UPD), batch_id=1)
    return t


def test_commit_conflict_detected_and_refused(spark, tmp_path):
    """Two manifests built from the same parent: the second commit must
    refuse (CommitConflict), never overwrite the first."""
    t = _mk(spark, tmp_path / "t")
    m1 = dict(t.manifest())
    m1.update(version=m1["version"] + 1, parent=m1["version"],
              summary={"operation": "a"})
    m2 = dict(m1)
    m2.update(summary={"operation": "b"})
    t._commit(m1)
    with pytest.raises(CommitConflict):
        t._commit(m2)
    assert t.manifest()["summary"]["operation"] == "a"


def test_merge_races_compaction(spark, tmp_path):
    """A maintenance compaction thread hammers the table while merges
    land: every merge must survive (no lost updates), compactions must
    never resurrect deleted rows or drop live ones."""
    t = _mk(spark, tmp_path / "t")
    stop = threading.Event()
    errors = []

    def maintenance():
        # a second handle, as an external job would hold
        m = LakeTable(t.path)
        while not stop.is_set():
            try:
                m.compact(spark)
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    th = threading.Thread(target=maintenance, daemon=True)
    th.start()
    try:
        for b in range(2, 8):
            rows = (
                [(k, f"b{b}_{k}", "U", ["v"]) for k in range(b * 10, b * 10 + 10)]
                + [(k, None, "D", None) for k in range(b, b + 3)]
            )
            t.merge(spark, spark.createDataFrame(rows, UPD), batch_id=b)
    finally:
        stop.set()
        th.join(timeout=60)
    assert not errors, errors

    got = t.read(spark).toPandas().sort_values("k").reset_index(drop=True)

    # sequential oracle on a fresh table: same batches, no concurrency
    ref = _mk(spark, tmp_path / "ref")
    for b in range(2, 8):
        rows = (
            [(k, f"b{b}_{k}", "U", ["v"]) for k in range(b * 10, b * 10 + 10)]
            + [(k, None, "D", None) for k in range(b, b + 3)]
        )
        ref.merge(spark, spark.createDataFrame(rows, UPD), batch_id=b)
    want = ref.read(spark).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermark_noop_commit_retries_under_conflict(spark, tmp_path):
    """replay's metadata-only watermark advance retries on conflict and
    never regresses the high-water mark."""
    from openlogreplicator_spark.plans.replay import _commit_watermark

    t = _mk(spark, tmp_path / "t")
    # a concurrent writer advances the watermark past ours between our
    # manifest read and commit — simulate by pre-advancing
    _commit_watermark(t, 5000, {"operation": "noop", "batch_id": 5000})
    _commit_watermark(t, 100, {"operation": "noop", "batch_id": 100})
    assert t.last_batch_id() == 5000  # never regressed


def test_metadata_tables(spark, tmp_path):
    """history()/files() metadata tables (Iceberg <table>.history/.files):
    queryable DataFrames over the manifests, no data I/O."""
    t = _mk(spark, tmp_path / "t")  # create + merge (MoR)
    t.merge(spark, spark.createDataFrame(
        [(1, "x", "U", ["v"]), (5, None, "D", None)], UPD), batch_id=2)
    t.compact(spark)

    h = t.history(spark).orderBy("version").collect()
    assert [r["operation"] for r in h] == \
        ["create", "merge", "merge", "compact"]
    assert h[-2]["last_batch_id"] == 2
    assert h[-1]["last_batch_id"] == 2  # compact preserves the watermark

    f = t.files(spark)
    assert f.where("content = 'eq-del'").count() == 0  # compacted away
    assert f.count() == f.select("path").distinct().count()
    total = f.groupBy().sum("rows").first()[0]
    assert total == t.read(spark).count()
    # pre-compact snapshot still lists its delete files
    f_pre = t.files(spark, version=2)
    assert f_pre.where("content = 'eq-del'").count() > 0
