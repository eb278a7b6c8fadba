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
    """The metadata-only watermark advance retries after a REAL injected
    conflict (an interloper commit lands first), and never regresses the
    high-water mark."""
    t = _mk(spark, tmp_path / "t")
    orig = t._commit
    calls = {"n": 0}

    def flaky(manifest):
        calls["n"] += 1
        if calls["n"] == 1:
            # another writer lands between our manifest read and swap:
            # actually advance the table, then surface the conflict
            m = dict(t.manifest())
            m.update(version=m["version"] + 1, parent=m["version"],
                     summary={"operation": "interloper"})
            orig(m)
            raise CommitConflict("injected: interloper won the swap")
        return orig(manifest)

    t._commit = flaky
    try:
        t.commit_watermark(5000, {"operation": "noop", "batch_id": 5000})
    finally:
        t._commit = orig
    assert calls["n"] >= 2  # the retry really ran
    assert t.last_batch_id() == 5000
    assert any(s["summary"]["operation"] == "interloper"
               for s in t.snapshots())
    # monotonic: a late lower watermark never regresses
    t.commit_watermark(100, {"operation": "noop", "batch_id": 100})
    assert t.last_batch_id() == 5000


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


def test_merge_direct_conflict_falls_back_to_merge(spark, tmp_path):
    """Bootstrap (merge_direct) losing the commit race must not crash the
    first batch: it falls back to the general merge path against the
    fresh state."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=4)
    orig = t._commit
    calls = {"n": 0}

    def flaky(manifest):
        calls["n"] += 1
        if calls["n"] == 1:
            m = dict(t.manifest())
            m.update(version=m["version"] + 1, parent=m["version"],
                     summary={"operation": "interloper"})
            orig(m)
            raise CommitConflict("injected")
        return orig(manifest)

    t._commit = flaky
    try:
        rows = [(k, f"v{k}", "I", ["v"]) for k in range(50)]
        s = t.merge_direct(spark, spark.createDataFrame(rows, UPD), batch_id=1)
    finally:
        t._commit = orig
    assert not s.get("skipped")
    assert calls["n"] >= 2
    assert t.read(spark).count() == 50
    assert t.last_batch_id() == 1


def test_expire_spares_young_orphans(spark, tmp_path):
    """Unreferenced files younger than orphan_min_age_s survive expiry —
    they may be a concurrent in-flight commit's data (Iceberg
    remove_orphan_files min-age rule); superseded files (referenced by
    expired manifests) are removed regardless of age."""
    import glob
    import os
    import shutil

    t = _mk(spark, tmp_path / "t")
    t.merge(spark, spark.createDataFrame(
        [(1, "x2", "U", ["v"])], UPD), batch_id=2)  # supersedes bucket files

    existing = glob.glob(os.path.join(t.path, "data", "v*", "**", "*.parquet"),
                         recursive=True)
    orphan_dir = os.path.join(t.path, "data", "v99-pending", "_b=0")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-inflight.parquet")
    shutil.copy(existing[0], orphan)

    r = t.expire_snapshots(keep_last=1)
    assert os.path.exists(orphan), "young orphan must survive"
    assert r["expired_manifests"] > 0
    assert t.read(spark).count() > 0  # current snapshot intact

    r2 = t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    assert not os.path.exists(orphan), "aged-out orphan is collected"
    assert t.read(spark).count() > 0
