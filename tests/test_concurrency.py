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


def test_stale_lock_break_race_keeps_mutual_exclusion(tmp_path):
    """A dead holder's lock file is broken under contention WITHOUT ever
    letting two waiters into the critical section (round-4 TOCTOU fix:
    the break is an atomic rename-claim, so racing breakers can't unlink
    a lock a fresh live holder re-created)."""
    import os
    import time as _time

    from openlogreplicator_spark.lake import _commit_lock

    tdir = tmp_path / "t"
    tdir.mkdir()
    lock_path = tdir / "_commit.lock"
    # stale via the AGE cutoff (deterministic — a dead subprocess pid can
    # be recycled within seconds here: pid_max=32k and JVM threads share
    # the pid space, which made the dead-pid form flaky)
    lock_path.write_text(f"{os.getpid()}:stale-token")
    old = _time.time() - 10_000
    os.utime(lock_path, (old, old))

    gauge = {"cur": 0, "max": 0, "entries": 0}
    mu = threading.Lock()
    errors = []

    def worker():
        try:
            for _ in range(5):
                with _commit_lock(str(tdir), timeout_s=30):
                    with mu:
                        gauge["cur"] += 1
                        gauge["entries"] += 1
                        gauge["max"] = max(gauge["max"], gauge["cur"])
                    _time.sleep(0.001)
                    with mu:
                        gauge["cur"] -= 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(12)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errors, errors
    assert gauge["entries"] == 60
    assert gauge["max"] == 1, "two waiters entered the critical section"
    assert not lock_path.exists()
    # no leaked break-claim files
    assert not list(tdir.glob("_commit.lock.break.*"))


def test_live_lock_is_never_broken(tmp_path):
    """A lock whose recorded pid is ALIVE and young must survive
    _try_break — waiters time out instead of stealing it."""
    import os

    import pytest as _pytest

    from openlogreplicator_spark.lake import _commit_lock

    tdir = tmp_path / "t"
    tdir.mkdir()
    lock_path = tdir / "_commit.lock"
    lock_path.write_text(f"{os.getpid()}:live-holder")

    waiter = _commit_lock(str(tdir), timeout_s=0.2)
    with _pytest.raises(TimeoutError):
        waiter.__enter__()
    assert lock_path.read_text() == f"{os.getpid()}:live-holder"


def test_watermark_races_merge(spark, tmp_path):
    """commit_watermark (metadata-only) hammering the table concurrently
    with real merges: no lost merge, watermark monotone, every snapshot
    chain intact (verdict item 6 — watermark-vs-merge was untested)."""
    t = _mk(spark, tmp_path / "t")
    stop = threading.Event()
    errors = []
    gauge_noops = []

    def watermarker():
        # an empty-slice replay of an OLD batch id: commits manifest
        # versions (racing the merges at the CAS) but must never advance
        # the idempotence HWM past in-flight merges
        m = LakeTable(t.path)  # external handle
        n = 0
        while not stop.is_set():
            n += 1
            try:
                m.commit_watermark(1, {"operation": "noop", "batch_id": 1})
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
        gauge_noops.append(n)

    th = threading.Thread(target=watermarker, daemon=True)
    th.start()
    try:
        for b in range(2, 8):
            rows = [(k, f"b{b}_{k}", "U", ["v"])
                    for k in range(b * 10, b * 10 + 10)]
            t.merge(spark, spark.createDataFrame(rows, UPD), batch_id=b)
    finally:
        stop.set()
        th.join(timeout=60)
    assert not errors, errors

    got = t.read(spark).toPandas().sort_values("k").reset_index(drop=True)
    ref = _mk(spark, tmp_path / "ref")
    for b in range(2, 8):
        rows = [(k, f"b{b}_{k}", "U", ["v"])
                for k in range(b * 10, b * 10 + 10)]
        ref.merge(spark, spark.createDataFrame(rows, UPD), batch_id=b)
    want = ref.read(spark).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert t.last_batch_id() == 7  # merges win the HWM; noops never regress it
    assert gauge_noops and gauge_noops[0] > 0  # the watermarker really ran
    # parent chain is a single line: every manifest's parent is version-1
    # (the CAS refused every fork), and versions are contiguous
    versions = sorted(s["version"] for s in t.snapshots())
    assert versions == list(range(versions[0], versions[-1] + 1))
    for v in versions[1:]:
        assert t.manifest(v)["parent"] == v - 1


def test_merge_rebases_without_recompute_on_disjoint_conflict(spark, tmp_path):
    """A metadata-only commit landing mid-merge triggers the REBASE path:
    the already-written data files recommit against the fresh manifest and
    the Spark job does NOT re-run (round-4 _commit_rebased)."""
    t = _mk(spark, tmp_path / "t", mode="cow")
    writes = {"n": 0}
    orig_write = t._write_data

    def counting_write(*a, **k):
        writes["n"] += 1
        return orig_write(*a, **k)

    t._write_data = counting_write
    orig_commit = t._commit
    state = {"injected": False}

    def racing(manifest):
        if not state["injected"] and \
                manifest.get("summary", {}).get("operation") == "merge":
            state["injected"] = True
            # an external writer lands a metadata-only commit first
            LakeTable(t.path).commit_watermark(
                1, {"operation": "noop", "batch_id": 1})
        return orig_commit(manifest)

    t._commit = racing
    try:
        rows = [(k, f"r{k}", "U", ["v"]) for k in range(5)]
        s = t.merge(spark, spark.createDataFrame(rows, UPD), batch_id=2)
    finally:
        t._commit = orig_commit
        t._write_data = orig_write
    assert not s.get("skipped")
    assert writes["n"] == 1, "rebase must not re-run the Spark write"
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert all(got[k] == f"r{k}" for k in range(5))
    assert t.last_batch_id() == 2
    # seq invariant under rebase (round-4 ADVICE): every entry the rebased
    # commit wrote carries seq == the version that ACTUALLY committed, not
    # the version the merge originally intended
    m = t.manifest()
    touched = set(s["buckets"])
    assert all(e["seq"] == m["version"]
               for e in m["files"] if e["bucket"] in touched)


def test_merge_recomputes_on_same_bucket_conflict(spark, tmp_path):
    """A conflicting MERGE that touched the SAME buckets makes the rebase
    unsafe: the outer retry re-runs the whole merge against fresh state —
    no lost update from either writer."""
    t = _mk(spark, tmp_path / "t", mode="cow")
    writes = {"n": 0}
    orig_write = t._write_data

    def counting_write(*a, **k):
        writes["n"] += 1
        return orig_write(*a, **k)

    t._write_data = counting_write
    orig_commit = t._commit
    state = {"injected": False}

    def racing(manifest):
        if not state["injected"] and \
                manifest.get("summary", {}).get("operation") == "merge":
            state["injected"] = True
            # an external writer merges OVERLAPPING keys first (batch 2;
            # our in-flight merge is batch 3)
            LakeTable(t.path).merge(
                spark,
                spark.createDataFrame(
                    [(k, f"other{k}", "U", ["v"]) for k in range(10)], UPD),
                batch_id=2)
        return orig_commit(manifest)

    t._commit = racing
    try:
        rows = [(k, f"mine{k}", "U", ["v"]) for k in range(5)]
        s = t.merge(spark, spark.createDataFrame(rows, UPD), batch_id=3)
    finally:
        t._commit = orig_commit
        t._write_data = orig_write
    assert not s.get("skipped")
    assert writes["n"] >= 2, "same-bucket conflict must recompute"
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    # our merge replayed on top of the interloper's state: keys 0-4 ours,
    # 5-9 the interloper's
    assert all(got[k] == f"mine{k}" for k in range(5))
    assert all(got[k] == f"other{k}" for k in range(5, 10))
    assert t.last_batch_id() == 3


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
        from pyspark.sql import functions as F
        s = t.merge_direct(
            spark, spark.createDataFrame(rows, UPD).withColumn(
                "scn", F.col("k") * 10 + 5),
            batch_id=1,
            audit_aggs=[F.max("scn").alias("scn_max_obs"),
                        F.count(F.lit(1)).alias("events_obs")])
    finally:
        t._commit = orig
    assert not s.get("skipped")
    assert calls["n"] >= 2
    assert t.read(spark).count() == 50
    assert t.last_batch_id() == 1
    # the observed audits ride the fallback (round-5 review finding: the
    # scn watermark and event count were silently dropped, disarming the
    # hwm replay filter)
    assert s.get("events_obs") == 50
    assert t.last_scn() == 495


def test_merge_direct_nonempty_precondition_falls_back(spark, tmp_path):
    """merge_direct against a table that became non-empty between the
    caller's check and its manifest read falls back to merge (with the
    audits) instead of raising ValueError (round-5 review finding)."""
    from pyspark.sql import functions as F

    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=4)
    t.merge(spark, spark.createDataFrame(
        [(99, "pre", "I", ["v"])], UPD), batch_id=1)
    rows = [(k, f"v{k}", "I", ["v"]) for k in range(20)]
    s = t.merge_direct(
        spark, spark.createDataFrame(rows, UPD).withColumn(
            "scn", F.col("k") + 100),
        batch_id=2,
        audit_aggs=[F.max("scn").alias("scn_max_obs"),
                    F.count(F.lit(1)).alias("events_obs")])
    assert not s.get("skipped")
    assert s.get("events_obs") == 20
    assert t.read(spark).count() == 21
    assert t.last_scn() == 119


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


def test_commit_lock_displacement_detected_before_pointer_swap(tmp_path):
    """assert_held (round-4 ADVICE): a holder displaced by a stale-lock
    breaker mid-critical-section must detect the loss as a CommitConflict
    before its pointer swap, never race the usurper."""
    import os

    from openlogreplicator_spark.lake import _commit_lock

    lk = _commit_lock(str(tmp_path))
    lk.__enter__()
    try:
        lk.assert_held()  # still owned: no-op
        # a breaker displaces the lock and a fresh holder re-acquires
        os.unlink(lk.lock_path)
        with open(lk.lock_path, "w") as f:
            f.write("424242:usurper-token")
        with pytest.raises(CommitConflict):
            lk.assert_held()
        # and the lock path gone entirely is likewise a detected loss
        os.unlink(lk.lock_path)
        with pytest.raises(CommitConflict):
            lk.assert_held()
    finally:
        lk.__exit__(None, None, None)  # token mismatch -> no foreign unlink


def test_clobbered_manifest_detected_before_pointer_swap(tmp_path):
    """Content fencing (round-5 review): a displaced holder's resumed
    orphan-replace can swap a live usurper's same-version manifest bytes
    between the usurper's write and its pointer swap. The commit-token
    re-read must turn that lost update into a CommitConflict — the pointer
    must never publish foreign bytes as this writer's commit."""
    import json as _json

    import openlogreplicator_spark.lake as lake_mod
    from pyspark.sql import types as T

    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.LongType(), False)]),
        ["k"], num_buckets=2)
    v0 = t.current_version()

    orig = lake_mod._atomic_write_exclusive

    def clobber_after_write(path, payload):
        ok = orig(path, payload)
        if ok and "manifests" in path:
            foreign = _json.loads(payload)
            foreign["commit_token"] = "displaced-holder"
            lake_mod._atomic_write(path, _json.dumps(foreign))
        return ok

    lake_mod._atomic_write_exclusive = clobber_after_write
    try:
        m = dict(t.manifest())
        m.update(version=m["version"] + 1, parent=m["version"],
                 summary={"operation": "test"})
        with pytest.raises(CommitConflict, match="replaced"):
            t._commit(m)
    finally:
        lake_mod._atomic_write_exclusive = orig
    assert t.current_version() == v0  # pointer never swapped


def test_expire_removes_sidecars_and_dirs(spark, tmp_path):
    """Superseded per-commit data dirs are removed ENTIRELY by expiry —
    including Spark's _SUCCESS/.crc sidecars, which previously kept every
    dir alive forever (round-5 review finding: one leaked dir per commit
    defeats the retention disk bound)."""
    import glob
    import os

    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"],
                         num_buckets=4)  # CoW: old generations supersede
    for i in range(4):
        t.merge(spark, spark.createDataFrame(
            [(k, f"v{i}_{k}", "I", ["v"]) for k in range(8)], UPD),
            batch_id=i + 1)
    n_dirs_before = len(glob.glob(os.path.join(t.path, "data", "v*")))
    assert n_dirs_before >= 4
    t.expire_snapshots(keep_last=1, orphan_min_age_s=0.0)
    left = glob.glob(os.path.join(t.path, "data", "v*"))
    # only the retained snapshot's dir(s) survive, with no sidecar-only
    # husks
    assert len(left) < n_dirs_before
    live = {os.path.join(t.path, f["path"].split(os.sep)[0],
                          f["path"].split(os.sep)[1])
            for f in t.manifest()["files"]}
    for d in left:
        assert d in live, d


def test_legacy_fid_no_resurrection_on_readd(spark, tmp_path):
    """Pre-field-id table (name-identity fids): DROP x + re-ADD x must not
    re-issue the same legacy fid, or read() would bind the dropped
    column's historical bytes into the re-added column (round-5 review
    finding: the f_{name} fallback was deterministic by name)."""
    import json as _json
    import os

    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=2)
    # simulate a legacy table: strip the int field ids from the manifest
    mp = os.path.join(t.path, "_manifests", "v0.json")
    with open(mp) as f:
        m = _json.load(f)
    m.pop("schemas_fids", None)
    m.pop("field_ids", None)
    with open(mp, "w") as f:
        _json.dump(m, f)
    t = LakeTable(t.path)  # reopen past any cache

    from pyspark.sql.types import StringType

    t.alter_add_column("x", StringType())
    t.merge(spark, spark.createDataFrame(
        [(1, "v1", "secret", "I", ["v", "x"])],
        "k int, v string, x string, op string, cols_set array<string>"),
        batch_id=1)
    assert t.read(spark).where("x = 'secret'").count() == 1
    t.alter_drop_column("x")
    t.alter_add_column("x", StringType())
    # historical bytes must NOT resurface under the re-added column
    assert t.read(spark).where("x is not null").count() == 0
