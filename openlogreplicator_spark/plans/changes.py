"""Snapshot-diff changelog: derive the CDC stream BETWEEN two lake
snapshots (Iceberg changelog scan / `table_changes` analog).

The engine's primary direction is feed -> lake; this closes the loop for
downstream consumers that want CDC FROM the lake (e.g. cascading a derived
table, backfilling a new sink from an arbitrary snapshot range): diff
snapshot ``from_version`` against ``to_version`` and emit one row per
changed key — 'I' (key appeared), 'U' (any payload column changed,
null-safe), 'D' (key vanished) — with both the new and previous images
(the reference's before/after message pair, OutputBuffer.cpp per-op
images).

Scale: the join only reads TOUCHED buckets — copy-on-write rewrites whole
bucket files, so any bucket whose file set is identical between the two
manifests provably holds identical rows and is pruned from BOTH scans
before any I/O (manifest-level diff, no file reads). The remaining diff is
one full-outer join on the merge key. Both sides are files of the SAME
bucket spec, so on real Iceberg the v2 storage-partitioned join
(`spark.sql.sources.v2.bucketing.enabled`) elides both exchanges; the
local parquet stand-in can't declare its bucketing to Catalyst, so the
plan here shows the two hash exchanges (PLANS.md 'snapshot-diff
changelog') — they disappear, not grow, at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from openlogreplicator_spark.lake import LakeTable


def changed_buckets(table: LakeTable, from_version: int,
                    to_version: int) -> list[int]:
    """Buckets whose data-file sets differ between the two snapshots —
    a pure manifest computation (no data I/O)."""
    def files_by_bucket(v: int) -> dict[int, frozenset]:
        out: dict[int, set] = {}
        for f in table.manifest(v)["files"]:
            out.setdefault(f["bucket"], set()).add(f["path"])
        return {b: frozenset(s) for b, s in out.items()}

    a, b = files_by_bucket(from_version), files_by_bucket(to_version)
    return sorted(
        bk for bk in set(a) | set(b) if a.get(bk) != b.get(bk)
    )


def table_changes(
    spark: SparkSession,
    table: LakeTable,
    from_version: int,
    to_version: int,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key whose state differs between the snapshots (see
    module doc). Output: key cols, ``change`` ('I'|'U'|'D'), the payload
    columns (new image; null for 'D') and ``prev_<col>`` (previous image;
    null for 'I'). Schema evolution between the snapshots is fine — both
    sides align to the LATER snapshot's column names (stable field ids)."""
    key_cols = table.key_cols
    cur_schema = table.manifest(to_version)["schema"]
    if payload_cols is None:
        payload_cols = [
            f["name"] for f in cur_schema["fields"]
            if f["name"] not in key_cols
        ]
    buckets = changed_buckets(table, from_version, to_version)
    old = table.read(spark, buckets=buckets, version=from_version)
    new = table.read(spark, buckets=buckets, version=to_version)
    # align the old image to the new names through the rename lineage: a
    # column renamed between the snapshots keeps its field id, and read()
    # already bound each side to its own snapshot's names — map old->new
    # by id where both exist
    m = table.manifest(to_version)
    fids_new = LakeTable._fids(m, m["schema_id"])
    m_old = table.manifest(from_version)
    fids_old = LakeTable._fids(m_old, m_old["schema_id"])
    old_name_by_fid = {fid: n for n, fid in fids_old.items()}
    sel = [F.col(k) for k in key_cols]
    for c in payload_cols:
        phys = old_name_by_fid.get(fids_new.get(c))
        if phys is not None and phys in old.columns:
            sel.append(F.col(phys).alias(c))
        else:
            sel.append(
                F.lit(None).cast(dict(
                    (f["name"], f["type"]) for f in cur_schema["fields"]
                )[c]).alias(c)
            )
    old = old.select(*sel)

    # presence markers, not key-null tests: the join matches NULL keys with
    # eqNullSafe, so a null-keyed row must not read as "absent"
    o = old.withColumn("_p", F.lit(True)).alias("o")
    n = new.withColumn("_p", F.lit(True)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o._p").isNotNull()
    in_new = F.col("n._p").isNotNull()
    differs = None
    for c in payload_cols:
        d = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(differs, F.lit("U"))
    )
    proj = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
        for k in key_cols
    ]
    proj.append(change.alias("change"))
    proj += [F.col(f"n.{c}").alias(c) for c in payload_cols]
    proj += [F.col(f"o.{c}").alias(f"prev_{c}") for c in payload_cols]
    return j.select(*proj).where(F.col("change").isNotNull())
