"""Versioned snapshot store: time travel, commit atomicity, rollback,
expire, and snapshot-checkpoint resume (north_rule: "resumable from
Iceberg-snapshot checkpoints")."""

import os

import pytest
from pyspark.sql import functions as F

from tzspark.datasets import images_df
from tzspark.snapshots import VersionedTable, run_resumable_snapshots

N = 300


def _halves(spark):
    imgs = images_df(spark, N, partitions=3).select("image_id", "caption")
    a = imgs.where(F.col("image_id") < "img000000000100")
    b = imgs.where(F.col("image_id") >= "img000000000100")
    return imgs, a, b


def test_append_and_time_travel(spark, tmp_path):
    imgs, a, b = _halves(spark)
    vt = VersionedTable(spark, str(tmp_path / "t"))
    assert vt.current_snapshot_id() is None

    s1 = vt.commit_overwrite(a)
    s2 = vt.commit_append(b)
    assert (s1, s2) == (1, 2)
    assert vt.current_snapshot_id() == 2

    # current sees both commits; VERSION AS OF 1 sees only the first
    assert vt.read().count() == N
    assert vt.read(snapshot_id=1).count() == 100
    got = sorted(r["image_id"] for r in vt.read().collect())
    exp = sorted(r["image_id"] for r in imgs.collect())
    assert got == exp

    # snapshot metadata: lineage rows add up, append chains the parent
    snaps = {s["snapshot_id"]: s for s in vt.snapshots()}
    assert snaps[1]["added_rows"] == 100 and snaps[1]["parent_id"] is None
    assert snaps[2]["added_rows"] == 200 and snaps[2]["parent_id"] == 1
    assert snaps[2]["operation"] == "append"
    assert len(snaps[2]["data_dirs"]) == 2
    assert sum(snaps[2]["manifest"].values()) == 200


def test_overwrite_replaces(spark, tmp_path):
    _, a, b = _halves(spark)
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit_overwrite(a)
    vt.commit_overwrite(b)
    assert vt.read().count() == 200
    assert vt.read(snapshot_id=1).count() == 100  # history intact


def test_orphan_data_dir_is_invisible_and_not_reused(spark, tmp_path):
    """Crash after data files land but before the snapshot json: readers are
    unaffected and the next commit never writes into the dirty directory."""
    _, a, b = _halves(spark)
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit_overwrite(a)

    orphan = os.path.join(vt.root, "data", "snap-00002")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-torn.parquet"), "w") as f:
        f.write("garbage")

    assert vt.current_snapshot_id() == 1
    assert vt.read().count() == 100  # orphan invisible
    s = vt.commit_append(b)
    assert s == 3  # skipped the orphan's id
    assert vt.read().count() == N
    assert orphan not in vt.snapshot(3)["data_dirs"]


def test_crash_before_pointer_swing_is_uncommitted(spark, tmp_path, monkeypatch):
    """The pointer swap is the commit point: a snapshot whose json landed
    but whose pointer swing crashed is invisible to readers and is NOT the
    parent of the next commit."""
    _, a, b = _halves(spark)
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit_overwrite(a)

    def boom(snap_id):
        raise OSError("crash at the commit point")

    monkeypatch.setattr(vt, "_swing_pointer", boom)
    with pytest.raises(OSError):
        vt.commit_append(b)
    monkeypatch.undo()

    assert vt.current_snapshot_id() == 1
    assert vt.read().count() == 100
    # retry: new id, parent is the last COMMITTED snapshot, table is whole
    s = vt.commit_append(b)
    assert s == 3 and vt.snapshot(3)["parent_id"] == 1
    assert vt.read().count() == N


def test_rollback_and_expire(spark, tmp_path):
    _, a, b = _halves(spark)
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit_overwrite(a)
    vt.commit_append(b)

    vt.rollback(1)
    assert vt.read().count() == 100
    assert vt.read(snapshot_id=2).count() == N  # still readable by id

    # divergent history after rollback: the new commit chains off snapshot 1
    extra = images_df(spark, 10, partitions=1).select("image_id", "caption")
    s3 = vt.commit_append(extra.withColumn("image_id", F.concat(F.lit("x"), "image_id")))
    assert vt.snapshot(s3)["parent_id"] == 1
    assert vt.read().count() == 110

    # expire everything but the live line; snapshot 2's unshared data dies
    dead_dirs = [d for d in vt.snapshot(2)["data_dirs"]
                 if d not in vt.snapshot(s3)["data_dirs"]]
    vt.expire_snapshots(keep_ids=[1, s3])
    assert [s["snapshot_id"] for s in vt.snapshots()] == [1, s3]
    for d in dead_dirs:
        assert not os.path.exists(d)
    assert vt.read().count() == 110  # live line untouched
    with pytest.raises(ValueError):
        vt.expire_snapshots(keep_ids=[1])  # cannot expire current


def test_compact_rewrites_files_history_intact(spark, tmp_path):
    def _data_files(vt, sid):
        return [
            f for d in vt.snapshot(sid)["data_dirs"]
            for f in os.listdir(d) if f.endswith(".parquet")
        ]

    _, a, b = _halves(spark)
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.commit_overwrite(a.repartition(3))
    vt.commit_append(b.repartition(3))
    assert len(_data_files(vt, 2)) == 6

    s3 = vt.compact(target_files=1)
    assert vt.snapshot(s3)["operation"] == "compact"
    assert len(vt.snapshot(s3)["data_dirs"]) == 1
    assert len(_data_files(vt, s3)) == 1
    assert vt.read().count() == N
    # pre-compaction history still time-travels
    assert vt.read(snapshot_id=1).count() == 100
    assert vt.read(snapshot_id=2).count() == N
    got = sorted(r["image_id"] for r in vt.read().collect())
    exp = sorted(r["image_id"] for r in vt.read(snapshot_id=2).collect())
    assert got == exp


def test_resume_from_snapshot_checkpoint(spark, tmp_path):
    """Each resume lands as one append snapshot; re-runs process only the
    missing keys; a no-op run commits nothing."""
    imgs, a, _ = _halves(spark)
    root = str(tmp_path / "t")
    processed = []

    def transform(df):
        processed.append(df.count())
        return df.withColumn("tagged", F.lit(True))

    r1 = run_resumable_snapshots(spark, a, "image_id", root, transform)
    assert r1.count() == 100 and processed == [100]

    r2 = run_resumable_snapshots(spark, imgs, "image_id", root, transform)
    assert r2.count() == N and processed == [100, 200]

    vt = VersionedTable(spark, root)
    before = vt.current_snapshot_id()
    r3 = run_resumable_snapshots(spark, imgs, "image_id", root, transform)
    assert r3.count() == N and processed == [100, 200]  # nothing recomputed
    assert vt.current_snapshot_id() == before  # and nothing committed


def test_commit_merge_upsert_semantics(spark, tmp_path):
    """MERGE (copy-on-write): matched keys replaced, unmatched kept, new
    keys inserted — as one snapshot; the parent still reads pre-merge."""
    vt = VersionedTable(spark, str(tmp_path / "m"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    s1 = vt.commit_overwrite(base)
    source = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k int, v string"  # update k=2, insert k=4
    )
    s2 = vt.commit_merge(source, ["k"])
    assert (s1, s2) == (1, 2)

    got = {r["k"]: r["v"] for r in vt.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}
    # time travel still sees the pre-merge table
    pre = {r["k"]: r["v"] for r in vt.read(snapshot_id=1).collect()}
    assert pre == {1: "a", 2: "b", 3: "c"}
    snaps = {s["snapshot_id"]: s for s in vt.snapshots()}
    assert snaps[2]["operation"] == "merge" and snaps[2]["parent_id"] == 1
    # COW: the merge snapshot owns exactly its rewritten data dirs
    assert len(snaps[2]["data_dirs"]) == 1
    # idempotence guard: merging the same source again changes nothing
    vt.commit_merge(source, ["k"])
    again = {r["k"]: r["v"] for r in vt.read().collect()}
    assert again == got
