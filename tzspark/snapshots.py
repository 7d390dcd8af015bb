"""Versioned snapshot store: Iceberg-shaped table semantics over parquet.

The north_rule deployment stores the 10^12-row image table in Iceberg and
resumes jobs "from Iceberg-snapshot checkpoints". tableio.TableIO is the
storage seam (one directory == one current snapshot); this module adds the
part of the Iceberg model the engine's resume story actually depends on —
a LOG of immutable snapshots with an atomically-swapped current pointer:

* every commit (overwrite or append) creates a new numbered snapshot whose
  metadata lists exactly the data directories it can see (append = parent's
  dirs + the new one, like Iceberg manifests reuse);
* readers resolve the current pointer (or an explicit snapshot id — the
  `VERSION AS OF` form) and scan only that snapshot's directories, so a
  writer crash at ANY point is invisible: data lands first, the snapshot
  json next, the `current` pointer (os.replace, atomic) last;
* rollback is a pointer move (newer snapshots stay readable by id until
  `expire_snapshots`, the maintenance analog, garbage-collects unreachable
  data dirs);
* per-snapshot metadata carries the lineage manifest (per-file row counts,
  derived from the committed files themselves) + commit metrics, the same
  shape checkpoint.SnapshotRunner pins per stage.

Single-writer by design (the sandbox has no catalog to arbitrate optimistic
commits; an Iceberg deployment gets that from the catalog swap). Layout:

    root/data/snap-00001/part-*.parquet   immutable per-commit file sets
    root/metadata/v00001.json             snapshot: parent, op, dirs, manifest
    root/metadata/current                 text: id of the live snapshot
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- metadata ------------------------------------------------------------

    def _meta_path(self, snap_id: int) -> str:
        return os.path.join(self.root, "metadata", f"v{snap_id:05d}.json")

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "metadata", "current")

    def current_snapshot_id(self):
        """Id of the live snapshot, or None for an empty table."""
        try:
            with open(self._pointer_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def snapshot(self, snap_id: int) -> dict:
        with open(self._meta_path(snap_id)) as f:
            return json.load(f)

    def snapshots(self) -> list:
        """All COMMITTED snapshots, oldest first (metadata json present;
        orphaned data dirs from crashed commits are not snapshots)."""
        md = os.path.join(self.root, "metadata")
        ids = sorted(
            int(f[1:6]) for f in os.listdir(md)
            if f.startswith("v") and f.endswith(".json")
        )
        return [self.snapshot(i) for i in ids]

    def _next_id(self) -> int:
        """Next snapshot id: past every committed snapshot AND every orphan
        data dir a crashed commit may have left, so a retry never writes
        into a dirty directory."""
        ids = [s["snapshot_id"] for s in self.snapshots()]
        data = os.path.join(self.root, "data")
        orphans = [
            int(d[5:]) for d in os.listdir(data) if d.startswith("snap-")
        ]
        return max(ids + orphans, default=0) + 1

    # -- commits ---------------------------------------------------------

    def _commit(self, df: DataFrame, operation: str) -> int:
        t0 = time.time()
        snap_id = self._next_id()
        data_dir = os.path.join(self.root, "data", f"snap-{snap_id:05d}")
        df.write.mode("overwrite").parquet(data_dir)

        # lineage manifest from the committed files themselves (the same
        # can't-disagree-with-the-data rule as SnapshotRunner._write_manifest)
        lineage = (
            self.spark.read.parquet(data_dir)
            .withColumn("_file", F.input_file_name())
            .groupBy("_file")
            .agg(F.count("*").alias("row_count"))
        ).collect()
        new_files = {
            os.path.basename(r["_file"]): int(r["row_count"]) for r in lineage
        }

        parent = self.current_snapshot_id()
        if operation == "append" and parent is not None:
            dirs = self.snapshot(parent)["data_dirs"] + [data_dir]
        else:
            dirs = [data_dir]
        meta = {
            "snapshot_id": snap_id,
            "parent_id": parent,
            "operation": operation,
            "data_dirs": dirs,
            "manifest": new_files,
            "added_rows": int(sum(new_files.values())),
            "added_files": len(new_files),
            "commit_sec": round(time.time() - t0, 3),
            "schema": json.loads(df.schema.json()),
        }
        tmp = self._meta_path(snap_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path(snap_id))
        self._swing_pointer(snap_id)
        return snap_id

    def _swing_pointer(self, snap_id: int):
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, self._pointer_path())

    def commit_overwrite(self, df: DataFrame) -> int:
        """Replace the table content (createOrReplace analog)."""
        return self._commit(df, "overwrite")

    def commit_append(self, df: DataFrame) -> int:
        """Fast append: the new snapshot sees the parent's files + df's
        (no rewrite of existing data — Iceberg's append commit)."""
        return self._commit(df, "append")

    def commit_merge(self, source: DataFrame, key_cols: list) -> int:
        """MERGE INTO analog, copy-on-write strategy (Iceberg v1 MERGE):
        current rows whose keys match ``source`` are replaced by the source
        rows, non-matching rows are kept, and source rows with new keys are
        inserted — all as ONE new snapshot (readers of the parent snapshot
        see the pre-merge table forever; the pointer swing is the commit
        point). The kept side is a left-anti join on the keys, so the
        rewrite shuffles each side once on the merge key; a
        merge-on-read variant would instead commit delete files — COW is
        the right trade for batch upserts that touch a large fraction of
        rows."""
        return self._commit(self._merge_frame(source, key_cols), "merge")

    def _merge_frame(self, source: DataFrame, key_cols: list) -> DataFrame:
        """The (lazy) merged table commit_merge materializes — exposed so
        the plan auditor (scripts/explain_plans.py) can assert the merge
        shape: kept side = left-anti join on the keys, one shuffle per
        side, no cross join."""
        kept = self.read().join(
            source.select(*key_cols).distinct(), list(key_cols), "left_anti"
        )
        return kept.unionByName(source)

    # -- reads -----------------------------------------------------------

    def read(self, snapshot_id: int = None) -> DataFrame:
        """Scan the current snapshot, or `VERSION AS OF snapshot_id`."""
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if sid is None:
            raise ValueError(f"table {self.root} has no committed snapshot")
        return self.spark.read.parquet(*self.snapshot(sid)["data_dirs"])

    # -- maintenance -------------------------------------------------------

    def compact(self, target_files: int = 1) -> int:
        """Rewrite the current snapshot's files into ``target_files``
        (rewrite_data_files maintenance analog): a long append chain
        accumulates one small file set per commit, which a 1000-executor
        scan pays for in task-scheduling overhead; compaction folds them
        into one fresh overwrite snapshot. History stays time-travelable
        until expire_snapshots."""
        df = self.read().coalesce(target_files)
        snap_id = self._commit(df, "compact")
        return snap_id

    def rollback(self, snapshot_id: int):
        """Point the table back at an older snapshot (pure metadata swap;
        newer snapshots stay readable by id until expired)."""
        self.snapshot(snapshot_id)  # must exist
        self._swing_pointer(snapshot_id)

    def expire_snapshots(self, keep_ids: list):
        """Drop snapshots not in keep_ids and delete data dirs no kept
        snapshot references (expire_snapshots maintenance analog)."""
        import shutil

        keep = set(keep_ids)
        cur = self.current_snapshot_id()
        if cur is not None and cur not in keep:
            raise ValueError("cannot expire the current snapshot")
        live_dirs = set()
        for sid in keep:
            live_dirs.update(self.snapshot(sid)["data_dirs"])
        for s in self.snapshots():
            if s["snapshot_id"] not in keep:
                os.remove(self._meta_path(s["snapshot_id"]))
        data = os.path.join(self.root, "data")
        for d in os.listdir(data):
            full = os.path.join(data, d)
            if d.startswith("snap-") and full not in live_dirs:
                shutil.rmtree(full)


def run_resumable_snapshots(
    spark: SparkSession,
    input_df: DataFrame,
    key_col: str,
    root: str,
    transform,
) -> DataFrame:
    """checkpoint.run_resumable with SNAPSHOT-atomic appends: each resume
    processes only input keys absent from the CURRENT snapshot and lands
    them as one append commit. Upgrade over the plain-parquet form: a crash
    after data files are written but before the commit leaves the pointer
    on the parent snapshot, so half-written batches are never visible and
    never double-counted — the re-run recomputes exactly those rows into a
    fresh snapshot (the Iceberg-checkpoint resume the north_rule names).

    transform(df) must keep ``key_col``. Returns the current table content.
    """
    vt = VersionedTable(spark, root)
    todo = input_df
    if vt.current_snapshot_id() is not None:
        done = vt.read().select(key_col).distinct()
        todo = input_df.join(done, key_col, "left_anti")
    if todo.limit(1).count() > 0:
        vt.commit_append(transform(todo))
    return vt.read()
