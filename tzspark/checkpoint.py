"""Checkpoint/resume with per-partition lineage (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

The sandbox has no Iceberg jars, so the snapshot store is the parquet
TableIO (tableio.py — the explicit storage seam a real deployment backs with
Iceberg snapshots, SURVEY.md §7 hard part (c)): each stage writes to its own
snapshot directory with an atomic _SUCCESS marker plus a lineage manifest
(per-partition row counts + stage metadata). Re-running a finished stage is
a metadata no-op; re-running after a crash recomputes only missing stages.

Row-level resume (``run_resumable``): completed output keys are left-anti
joined against the input so only unprocessed rows are transformed and
APPENDED — the engine analog of restarting a 10^12-row job from the last
committed snapshot instead of from zero.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tableio import TableIO


class SnapshotRunner:
    """Stage-level checkpointing: stage(name, fn) computes fn() only when the
    stage snapshot is absent; always returns the snapshot-backed DataFrame.

    All storage goes through the TableIO seam (parquet here; an Iceberg
    deployment passes its own TableIO and gains real snapshot isolation)."""

    def __init__(self, spark: SparkSession, root: str, io: TableIO = None):
        self.spark = spark
        self.root = root
        self.io = io or TableIO(spark)
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, f"stage={name}")

    def _success(self, path: str) -> bool:
        """A stage is done only when BOTH the storage commit marker and the
        lineage manifest exist: _lineage.json is written after the commit,
        so a crash in between must re-run the stage rather than leave a
        'done' stage whose manifest() raises forever."""
        return self.io.is_committed(path) and os.path.exists(
            os.path.join(path, "_lineage.json")
        )

    def stage(self, name: str, fn, partition_by: list = None) -> DataFrame:
        out = self._dir(name)
        if not self._success(out):
            if self.io.exists(out):  # torn write from a crashed run
                self.io.remove(out)
            df = fn()
            t0 = time.time()
            self.io.write_snapshot(df, out, partition_by)
            self._write_manifest(name, out, time.time() - t0)
        return self.io.read_snapshot(out)

    def _write_manifest(self, name: str, out: str, elapsed: float):
        """Per-partition lineage: (file, row_count) for every output file +
        stage metrics. Derived from the committed files themselves so the
        manifest can never disagree with the data."""
        df = self.io.read_snapshot(out)
        lineage = (
            df.withColumn("_file", F.input_file_name())
            .groupBy("_file")
            .agg(F.count("*").alias("row_count"))
        ).collect()
        manifest = {
            "stage": name,
            "elapsed_sec": round(elapsed, 3),
            "n_files": len(lineage),
            "n_rows": int(sum(r["row_count"] for r in lineage)),
            "files": {os.path.basename(r["_file"]): int(r["row_count"]) for r in lineage},
        }
        with open(os.path.join(out, "_lineage.json"), "w") as f:
            json.dump(manifest, f, indent=1)

    def manifest(self, name: str) -> dict:
        with open(os.path.join(self._dir(name), "_lineage.json")) as f:
            return json.load(f)

    def is_done(self, name: str) -> bool:
        return self._success(self._dir(name))

    def invalidate(self, name: str):
        self.io.remove(self._dir(name))


def run_resumable(
    spark: SparkSession,
    input_df: DataFrame,
    key_col: str,
    out_dir: str,
    transform,
    io: TableIO = None,
) -> DataFrame:
    """Row-level resume: transform only input rows whose key is not already
    in the output, append them, and return the full output.

    transform(df) must keep ``key_col`` in its output. Safe to re-run after
    any crash: the worst case is a partially-appended batch being counted as
    done only if its files were committed (task commit is atomic per file in
    the parquet TableIO; per snapshot under an Iceberg TableIO — uncommitted
    work is invisible to the reader either way).
    """
    io = io or TableIO(spark)
    todo = input_df
    if io.exists(out_dir):
        try:
            done = io.read_snapshot(out_dir).select(key_col).distinct()
            todo = input_df.join(done, key_col, "left_anti")
        except Exception:
            pass  # unreadable/empty dir -> process everything
    if todo.limit(1).count() > 0:
        io.append(transform(todo), out_dir)
    return io.read_snapshot(out_dir)
