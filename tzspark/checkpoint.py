"""Checkpoint/resume with per-partition lineage (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

The sandbox has no Iceberg jars, so the snapshot store is a thin parquet
implementation behind the same seam a real deployment would back with
Iceberg snapshots (SURVEY.md §7 hard part (c)): each stage writes to its own
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
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _success(path: str) -> bool:
    """A stage is done only when BOTH the parquet _SUCCESS marker and the
    lineage manifest exist: _lineage.json is written after the parquet
    commit, so a crash in between must re-run the stage rather than leave a
    'done' stage whose manifest() raises forever."""
    return os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(
        os.path.join(path, "_lineage.json")
    )


class SnapshotRunner:
    """Stage-level checkpointing: stage(name, fn) computes fn() only when the
    stage snapshot is absent; always returns the snapshot-backed DataFrame."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, f"stage={name}")

    def stage(self, name: str, fn, partition_by: list = None) -> DataFrame:
        out = self._dir(name)
        if not _success(out):
            if os.path.exists(out):  # torn write from a crashed run
                shutil.rmtree(out)
            df = fn()
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            t0 = time.time()
            w.parquet(out)
            self._write_manifest(name, out, time.time() - t0)
        return self.spark.read.parquet(out)

    def _write_manifest(self, name: str, out: str, elapsed: float):
        """Per-partition lineage: (file, row_count) for every output file +
        stage metrics. Derived from the committed files themselves so the
        manifest can never disagree with the data."""
        df = self.spark.read.parquet(out)
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
        return _success(self._dir(name))

    def invalidate(self, name: str):
        out = self._dir(name)
        if os.path.exists(out):
            shutil.rmtree(out)


def run_resumable(
    spark: SparkSession,
    input_df: DataFrame,
    key_col: str,
    out_dir: str,
    transform,
) -> DataFrame:
    """Row-level resume: transform only input rows whose key is not already
    in the output, append them, and return the full output.

    transform(df) must keep ``key_col`` in its output. Safe to re-run after
    any crash: the worst case is a partially-appended batch being counted as
    done only if its files were committed (parquet task commit is atomic per
    file; uncommitted temp files are ignored by the reader).
    """
    todo = input_df
    if os.path.exists(out_dir):
        try:
            done = spark.read.parquet(out_dir).select(key_col).distinct()
            todo = input_df.join(done, key_col, "left_anti")
        except Exception:
            pass  # unreadable/empty dir -> process everything
    if todo.limit(1).count() > 0:
        transform(todo).write.mode("append").parquet(out_dir)
    return spark.read.parquet(out_dir)
