"""TableIO: the storage seam between the engine and the table format.

SURVEY.md §7 hard part (c) plans the engine against snapshot-capable table
storage (Iceberg in the north_star deployment: snapshot commits, fast
appends, bucket(n, col) partition transforms). This sandbox has no Iceberg
jars, so the shipped implementation is plain parquet directories with
Spark's _SUCCESS commit marker — but every snapshot/append/bucketed write in
the repo routes through THIS class (checkpoint.SnapshotRunner,
checkpoint.run_resumable, api.assign_bucketed), so an Iceberg deployment is
one subclass away:

    class IcebergTableIO(TableIO):
        write_snapshot -> df.writeTo(ident).createOrReplace()
        append         -> df.writeTo(ident).append()
        read_snapshot  -> spark.table(ident)  (or VERSION AS OF for resume)
        is_committed   -> snapshot exists in the table's metadata
        write_bucketed -> partitionedBy(bucket(n, col))

No other file knows what the bytes on disk look like.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    """Parquet-directory implementation of the snapshot-store contract."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- snapshots (atomic overwrite commits) -------------------------------

    def write_snapshot(self, df: DataFrame, path: str, partition_by: list = None):
        """Commit df as the new content of ``path`` (all-or-nothing: readers
        only see it once the _SUCCESS marker lands)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def read_snapshot(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    def is_committed(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_SUCCESS"))

    def remove(self, path: str):
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)

    # -- appends (task-atomic; uncommitted temp files are invisible) --------

    def append(self, df: DataFrame, path: str):
        df.write.mode("append").parquet(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    # -- bucketed tables (co-located joins, zero downstream Exchange) -------

    def write_bucketed(
        self, df: DataFrame, table_name: str, n_buckets: int, bucket_col: str
    ) -> DataFrame:
        """Persist bucketed+sorted on ``bucket_col`` and hand back the
        catalog-backed DataFrame (bucketing metadata live for join planning).
        Iceberg analog: partitionedBy(bucket(n_buckets, bucket_col))."""
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(table_name)
        )
        return self.spark.table(table_name)
