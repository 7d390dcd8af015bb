"""Isolate geo_dbscan_300k with bench-like reps (guide §1.1/§1.4).

Warm once, then min-of-N reps of the full row, clearing cache between reps
exactly like bench.timed_reps. Use --phases for the per-phase breakdown.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from tzspark import hostcal

hostcal.apply()

from pyspark.sql import functions as F

from tzspark.engine import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def clustered_pts(spark, n):
    k = n * 6 // 10
    cid = (F.col("id") / 60).cast("long")
    clat = (F.pmod(cid, F.lit(100)) * 1.2 - 60.0) + 0.1
    clng = (F.pmod((cid / 100).cast("long"), F.lit(100)) * 3.2 - 160.0) + 0.1
    olat = (F.pmod(F.col("id") * 7919, F.lit(100)) - 50) / 1000.0
    olng = (F.pmod(F.col("id") * 104729, F.lit(100)) - 50) / 1000.0
    blobs = spark.range(0, k, 1, max(CPUS * 4, 32)).select(
        F.col("id").alias("event_id"),
        (clat + olat).alias("lat"), (clng + olng).alias("lng"),
    )
    bg = spark.range(k, n, 1, max(CPUS * 2, 16)).select(
        F.col("id").alias("event_id"),
        ((F.pmod(F.col("id") * 7919, F.lit(120000)) / 1000.0) - 60.0).alias("lat"),
        ((F.pmod(F.col("id") * 104729, F.lit(320000)) / 1000.0) - 160.0).alias("lng"),
    )
    return blobs.unionAll(bg)


def main(n=300_000, reps=4):
    probe, waits = hostcal.wait_calm(threshold_us=15.0, max_waits=6)
    print(f"fault probe {probe} us/page after {waits} waits", flush=True)
    spark = get_spark(app="iso-dbscan", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")

    from tzspark.covertable import geo_dbscan

    pts = clustered_pts(spark, n)

    def row():
        return (
            geo_dbscan(pts, "event_id", eps=0.05, min_pts=4, res=10)
            .groupBy("role")
            .agg(F.count("*").alias("n"), F.sum("cluster_id").alias("s"))
        )

    print("result:", sorted(row().collect()), flush=True)  # warm + show values
    spark.catalog.clearCache()
    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        row().count()
        dt = time.time() - t0
        spark.catalog.clearCache()
        best = min(best, dt)
        print(f"rep{i}: {dt:.2f}s (probe {hostcal.fault_probe(8)})", flush=True)
    print(f"BEST geo_dbscan n={n}: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(n, reps)
