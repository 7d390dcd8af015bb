"""Per-phase timing of the OPTIMIZED geo_dbscan at 300k (guide §1.1)."""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tzspark import hostcal

hostcal.apply()

from pyspark.sql import functions as F

from tzspark.engine import get_spark
from scripts.iso_dbscan import clustered_pts

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(n=300_000):
    probe, waits = hostcal.wait_calm(threshold_us=15.0, max_waits=8)
    print(f"fault probe {probe} us/page after {waits} waits", flush=True)
    spark = get_spark(app="iso-dbscan-ph", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    from tzspark.covertable import geo_dbscan, proximity_self_join
    from tzspark.queries_text import min_label_cc

    pts = clustered_pts(spark, n)
    # warm every codepath
    geo_dbscan(pts, "event_id", eps=0.05, min_pts=4, res=10).groupBy("role").agg(
        F.count("*").alias("n")).count()
    spark.catalog.clearCache()

    t = {}

    def tick(label, fn):
        t0 = time.time()
        out = fn()
        t[label] = time.time() - t0
        print(f"{label}: {t[label]:.2f}s", flush=True)
        return out

    pairs = tick("1 pairs ckpt", lambda: proximity_self_join(
        pts, "event_id", radius=0.05, res=10).select("id_a", "id_b").localCheckpoint())
    edges = pairs.union(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
    deg = edges.groupBy("id_a").agg(F.count("*").alias("deg"))
    cores = tick("2 cores ckpt", lambda: deg.where(F.col("deg") >= 4)
                 .select(F.col("id_a").alias("_k")).localCheckpoint())
    ce = (
        edges.join(cores.select(F.col("_k").alias("id_a")), "id_a")
        .join(cores.select(F.col("_k").alias("id_b")), "id_b")
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    labels, rounds = tick("3 CC total", lambda: min_label_cc(ce, nodes=cores.select(F.col("_k").alias("doc_id"))))
    labels = labels[0] if isinstance(labels, tuple) else labels
    print(f"   rounds={rounds}", flush=True)
    core_lab = cores.join(labels, cores["_k"] == labels["doc_id"], "left").select(
        cores["_k"],
        F.coalesce("canon_id", cores["_k"]).cast("long").alias("cluster_id"),
    )
    border = (
        edges.join(
            core_lab.select(F.col("_k").alias("id_b"), F.col("cluster_id").alias("_cid")),
            "id_b",
        )
        .join(cores.select(F.col("_k").alias("id_a")), "id_a", "left_anti")
        .groupBy("id_a")
        .agg(F.min("_cid").alias("cluster_id"))
        .select(F.col("id_a").alias("_k"), "cluster_id")
    )
    assigned = tick("4 assigned ckpt", lambda: (
        core_lab.select("_k", F.lit("core").alias("role"), "cluster_id")
        .union(border.select("_k", F.lit("border").alias("role"), "cluster_id"))
        .localCheckpoint()
    ))
    noise = (
        pts.select(F.col("event_id").alias("_k"))
        .join(assigned.select("_k"), "_k", "left_anti")
        .select("_k", F.lit("noise").alias("role"),
                F.lit(-1).cast("long").alias("cluster_id"))
    )
    tick("5 final rollup", lambda: assigned.union(noise)
         .groupBy("role").agg(F.count("*").alias("n"), F.sum("cluster_id").alias("s"))
         .count())
    print(f"TOTAL: {sum(t.values()):.2f}s   probe now {hostcal.fault_probe(8)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300_000)
