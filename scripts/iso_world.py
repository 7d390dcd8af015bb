"""Phase isolation for world_lookup_join (broadcast-free cover join path).

Phases (each noop-sunk, guide §1.4): GPS front half; interior candidate
join; boundary candidate join + PIP; full assign_via_join row.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tzspark import hostcal

hostcal.apply()

import bench  # reuses bench cache fixtures (read-only here)
from pyspark.sql import functions as F

from tzspark.engine import get_spark

CPUS = bench.CPUS


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(reps=3):
    probe, waits = hostcal.wait_calm(threshold_us=15.0, max_waits=8)
    print(f"fault probe {probe} after {waits} waits", flush=True)
    spark = get_spark(app="iso-world", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from tzspark.api import TimezoneLookup
    from tzspark.covertable import (
        _knn_best, _resolve_cands, _pip_pairs_udf, assign_images_via_join,
        cell_id_col,
    )
    from tzspark.engine import extract_gps_udf, gps_header_col
    from tzspark.zones import make_world_zones

    bench.ensure_images(spark)
    images = spark.read.parquet(bench.images_path())
    tl = TimezoneLookup(make_world_zones(), cache_dir=os.path.join(bench.CACHE, "covers"))
    cov = tl.cover_tables(spark, cache_dir=os.path.join(bench.CACHE, "covers"))

    def front_half():
        g = images.withColumn("g", extract_gps_udf()(gps_header_col(F.col("bytes"))))
        pts = g.select(
            "image_id",
            F.col("g.lat").alias("lat"), F.col("g.lng").alias("lng"),
            (
                ~F.col("g.gps_ok")
                | ~F.col("g.lat").between(-90.0, 90.0)
                | ~F.col("g.lng").between(-180.0, 180.0)
            ).alias("quarantined"),
        )
        return pts.where(~F.col("quarantined")).select(
            F.col("image_id").alias("_k"),
            F.col("lat").cast("float").alias("_lat"),
            F.col("lng").cast("float").alias("_lng"),
        )

    def full_row():
        return assign_images_via_join(images, cov).groupBy("zone_id").agg(
            F.count("*").alias("n_images"))

    # warm everything
    sc.setJobDescription("warm full")
    full_row().count()
    spark.catalog.clearCache()

    def rep(label, fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        print(f"{label}: best {best:.2f}s (probe {hostcal.fault_probe(8)})", flush=True)

    sc.setJobDescription("phase: gps front half")
    rep("1 gps front half (noop)", lambda: noop(front_half()))

    pts_c = front_half().persist()
    pts_c.count()

    n = 1 << cov.max_res
    anc = F.explode(
        F.array(*[
            F.struct(F.lit(r).alias("res"),
                     cell_id_col(F.col("_lat"), F.col("_lng"), r).alias("cell_id"))
            for r in range(cov.base_res, cov.max_res + 1)
        ])
    ).alias("a")

    def interior_only():
        pi = pts_c.select("_k", anc).select("_k", "a.res", "a.cell_id")
        im = pi.join(cov.interior.hint("shuffle_hash"), ["res", "cell_id"]).select(
            "_k", F.col("zmin").alias("cand"))
        return im.groupBy("_k").agg(F.min("cand").alias("_zid"))

    def boundary_only():
        pb = pts_c.withColumn(
            "cell_id", cell_id_col(F.col("_lat"), F.col("_lng"), cov.max_res))
        jb = pb.join(cov.boundary.hint("shuffle_hash"), ["cell_id"])
        inside = _pip_pairs_udf()(
            F.col("_lat"), F.col("_lng"),
            F.col("ea_lat"), F.col("ea_lng"), F.col("eb_lat"), F.col("eb_lng"))
        return jb.where(inside).select("_k", F.col("zone_id").alias("cand"))

    def boundary_join_no_pip():
        pb = pts_c.withColumn(
            "cell_id", cell_id_col(F.col("_lat"), F.col("_lng"), cov.max_res))
        jb = pb.join(cov.boundary.hint("shuffle_hash"), ["cell_id"])
        return jb.select("_k", "zone_id")  # join only, no UDF, no arrays out

    sc.setJobDescription("phase: interior join (pts persisted)")
    rep("2 interior join+agg (noop)", lambda: noop(interior_only()))
    sc.setJobDescription("phase: boundary join no pip")
    rep("3a boundary join only (noop)", lambda: noop(boundary_join_no_pip()))
    sc.setJobDescription("phase: boundary join + pip")
    rep("3b boundary join+PIP (noop)", lambda: noop(boundary_only()))
    sc.setJobDescription("phase: knn best over all pts")
    rep("4 knn best (noop)", lambda: noop(_knn_best(pts_c, cov)))
    pts_c.unpersist()

    sc.setJobDescription("full row")
    rep("5 FULL world_lookup_join row", lambda: full_row().count())
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
