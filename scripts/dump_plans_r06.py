"""Dump explain('formatted') for the round-6-touched bench queries into
plans/r06/<query>_<tag>.txt  (tag = before|after).

Run from a tree with bench fixtures present (.bench_cache, spark-warehouse
— symlink them into a worktree for the 'before' dump).
"""
import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)

from tzspark import hostcal

hostcal.apply()

import bench
from tzspark.engine import get_spark

NAMES = [
    "geo_dbscan_300k",
    "substring_dedup_200k",
    "proximity_pairs",
    "world_lookup_join",
    "world_lookup_join_bucketed",
    "multi_tenant_world",
]


def main(tag, outdir):
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app=f"plans-r06-{tag}", master=f"local[{bench.CPUS}]",
                      shuffle_partitions=max(bench.CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    bench.ensure_images(spark)
    images = spark.read.parquet(bench.images_path())
    qs = bench.headline_queries(spark, images)
    for name in NAMES:
        df = qs[name]()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, tag, flush=True)
    # the CC round plan (frontier neighbor-min) is the load-bearing shape
    # for geo_dbscan but is invisible in the final DF's explain (it runs
    # inside the loop over checkpointed tables) — dump it separately.
    try:
        from pyspark.sql import functions as F

        from tzspark.queries_text import min_label_cc  # noqa: F401 (after only)

        edges0 = spark.range(0, 100000).select(
            (F.col("id") % 5000).alias("src"),
            ((F.col("id") * 7 + 1) % 5000).alias("dst"),
        )
        edges0 = edges0.union(
            edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        if tag == "before":
            # round-5 shape: un-materialized edges join the FULL label table
            edges = edges0
            labels = (
                edges.select(F.col("src").alias("doc_id")).distinct()
                .withColumn("canon_id", F.col("doc_id"))
                .localCheckpoint()
            )
            nb = (
                edges.join(labels, edges["src"] == labels["doc_id"])
                .groupBy(edges["dst"].alias("doc_id"))
                .agg(F.min("canon_id").alias("nb_min"))
            )
        else:
            nshuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
            edges = edges0.repartition(nshuf, "src").localCheckpoint()
            labels = (
                edges.select(F.col("src").alias("doc_id")).distinct()
                .withColumn("canon_id", F.col("doc_id"))
                .withColumn("_chg", F.lit(True))
                .localCheckpoint()
            )
            delta = labels.where(F.col("_chg")).select("doc_id", "canon_id")
            nb = (
                edges.join(delta, edges["src"] == delta["doc_id"])
                .groupBy(edges["dst"].alias("doc_id"))
                .agg(F.min("canon_id").alias("nb_min"))
            )
        buf = io.StringIO()
        with redirect_stdout(buf):
            nb.explain("formatted")
        with open(os.path.join(outdir, f"cc_round_neighbor_min_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote cc_round_neighbor_min", tag, flush=True)
    except Exception as ex:
        print("cc round plan skipped:", ex, flush=True)
    spark.stop()


if __name__ == "__main__":
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, "plans", "r06")
    main(tag, outdir)
