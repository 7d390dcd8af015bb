"""Verify min_label_cc round-plan shape: the checkpointed, pre-partitioned
edge table must join without its own Exchange (partitioning preserved
through localCheckpoint), and the neighbor-min side must be the (small)
delta, not the full label table."""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from tzspark.engine import get_spark

spark = get_spark(app="cc-plan", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

edges0 = spark.range(0, 100000).select(
    (F.col("id") % 5000).alias("src"), ((F.col("id") * 7 + 1) % 5000).alias("dst")
)
edges0 = edges0.union(edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

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
print("=== nb plan (edges side must have NO Exchange) ===")
nb.explain("formatted")
spark.stop()
